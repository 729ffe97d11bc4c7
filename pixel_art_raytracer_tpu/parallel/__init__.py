"""Multi-chip scaling via jax.sharding meshes."""

from .mesh import (make_mesh, render_frames_sharded,
                   render_frames_shardmap, sharded_train_step,
                   frame_axis, row_axis)
from .entity_sharded import (make_entity_mesh, render_frame_entity_sharded,
                             entity_axis)

__all__ = ["make_mesh", "render_frames_sharded",
           "render_frames_shardmap", "sharded_train_step",
           "frame_axis", "row_axis",
           "make_entity_mesh", "render_frame_entity_sharded", "entity_axis"]
