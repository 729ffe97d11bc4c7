"""Multi-chip scaling via jax.sharding meshes."""

from .mesh import (make_mesh, render_frames_sharded,
                   render_frames_shardmap, sharded_train_step,
                   frame_axis, row_axis)

__all__ = ["make_mesh", "render_frames_sharded",
           "render_frames_shardmap", "sharded_train_step",
           "frame_axis", "row_axis"]
