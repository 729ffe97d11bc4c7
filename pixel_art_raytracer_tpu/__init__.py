"""pixel_art_raytracer_tpu — a TPU-native pixel-art raytracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Cons-Cat/Pixel-Art-Raytracer (an interactive CPU C++ pixel-art raytracer):
sprite-skinned AABB scenes, oblique orthographic primary rays through a
uniform spatial hash, deferred Lambert shading with marched shadow rays, an
animation/session runtime, and GIF/PNG writeback — expressed as array programs
over static shapes, with Pallas kernels on the hot paths and
``jax.sharding``-based multi-chip scaling.
"""

from .config import RenderConfig, DEFAULT_CONFIG
from .assets import SpriteAtlas, make_tile_floor, concat_atlases
from .scene import Scene, SceneBuilder, Light, graybox_world, demo_world, default_light

__version__ = "0.1.0"

__all__ = [
    "RenderConfig", "DEFAULT_CONFIG",
    "SpriteAtlas", "make_tile_floor", "concat_atlases",
    "Scene", "SceneBuilder", "Light", "graybox_world", "demo_world",
    "default_light",
]
