"""Supersampled rendering (BASELINE config 5 extension).

The renderer's geometry is integer world units == pixels, so supersampling
scales the *world* by an integer factor s (positions, extents, bin size,
light) and renders an s-times larger frame, then box-filters down.  Scaling
everything uniformly preserves the renderer's semantics at the finer grid;
the downsample is a plain mean.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..scene import Scene
from .deferred import DeferredRenderer, DeviceScene


def scaled_config(config: RenderConfig, s: int) -> RenderConfig:
    return dataclasses.replace(
        config,
        view_width=config.view_width * s,
        view_height=config.view_height * s,
        view_length=config.view_length * s,
        bin_size=config.bin_size * s,
        sprite_width=config.sprite_width * s,
        sprite_height=config.sprite_height * s,
    )


def scale_atlas(atlas, s: int):
    """Upscale sprite texel maps by s.

    Color and normals repeat (nearest-neighbour — crisp pixel-art edges).
    Depth maps scale in *value* by s (they are world-space offsets); ramp
    sprites get a smooth fine-grained ramp max(0, (s*d0 + s-1) - row), which
    both refines the staircase and stays Pallas-compatible.
    """
    from ..assets import SpriteAtlas
    from ..ops.trace_pallas import ramp_depth_params

    color = np.repeat(np.repeat(atlas.color, s, axis=1), s, axis=2)
    normal = np.repeat(np.repeat(atlas.normal, s, axis=1), s, axis=2)
    params = ramp_depth_params(np.asarray(atlas.depth))
    S, H, W = atlas.depth.shape
    if params is not None:
        d0, slope = params
        rows = np.arange(H * s, dtype=np.int64)[None, :, None]
        D0 = (s * d0.astype(np.int64) + s - 1)[:, None, None]
        SL = slope.astype(np.int64)[:, None, None]
        depth = np.maximum(0, D0 - SL * rows).astype(np.int32)
        depth = np.broadcast_to(depth, (S, H * s, W * s)).copy()
        # Zero-slope (constant) sprites keep their scaled constant.
        depth[slope == 0] = (s * d0[slope == 0])[:, None, None]
    else:
        depth = np.repeat(np.repeat(atlas.depth, s, axis=1), s, axis=2) * s
    return SpriteAtlas(color=color, depth=depth, normal=normal)


def scale_scene(scene: Scene, s: int) -> Scene:
    """Scale world coordinates (and the atlas) by s."""
    return dataclasses.replace(scene, pos=scene.pos * s, ext=scene.ext * s,
                               atlas=scale_atlas(scene.atlas, s))


class SupersampledRenderer:
    """Render at s x resolution, box-filter to the base resolution.

    Note sprite texel addressing is resolution-dependent (texel row/col come
    from world coordinates, alternative.cpp:324-332), so the scaled render
    magnifies each texel s-fold — exactly what supersampling of the pixel-art
    look intends: clean s x edges averaged down.
    """

    def __init__(self, config: RenderConfig, factor: int = 2, **renderer_kw):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.base_config = config
        self.config = scaled_config(config, factor)
        kw = dict(renderer_kw)
        kw.setdefault("shadow_max_steps", 16 * factor)
        self.renderer = DeferredRenderer(self.config, **kw)

    def prepare(self, scene: Scene):
        scaled = scale_scene(scene, self.factor)
        # Full static configuration (spans + gather-free epilogue
        # decompositions + packed-pick bounds) on the scaled scene.
        self.renderer.configure_for(scaled)
        return DeviceScene.from_scene(scaled, self.config)

    def render(self, dscene_scaled: DeviceScene, light) -> jax.Array:
        s = self.factor
        light = jnp.asarray(light, jnp.int32) * s
        frame = self.renderer.render(dscene_scaled, light)
        H, W = self.base_config.view_height, self.base_config.view_width
        f32 = frame.astype(jnp.float32).reshape(H, s, W, s, 3)
        return f32.mean(axis=(1, 3)).astype(jnp.uint8)

    def render_numpy(self, scene: Scene, light) -> np.ndarray:
        ds = self.prepare(scene)
        if hasattr(light, "as_array"):
            light = light.as_array()
        return np.asarray(self.render(ds, jnp.asarray(light)))
