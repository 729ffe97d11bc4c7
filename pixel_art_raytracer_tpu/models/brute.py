"""Brute-force renderer: every ray against every entity, no acceleration.

The quirk-free model family: identical ray/depth/shading math to the deferred
renderer but without the spatial hash, so there is no wrap-at-capacity
overwrite, no insertion-order sensitivity, and no early-exit culling.  Used
as BASELINE config-1's small-scene renderer and as a semantic cross-check:
on scenes where no bin overflows and early exit never fires, it must agree
with the deferred pipeline exactly.

Winner selection: the reference's sequential strictly-greater compare keeps
the first entity attaining the maximal depth key; that equals
``argmax over entities in index order`` (argmax returns the first maximum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig, DEFAULT_CONFIG
from ..ops.trace import GBufferArrays, materialize_gbuffer, INT32_MIN
from ..ops import shade as shade_ops
from .deferred import DeviceScene


class BruteForceRenderer:
    """All-pixels x all-entities oblique hit test + depth argmax."""

    def __init__(self, config: RenderConfig = DEFAULT_CONFIG,
                 entity_chunk: int = 512, shadow: bool = False,
                 shadow_max_steps: int = 16):
        self.config = config
        self.entity_chunk = entity_chunk
        self.shadow = shadow
        self.shadow_max_steps = shadow_max_steps

    def trace(self, dscene: DeviceScene) -> GBufferArrays:
        cfg = self.config
        H, W = cfg.view_height, cfg.view_width
        N = dscene.pos.shape[0]
        C = min(self.entity_chunk, N)
        n_chunks = -(-N // C)
        pad = n_chunks * C - N

        pos = jnp.pad(dscene.pos, ((0, pad), (0, 0)))
        ext = jnp.pad(dscene.ext, ((0, pad), (0, 0)))
        sid = jnp.pad(dscene.sprite_id, (0, pad))

        i = jnp.arange(W, dtype=jnp.int32)[None, :]
        j = jnp.arange(H, dtype=jnp.int32)[:, None]
        world_j = jnp.int32(H) - j

        depth_flat = dscene.atlas_depth.reshape(-1)

        def chunk_body(c, state):
            best, winner = state
            sl = c * C
            p = jax.lax.dynamic_slice(pos, (sl, 0), (C, 3))
            e = jax.lax.dynamic_slice(ext, (sl, 0), (C, 3))
            s = jax.lax.dynamic_slice(sid, (sl,), (C,))

            def ent_body(k, st):
                best, winner = st
                apx, apy, apz = p[k, 0], p[k, 1], p[k, 2]
                aex, aey, aez = e[k, 0], e[k, 1], e[k, 2]
                ent_idx = sl + k
                valid = ent_idx < N
                hit = (valid
                       & (i >= apx) & (i < apx + aex)
                       & (world_j > apy + apz)
                       & (world_j <= apy + aey + apz + aez))
                row = apy + aey + apz + aez - world_j
                col = i - apx
                texel = ((s[k] * cfg.sprite_height
                          + jnp.clip(row, 0, cfg.sprite_height - 1))
                         * cfg.sprite_width
                         + jnp.clip(col, 0, cfg.sprite_width - 1))
                sdep = depth_flat[texel]
                depth = apy - apz + jnp.minimum(0, aey - row) - sdep
                improve = hit & (depth > best)
                return (jnp.where(improve, depth, best),
                        jnp.where(improve, ent_idx, winner))

            return jax.lax.fori_loop(0, C, ent_body, (best, winner))

        state = (jnp.full((H, W), INT32_MIN, jnp.int32),
                 jnp.full((H, W), -1, jnp.int32))
        best, winner = jax.lax.fori_loop(0, n_chunks, chunk_body, state)
        return materialize_gbuffer(winner, dscene.pos, dscene.ext,
                                   dscene.sprite_id, dscene.atlas_color,
                                   dscene.atlas_depth, dscene.atlas_normal,
                                   dscene.palette, cfg)

    @functools.partial(jax.jit, static_argnums=0)
    def render_with_gbuffer(self, dscene: DeviceScene, light: jax.Array):
        """Trace + shade.  Without ``shadow``, lighting is Lambert+ambient
        with no occlusion march (config-1 semantics: no shadows)."""
        gbuf = self.trace(dscene)
        if self.shadow:
            from ..ops import binning

            bins_ent, counts = binning.build_bins(
                dscene.pos, dscene.ext, self.config, (2, 3, 2))
            frame = shade_ops.shade(dscene.pos, dscene.ext, gbuf, bins_ent,
                                    counts, light, self.config,
                                    self.shadow_max_steps)
        else:
            frame = self._shade_unshadowed(gbuf, light)
        return gbuf, frame

    def _shade_unshadowed(self, gbuf: GBufferArrays, light) -> jax.Array:
        from ..ops.cstyle import c_min, c_max

        cfg = self.config
        f32 = jnp.float32
        H, W = cfg.view_height, cfg.view_width
        wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
        dx = light[0].astype(f32) - wx.astype(f32)
        dy = light[1].astype(f32) - gbuf.y.astype(f32)
        dz = light[2].astype(f32) - gbuf.z.astype(f32)
        length = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
        tlx, tly, tlz = dx / length, dy / length, dz / length
        n = gbuf.normal
        dot = n[..., 0] * tlx + n[..., 1] * tly + n[..., 2] * tlz
        brightness = c_min(f32(1.0), c_max(f32(0.0), dot) + f32(cfg.ambient))
        rgb = gbuf.color[..., :3].astype(f32) * brightness[..., None]
        return rgb.astype(jnp.uint8)

    def render(self, dscene: DeviceScene, light) -> jax.Array:
        _, frame = self.render_with_gbuffer(dscene,
                                            jnp.asarray(light, jnp.int32))
        return frame
