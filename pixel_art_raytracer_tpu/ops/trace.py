"""Primary visibility: oblique rays through the hash grid, as a JAX program.

The reference walks each pixel's bin column front-to-back with nested loops
(``trace_hash_for_pixel``, alternative.cpp:271-397).  Here the pixel dimension
is fully data-parallel and the (bin_z, slot) candidate sequence — whose order
is semantically observable through the strictly-greater depth compare and the
early-exit heuristic — runs as a ``fori_loop`` over bins with the slot loop
unrolled.

The scan tracks only ``(best_depth, winner_entity, adjacent-hit counter,
broken)`` per pixel; every G-buffer attribute is recomputed from the winner
entity in one vectorised epilogue (the winner determines row/col/texel
uniquely for a given pixel), avoiding five full-image select chains inside
the loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig

INT32_MIN = jnp.iinfo(jnp.int32).min


class GBufferArrays(NamedTuple):
    """SoA G-buffer (the reference's ``Pixel`` record, sprites.hpp:53-58)."""

    normal: jax.Array        # (H, W, 3) float32
    color: jax.Array         # (H, W, 4) uint8
    y: jax.Array             # (H, W) int32
    z: jax.Array             # (H, W) int32
    entity_index: jax.Array  # (H, W) int32


def trace_pixels(pos: jax.Array, ext: jax.Array, sprite_id: jax.Array,
                 atlas_color: jax.Array, atlas_depth: jax.Array,
                 atlas_normal: jax.Array, palette: jax.Array,
                 bins_ent: jax.Array, counts: jax.Array,
                 config: RenderConfig) -> GBufferArrays:
    """Trace all primary rays; returns the G-buffer.

    Args:
      pos, ext: (N, 3) int32; sprite_id: (N,) int32.
      atlas_color/depth: (S, SH, SW) int32; atlas_normal: (S, SH, SW, 3) f32.
      palette: (P, 4) uint8.
      bins_ent: (V, C) int32 (-1 empty); counts: (V,) int32.
    """
    best, winner = trace_winner(pos, ext, sprite_id, atlas_depth, bins_ent,
                                counts, config)
    del best
    return materialize_gbuffer(winner, pos, ext, sprite_id, atlas_color,
                               atlas_depth, atlas_normal, palette, config)


def trace_winner(pos: jax.Array, ext: jax.Array, sprite_id: jax.Array,
                 atlas_depth: jax.Array, bins_ent: jax.Array,
                 counts: jax.Array, config: RenderConfig):
    """The winner scan of :func:`trace_pixels` alone: returns per-pixel
    ``(best_depth, winner_entity)`` — (H, W) int32 each, winner -1 for
    background.  Entity-sharded callers (parallel/entity_sharded.py) merge
    these partial results across shards by depth key."""
    cfg = config
    H, W = cfg.view_height, cfg.view_width
    cap = cfg.bin_capacity
    hh, hl = cfg.hash_height, cfg.hash_length

    i = jnp.arange(W, dtype=jnp.int32)[None, :]
    j = jnp.arange(H, dtype=jnp.int32)[:, None]
    world_j = jnp.int32(H) - j                       # (H, 1)
    bin_x = i // cfg.bin_size
    bin_y = j // cfg.bin_size
    base_flat = (bin_x * hh + bin_y) * hl            # (H, W)

    px_all, py_all, pz_all = pos[:, 0], pos[:, 1], pos[:, 2]
    ex_all, ey_all, ez_all = ext[:, 0], ext[:, 1], ext[:, 2]

    def bin_body(bz, state):
        best, winner, isect, broken = state
        flat = base_flat + bz
        cnt = counts[flat]
        active = ~broken
        # Empty bin resets the adjacent-hit counter (alternative.cpp:297-300).
        isect = jnp.where(active & (cnt == 0), 0, isect)
        bin_hit = jnp.zeros((H, W), bool)

        for k in range(cap):
            ent = bins_ent[:, k][flat]
            valid = active & (k < cnt)
            ent_s = jnp.where(valid, ent, 0)
            apx = px_all[ent_s]
            apy = py_all[ent_s]
            apz = pz_all[ent_s]
            aex = ex_all[ent_s]
            aey = ey_all[ent_s]
            aez = ez_all[ent_s]

            # Oblique interval test (alternative.cpp:310-317, quirk Q4).
            hit = (valid
                   & (i >= apx) & (i < apx + aex)
                   & (world_j > apy + apz)
                   & (world_j <= apy + aey + apz + aez))

            row = apy + aey + apz + aez - world_j
            col = i - apx
            sid = sprite_id[ent_s]
            texel = ((sid * cfg.sprite_height
                      + jnp.clip(row, 0, cfg.sprite_height - 1))
                     * cfg.sprite_width + jnp.clip(col, 0, cfg.sprite_width - 1))
            sdep = atlas_depth.reshape(-1)[texel]

            # Depth key (alternative.cpp:336-341); strictly greater wins, so
            # ties keep the earlier candidate.
            depth = apy - apz + jnp.minimum(0, aey - row) - sdep
            improve = hit & (depth > best)

            best = jnp.where(improve, depth, best)
            winner = jnp.where(improve, ent_s, winner)
            bin_hit |= improve

        isect = isect + bin_hit.astype(jnp.int32)
        if cfg.early_exit:
            broken = broken | (active & (isect >= 2))
        return best, winner, isect, broken

    state = (
        jnp.full((H, W), INT32_MIN, jnp.int32),
        jnp.full((H, W), -1, jnp.int32),
        jnp.zeros((H, W), jnp.int32),
        jnp.zeros((H, W), bool),
    )
    best, winner, _, _ = jax.lax.fori_loop(0, cfg.hash_length, bin_body, state)
    return best, winner


def materialize_gbuffer(winner: jax.Array, pos, ext, sprite_id, atlas_color,
                        atlas_depth, atlas_normal, palette,
                        config: RenderConfig) -> GBufferArrays:
    """Expand a per-pixel winner-entity map into the full G-buffer.

    ``winner`` is (H, W) int32 with -1 for background pixels, which take the
    background color, zero normal and zero y/z/entity fields (quirk Q6).
    """
    cfg = config
    H, W = cfg.view_height, cfg.view_width
    i = jnp.arange(W, dtype=jnp.int32)[None, :]
    j = jnp.arange(H, dtype=jnp.int32)[:, None]
    world_j = jnp.int32(H) - j

    hit = winner >= 0
    ent = jnp.where(hit, winner, 0)
    apx, apy, apz = pos[ent, 0], pos[ent, 1], pos[ent, 2]
    aey, aez = ext[ent, 1], ext[ent, 2]
    row = apy + aey + apz + aez - world_j
    col = i - apx
    sid = sprite_id[ent]
    texel = ((sid * cfg.sprite_height
              + jnp.clip(row, 0, cfg.sprite_height - 1))
             * cfg.sprite_width + jnp.clip(col, 0, cfg.sprite_width - 1))
    sdep = atlas_depth.reshape(-1)[texel]
    cidx = atlas_color.reshape(-1)[texel]

    bg = jnp.asarray(cfg.background, jnp.uint8)
    color = jnp.where(hit[..., None], palette[cidx],
                      jnp.broadcast_to(bg, (H, W, 4)))
    normal = jnp.where(hit[..., None],
                       atlas_normal.reshape(-1, 3)[texel], 0.0)
    y = jnp.where(hit, apy + aey + aez - row - sdep, 0)
    z = jnp.where(hit, apz + sdep, 0)
    entity = jnp.where(hit, ent, 0)
    return GBufferArrays(normal=normal, color=color, y=y, z=z,
                         entity_index=entity)
