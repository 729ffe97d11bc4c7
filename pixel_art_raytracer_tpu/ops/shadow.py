"""Shadow rays: the 7-phase bin DDA as a JAX scan.

The reference marches each shadow ray through the hash grid with a thick-line
DDA that probes up to seven neighbour combinations per step so corner-adjacent
bins are not missed (``trace_hash_for_light``, alternative.cpp:399-500).  The
phase counter is periodic with period 7 (x, y, z, xy, xz, yz, advance), so the
whole march vectorises as a ``lax.scan`` of length ``7 * max_steps`` over all
pixels at once, with per-pixel active masks standing in for the serial code's
data-dependent loop bound and early return.

Occlusion is an OR over tested (bin, slot) candidates — order-independent —
so masking preserves exact semantics.  Flat bin indices outside
[0, hash_volume) are treated as empty (the reference reads out-of-bounds
there); in-range aliased indices are used as-is, reproducing the reference's
deterministic aliasing (see oracle/cpu_renderer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .cstyle import c_min, c_max, exact_f32_div

# Per-phase axis participation: x, y, z, xy, xz, yz, xyz-advance
# (alternative.cpp:432-466).
_PHASE_AXES = (
    (True, False, False),
    (False, True, False),
    (False, False, True),
    (True, True, False),
    (True, False, True),
    (False, True, True),
    (True, True, True),
)


def trace_light(pos: jax.Array, ext: jax.Array, bins_ent: jax.Array,
                counts: jax.Array, start_bin: tuple, end_bin: tuple,
                start_ent: jax.Array, origin: tuple, inv_dir: tuple,
                config: RenderConfig, max_steps: int) -> jax.Array:
    """March all shadow rays; True where the light is reachable.

    Args:
      start_bin: (rbx, rby, rbz) int32 image-shaped arrays (ray origin bins).
      end_bin:   (lbx, lby, lbz) int32 scalars/arrays (light bin).
      start_ent: int32 image-shaped originating entity (self-shadow skip).
      origin:    (ox, oy, oz) float32 image-shaped world positions.
      inv_dir:   (ix, iy, iz) float32 reciprocal ray directions.
      max_steps: static bound on the DDA step count; must cover
                 ``int(largest_bin_distance)`` for every ray (the default
                 config covers lights anywhere within ~16 bins).
    """
    cfg = config
    cap = cfg.bin_capacity
    V = cfg.hash_volume
    f32 = jnp.float32

    rbx, rby, rbz = start_bin
    lbx, lby, lbz = end_bin

    sx, sy, sz = rbx.astype(f32), rby.astype(f32), rbz.astype(f32)
    dx = jnp.asarray(lbx, f32) - sx
    dy = jnp.asarray(lby, f32) - sy
    dz = jnp.asarray(lbz, f32) - sz
    largest = c_max(c_max(jnp.abs(dx), jnp.abs(dy)), jnp.abs(dz))
    stx = exact_f32_div(dx, largest)
    sty = exact_f32_div(dy, largest)
    stz = exact_f32_div(dz, largest)
    n_steps = largest.astype(jnp.int32)

    start_flat = (rbx * cfg.hash_height + rby) * cfg.hash_length + rbz

    ox, oy, oz = origin
    ivx, ivy, ivz = inv_dir

    px_all, py_all, pz_all = (pos[:, a].astype(f32) for a in range(3))
    qx_all = (pos[:, 0] + ext[:, 0]).astype(f32)
    qy_all = (pos[:, 1] + ext[:, 1]).astype(f32)
    qz_all = (pos[:, 2] + ext[:, 2]).astype(f32)

    def slab_hit(ent):
        """Slab test with the reference's min/max chain (alternative.cpp:40-83)."""
        x1 = (px_all[ent] - ox) * ivx
        x2 = (qx_all[ent] - ox) * ivx
        lo = c_min(x1, x2)
        hi = c_max(x1, x2)
        y1 = (py_all[ent] - oy) * ivy
        y2 = (qy_all[ent] - oy) * ivy
        lo = c_max(lo, c_min(y1, y2))
        hi = c_min(hi, c_max(y1, y2))
        z1 = (pz_all[ent] - oz) * ivz
        z2 = (qz_all[ent] - oz) * ivz
        lo = c_max(lo, c_min(z1, z2))
        hi = c_min(hi, c_max(z1, z2))
        return hi >= lo

    def body(carry, t):
        tx, ty, tz, occluded = carry
        phase = t % 7
        axx = (phase == 0) | (phase == 3) | (phase == 4) | (phase == 6)
        axy = (phase == 1) | (phase == 3) | (phase == 5) | (phase == 6)
        axz = (phase == 2) | (phase == 4) | (phase == 5) | (phase == 6)
        cx = tx + jnp.where(axx, stx, 0.0)
        cy = ty + jnp.where(axy, sty, 0.0)
        cz = tz + jnp.where(axz, stz, 0.0)
        advance = phase == 6
        tx = jnp.where(advance, cx, tx)
        ty = jnp.where(advance, cy, ty)
        tz = jnp.where(advance, cz, tz)

        active = (t < 7 * n_steps) & ~occluded
        bx = cx.astype(jnp.int32)
        by = cy.astype(jnp.int32)
        bz = cz.astype(jnp.int32)
        flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
        in_range = (flat >= 0) & (flat < V)
        flat_c = jnp.where(in_range, flat, 0)
        test = active & in_range & (flat != start_flat)

        cnt = counts[flat_c]
        for k in range(cap):
            ent = bins_ent[:, k][flat_c]
            consider = test & (k < cnt) & (ent != start_ent)
            ent_s = jnp.where(ent >= 0, ent, 0)
            occluded = occluded | (consider & slab_hit(ent_s))

        return (tx, ty, tz, occluded), None

    occ0 = jnp.zeros(rbx.shape, bool)
    (_, _, _, occluded), _ = jax.lax.scan(
        body, (sx, sy, sz, occ0), jnp.arange(7 * max_steps, dtype=jnp.int32))
    return ~occluded


def trace_light_dynamic(pos: jax.Array, ext: jax.Array, bins_ent: jax.Array,
                        counts: jax.Array, start_bin: tuple, end_bin: tuple,
                        start_ent: jax.Array, origin: tuple, inv_dir: tuple,
                        config: RenderConfig) -> jax.Array:
    """Exact shadow march with a data-dependent step bound.

    Same semantics as :func:`trace_light` but the phase loop runs as a
    ``lax.while_loop`` to ``7 * max(int(largest_bin_distance))`` — the bound
    the reference computes per ray (alternative.cpp:423-432) — so it is
    correct for ANY light position, where the statically bounded paths
    silently truncate.  Sequential gathers per phase make it slow; it is the
    guard *fallback*, not a production path (see ops.shade.lighting_factor).
    """
    cfg = config
    cap = cfg.bin_capacity
    V = cfg.hash_volume
    f32 = jnp.float32

    rbx, rby, rbz = start_bin
    lbx, lby, lbz = end_bin

    sx, sy, sz = rbx.astype(f32), rby.astype(f32), rbz.astype(f32)
    dx = jnp.asarray(lbx, f32) - sx
    dy = jnp.asarray(lby, f32) - sy
    dz = jnp.asarray(lbz, f32) - sz
    largest = c_max(c_max(jnp.abs(dx), jnp.abs(dy)), jnp.abs(dz))
    stx = exact_f32_div(dx, largest)
    sty = exact_f32_div(dy, largest)
    stz = exact_f32_div(dz, largest)
    n_steps = largest.astype(jnp.int32)
    total = 7 * jnp.max(n_steps)

    start_flat = (rbx * cfg.hash_height + rby) * cfg.hash_length + rbz

    ox, oy, oz = origin
    ivx, ivy, ivz = inv_dir

    px_all, py_all, pz_all = (pos[:, a].astype(f32) for a in range(3))
    qx_all = (pos[:, 0] + ext[:, 0]).astype(f32)
    qy_all = (pos[:, 1] + ext[:, 1]).astype(f32)
    qz_all = (pos[:, 2] + ext[:, 2]).astype(f32)

    def slab_hit(ent):
        x1 = (px_all[ent] - ox) * ivx
        x2 = (qx_all[ent] - ox) * ivx
        lo = c_min(x1, x2)
        hi = c_max(x1, x2)
        y1 = (py_all[ent] - oy) * ivy
        y2 = (qy_all[ent] - oy) * ivy
        lo = c_max(lo, c_min(y1, y2))
        hi = c_min(hi, c_max(y1, y2))
        z1 = (pz_all[ent] - oz) * ivz
        z2 = (qz_all[ent] - oz) * ivz
        lo = c_max(lo, c_min(z1, z2))
        hi = c_min(hi, c_max(z1, z2))
        return hi >= lo

    def cond(carry):
        t, _, _, _, _ = carry
        return t < total

    def body(carry):
        t, tx, ty, tz, occluded = carry
        phase = t % 7
        axx = (phase == 0) | (phase == 3) | (phase == 4) | (phase == 6)
        axy = (phase == 1) | (phase == 3) | (phase == 5) | (phase == 6)
        axz = (phase == 2) | (phase == 4) | (phase == 5) | (phase == 6)
        cx = tx + jnp.where(axx, stx, 0.0)
        cy = ty + jnp.where(axy, sty, 0.0)
        cz = tz + jnp.where(axz, stz, 0.0)
        advance = phase == 6
        tx = jnp.where(advance, cx, tx)
        ty = jnp.where(advance, cy, ty)
        tz = jnp.where(advance, cz, tz)

        active = (t < 7 * n_steps) & ~occluded
        bx = cx.astype(jnp.int32)
        by = cy.astype(jnp.int32)
        bz = cz.astype(jnp.int32)
        flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
        in_range = (flat >= 0) & (flat < V)
        flat_c = jnp.where(in_range, flat, 0)
        test = active & in_range & (flat != start_flat)

        cnt = counts[flat_c]
        for k in range(cap):
            ent = bins_ent[:, k][flat_c]
            consider = test & (k < cnt) & (ent != start_ent)
            ent_s = jnp.where(ent >= 0, ent, 0)
            occluded = occluded | (consider & slab_hit(ent_s))
        return (t + 1, tx, ty, tz, occluded)

    occ0 = jnp.zeros(rbx.shape, bool)
    carry = (jnp.int32(0), sx, sy, sz, occ0)
    _, _, _, _, occluded = jax.lax.while_loop(cond, body, carry)
    return ~occluded
