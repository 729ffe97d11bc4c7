"""Directional-light batched shadow machinery (framework extension).

The point-light fast path (ops/shadow_fast.py) exploits that occlusion
membership depends only on (start bin, light bin), with the light bin a
per-frame constant.  A directional light (ops/shade.shade_directional)
instead builds a per-PIXEL virtual far light: each axis of the light bin
is ``c_div(coord + K_axis, bin_size)`` with ``K = trunc(tl * span)``
per-frame constants — so the light bin varies across the frame and the
point-light tables do not apply.

But the variation is tiny and structured: ``c_div`` is monotone and a
start bin's coordinate preimage is an integer interval of length at most
``2*bin_size - 1`` (the truncation bin at zero is twice as wide), so
within one start bin each light-bin axis takes at most 2 consecutive
values (3 for z, whose coordinate may be negative):

  x: coord = wx = lane              -> VX = 2 variants, lane-determined
  y: coord = H - wy - wz (= screen  -> VY = 2 variants (the coord is in
     row for hits, H for background)   [0, H]), row/pixel-determined
  z: coord = wz                     -> VZ = 3 variants, pixel-determined

So (start bin, light bin) enumerates an EXTENDED start space: the x
variant rides the lane-selection matrix (``sx' = sx*VX + vx``) and the
(y, z) variants extend the membership row axis
(``ez = (sz*VY + vy)*VZ + vz``).  Every downstream consumer — candidate
relevance, lane member tables, the Pallas shadow kernel — runs unchanged
on the extended tables; only the per-pixel row index and the (traced,
per-frame) lane matrix differ from the point path.

Exactness: every pixel maps to the extended entry carrying exactly its
own (rb, lb) pair (the variant indices are the pixel's actual
``lb - base`` differences, provably in range by the interval argument
above), and the probe simulation runs the identical f32/int operations
as the scan path (shadow_fast._dda_probe_flats_from with the same
``max_steps``), so occlusion is bit-identical to shade_directional's
trace_light march (alternative.cpp:411-470 semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .cstyle import c_div, exact_f32_div, exact_f32_recip
from . import shadow_fast
from .shadow_fast import ShadowTables

VX, VY, VZ = 2, 2, 3


def grid_max_steps(config: RenderConfig) -> int:
    """shade_directional's default march bound: a ray starting in the grid
    leaves it after at most this many thick-DDA steps."""
    return (config.hash_width + config.hash_height + 1
            + config.hash_length)


def extended_tables(tables: ShadowTables) -> ShadowTables:
    """ShadowTables describing the extended row axis (for the SZ-consuming
    downstream calls: relevance, lane tables, kernel, sz ranges)."""
    SZ = tables.sz_hi - tables.sz_lo
    return tables._replace(sz_lo=0, sz_hi=SZ * VY * VZ)


def direction_constants(direction, config: RenderConfig):
    """Per-frame constants, mirroring shade_directional exactly:
    tl (L1-normalized toward-light), inv (reciprocals), K (virtual
    far-light integer offsets trunc(tl*span))."""
    cfg = config
    f32 = jnp.float32
    d = jnp.asarray(direction, f32)
    length = jnp.abs(d[0]) + jnp.abs(d[1]) + jnp.abs(d[2])
    tlx = exact_f32_div(d[0], length)
    tly = exact_f32_div(d[1], length)
    tlz = exact_f32_div(d[2], length)
    tlx, tly, tlz = jax.lax.optimization_barrier((tlx, tly, tlz))
    inv = (exact_f32_recip(tlx), exact_f32_recip(tly),
           exact_f32_recip(tlz))
    span = max(cfg.view_width, cfg.view_height, cfg.view_length) * 2
    K = tuple((t * span).astype(jnp.int32) for t in (tlx, tly, tlz))
    return (tlx, tly, tlz), inv, K


def _zlo(s, bs):
    """Low end of c_div's preimage interval of bin ``s`` for a coordinate
    that may be negative (truncation toward zero)."""
    return jnp.where(s > 0, s * bs, s * bs - (bs - 1))


def axis_bases(K, config: RenderConfig, tables: ShadowTables):
    """Per-axis light-bin base tables: m(s) = the smallest light bin any
    coordinate in start-bin s's preimage maps to (monotonicity puts it at
    the interval's low end).  x/y preimages are non-negative intervals
    [s*bs, s*bs+bs); z uses the signed interval low end."""
    cfg = config
    bs = jnp.int32(cfg.bin_size)
    Kx, Ky, Kz = K
    sxs = jnp.arange(cfg.hash_width, dtype=jnp.int32)
    mx = c_div(sxs * bs + Kx, bs)
    sys_ = jnp.arange(cfg.hash_height + 1, dtype=jnp.int32)
    my = c_div(sys_ * bs - (Ky + Kz), bs)
    szs = jnp.arange(tables.sz_lo, tables.sz_hi, dtype=jnp.int32)
    mz = c_div(_zlo(szs, bs) + Kz, bs)
    return mx, my, mz


def membership_words_dir(K, config: RenderConfig, tables: ShadowTables,
                         max_steps: int):
    """(P_eff, n_words) uint32 membership bitmaps for the extended start
    space, ordered ``((sx*VX+vx)*SY + sy) * SZ_eff + (szi*VY+vy)*VZ+vz``
    (SZ_eff = SZ*VY*VZ) — the layout every downstream reshape assumes.

    Entry (start, variants) simulates the DDA from start bin
    (sx, sy, sz_lo+szi) toward light bin (mx[sx]+vx, my[sy]+vy,
    mz[szi]+vz).  Some variant combinations are unreachable by any pixel;
    their rows are simulated anyway (harmless: no pixel selects them, and
    they only widen ``tested_any`` slightly)."""
    cfg = config
    mx, my, mz = axis_bases(K, cfg, tables)
    SX, SY = cfg.hash_width, cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    shape = (SX, VX, SY, SZ, VY, VZ)

    def bc(n, axis):
        sh = [1] * 6
        sh[axis] = -1
        a = jnp.arange(n, dtype=jnp.int32).reshape(sh)
        return jnp.broadcast_to(a, shape).reshape(-1)

    sx, vx, sy, szi, vy, vz = (bc(n, i) for i, n in
                               enumerate((SX, VX, SY, SZ, VY, VZ)))
    sz = szi + jnp.int32(tables.sz_lo)
    lb = (mx[sx] + vx, my[sy] + vy, mz[szi] + vz)
    flats = shadow_fast._dda_probe_flats_from(sx, sy, sz, lb, cfg,
                                              max_steps)
    return shadow_fast._words_from_flats(flats, cfg.hash_volume)


def lane_rows_and_matrix(Kx, config: RenderConfig, w_pad: int):
    """Per-lane extended x index (w_pad,) int32 and the (SX*VX, w_pad)
    0/1 f32 lane-selection matrix (traced — Kx is a per-frame value).
    Padding lanes (>= view_width) select nothing."""
    cfg = config
    bs = jnp.int32(cfg.bin_size)
    SX = cfg.hash_width
    lanes = jnp.arange(w_pad, dtype=jnp.int32)
    sx = jnp.minimum(lanes // bs, SX - 1)
    vx = c_div(lanes + Kx, bs) - c_div(sx * bs + Kx, bs)
    rows = sx * VX + jnp.clip(vx, 0, VX - 1)
    valid = lanes < cfg.view_width
    sel = ((rows[None, :] == jnp.arange(SX * VX, dtype=jnp.int32)[:, None])
           & valid[None, :]).astype(jnp.float32)
    return rows, sel


def pixel_rows(gbuf_y, gbuf_z, K, config: RenderConfig,
               tables: ShadowTables):
    """Per-pixel extended membership row index ez (h, W) int32 and the
    raw start-bin z (for the sz-range guard).  Background pixels get an
    (arbitrary, unused) in-range value — the kernel routes them through
    the t_bg table."""
    cfg = config
    bs = jnp.int32(cfg.bin_size)
    _, Ky, Kz = K
    SZ = tables.sz_hi - tables.sz_lo
    jp = jnp.int32(cfg.view_height) - gbuf_y - gbuf_z
    rby = c_div(jp, bs)
    rbz = c_div(gbuf_z, bs)
    vy = c_div(jp - (Ky + Kz), bs) - c_div(rby * bs - (Ky + Kz), bs)
    vz = c_div(gbuf_z + Kz, bs) - c_div(_zlo(rbz, bs) + Kz, bs)
    szi = jnp.clip(rbz - tables.sz_lo, 0, SZ - 1)
    ez = ((szi * VY + jnp.clip(vy, 0, VY - 1)) * VZ
          + jnp.clip(vz, 0, VZ - 1))
    return ez, rbz


def bg_row(K, config: RenderConfig, tables: ShadowTables):
    """Traced extended row index of the background start (wy = wz = 0,
    quirk Q6) — indexes the ez axis of the membership tables; the bg
    start's sy is the same aliased row the point path uses."""
    cfg = config
    bs = jnp.int32(cfg.bin_size)
    _, Ky, Kz = K
    H = jnp.int32(cfg.view_height)
    sy_bg = c_div(H, bs)
    vy = c_div(H - (Ky + Kz), bs) - c_div(sy_bg * bs - (Ky + Kz), bs)
    zero = jnp.int32(0)
    vz = c_div(Kz, bs) - c_div(_zlo(zero, bs) + Kz, bs)
    szi = jnp.int32(-tables.sz_lo)
    return (szi * VY + jnp.clip(vy, 0, VY - 1)) * VZ + jnp.clip(vz, 0,
                                                                VZ - 1)


def pixel_light_bins(gbuf_y, gbuf_z, K, config: RenderConfig):
    """Per-pixel virtual far-light bins (the scan path's lb) — used by the
    exact fallback march when a directional frame violates the table
    envelope.  Mirrors shade_directional's fx/fy/fz derivation."""
    cfg = config
    bs = jnp.int32(cfg.bin_size)
    Kx, Ky, Kz = K
    H, W = gbuf_y.shape
    wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
    lbx = c_div(wx + Kx, bs)
    lby = c_div(jnp.int32(cfg.view_height) - gbuf_y - gbuf_z - (Ky + Kz),
                bs)
    lbz = c_div(gbuf_z + Kz, bs)
    return lbx, lby, lbz
