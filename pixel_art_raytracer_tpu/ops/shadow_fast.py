"""Table-driven shadow pass — same semantics as ops/shadow.py, restructured.

The per-pixel DDA in ops/shadow.py gathers bin data at every step of every
ray.  This module exploits two structural facts to eliminate the data-
dependent marching entirely:

1. **The start-bin space is tiny.**  For every surface pixel the oblique
   projection gives ``world_y + world_z == world_j`` exactly (the depth
   reconstruction at alternative.cpp:349-363 telescopes), so the shadow ray's
   start bin is ``(pixel_bin_x, pixel_bin_y, wz / bin_size)`` — only the z
   coordinate is data-dependent, and it spans a handful of values bounded by
   the scene's z extent.  Background pixels collapse to one extra row
   (``sy == hash_height``, the aliased index the reference also computes).

2. **The march itself depends only on (start bin, light bin).**  With the
   light fixed per frame, the exact 7-phase DDA (float stepping, truncation,
   start-bin skip, out-of-range handling) can be *simulated once per start
   bin* — a few thousand tiny rays — yielding a membership table
   ``member[start, bin]`` of which bins each path tests.

Occlusion is then an order-free OR over live (bin, slot) candidates:
``hit(pixel, box) AND member[start(pixel), bin]``.  The per-pixel inner loop
touches no tables except a per-pixel 24-word membership bitmap gathered once
per frame; candidate boxes stream through the loop as scalars.

Exactness: the simulation runs the identical f32/int operations as the scan
implementation, membership is a set (the serial code's early-return only
short-circuits an OR), and the slab test / self-skip are unchanged.  The
candidate list is compacted to the bins some path actually tests; a static
capacity ``max_candidates`` bounds it, with an overflow flag returned for
validation (an overflowing frame would silently lose occluders).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from .cstyle import c_min, c_max, exact_f32_div


class ShadowTables(NamedTuple):
    """Static-shape per-scene parameters for the fast shadow pass."""

    sz_lo: int            # inclusive lower bound of start-bin z index
    sz_hi: int            # exclusive upper bound
    max_steps: int        # static DDA step bound
    max_candidates: int   # static candidate capacity
    max_block_candidates: int = 1024  # per-row-block pruned list capacity


def default_tables(config: RenderConfig,
                   max_steps: int = 16, max_candidates: int = 2048,
                   max_block_candidates: int = 1024) -> ShadowTables:
    """Scene-agnostic static table bounds: the start-bin z range covers the
    whole hash grid plus a 2-bin apron.  Use :func:`derive_tables` when the
    scene is known — content-derived bounds shrink every membership table
    and the kernel's per-block sz loop (the runtime guards keep either
    choice exact)."""
    sz_lo, sz_hi = -2, config.hash_length + 2
    return ShadowTables(sz_lo=sz_lo, sz_hi=sz_hi, max_steps=max_steps,
                        max_candidates=max_candidates,
                        max_block_candidates=max_block_candidates)


def derive_tables(config: RenderConfig, scene, atlas=None,
                  n_dynamic: int = 1, max_steps: int = 16,
                  max_candidates: int | None = None,
                  max_block_candidates: int = 1024) -> ShadowTables:
    """Content-derived static table bounds for a known scene.

    The start-bin z index of a surface pixel is ``trunc(wz / bin_size)``
    with ``wz = winner_pos_z + sprite_depth`` (the oblique reconstruction,
    alternative.cpp:349-363), and winners are always *binned* entities —
    the frustum cull (alternative.cpp:212-219) bounds their z position to
    ``(-ext_z, view_length)``.  So the sz table range follows from the
    scene's actual z content plus its sprites' depth maxima; background
    pixels contribute the fixed start ``sz == 0`` (quirk Q6).

    The leading ``n_dynamic`` entities (the reference's player is entity 0,
    alternative.cpp:643-660) are assumed movable anywhere in the frustum,
    so they contribute the full frustum-reachable range — a scripted player
    never trips the runtime sz guard.  Static entities use their actual
    positions.  The guard still backstops hostile scenes: a start outside
    the derived range reroutes the frame to the exact dynamic march.

    ``max_candidates`` (None = derive): the candidate compaction capacity
    only needs to hold every live (bin, slot) entry — at most the
    wrap-visible occupancy sum over all bins (quirk Q3 caps each bin at
    ``capacity - 1`` *visible* entries).  Derived from a host-side static
    binning count plus a margin for the dynamics' covered bins, rounded to
    the kernel's 128-lane blocking.
    """
    import math

    cfg = config
    bs = cfg.bin_size
    if atlas is None:
        atlas = scene.atlas
    pos = np.asarray(scene.pos)
    ext = np.asarray(scene.ext)
    depth = np.asarray(atlas.depth)
    sid = np.asarray(scene.sprite_id)
    dmax_sprite = depth.reshape(depth.shape[0], -1).max(axis=1)

    # Binnable static entities: z0 in (-ext_z, view_length) — others are
    # frustum-culled every frame and can never become winners.
    z0 = pos[:, 2]
    binnable = (z0 + ext[:, 2] > 0) & (z0 < cfg.view_length)
    binnable[:n_dynamic] = False
    wz_vals = [0]                                   # background start
    if binnable.any():
        wz_vals.append(int(z0[binnable].min()))
        wz_vals.append(int((z0[binnable] + dmax_sprite[sid[binnable]]).max()))
    if n_dynamic > 0:
        # Dynamics: full frustum-reachable z range for their extents/depths.
        dez = int(ext[:n_dynamic, 2].max())
        ddep = int(dmax_sprite[sid[:n_dynamic]].max())
        wz_vals.append(1 - dez)
        wz_vals.append(cfg.view_length - 1 + ddep)
    sz_lo = min(math.trunc(v / bs) for v in wz_vals)
    sz_hi = max(math.trunc(v / bs) for v in wz_vals) + 1

    if max_candidates is None:
        from . import binning

        totals = binning.bin_totals_numpy(pos, ext, cfg)
        live = int((totals & (cfg.bin_capacity - 1)).sum())
        # Dynamics can re-cover bins and flip wrap-visible counts by up to
        # capacity-1 in each bin they touch.
        spans = binning.entity_span_bound(ext.max(axis=0), cfg)
        margin = n_dynamic * spans[0] * spans[1] * spans[2] * (
            cfg.bin_capacity - 1)
        bound = live + margin
        if 32 % cfg.hash_length == 0:
            # Merged candidates (one per (entity, word), Candidates
            # docstring) admit a second bound: distinct (entity, word)
            # pairs over all covered bins — visible slots are a subset of
            # insertions for ANY wrap phase, and moving a dynamic only
            # changes its own covered words.
            pairs = binning.unique_entity_word_pairs(pos, ext, cfg)
            wmargin = n_dynamic * spans[0] * (spans[1] // (
                32 // cfg.hash_length) + 2)
            bound = min(bound, pairs + wmargin)
        max_candidates = max(128, -(-bound // 128) * 128)

    return ShadowTables(sz_lo=sz_lo, sz_hi=sz_hi, max_steps=max_steps,
                        max_candidates=max_candidates,
                        max_block_candidates=max_block_candidates)


def _phase_axes(t):
    phase = t % 7
    axx = (phase == 0) | (phase == 3) | (phase == 4) | (phase == 6)
    axy = (phase == 1) | (phase == 3) | (phase == 5) | (phase == 6)
    axz = (phase == 2) | (phase == 4) | (phase == 5) | (phase == 6)
    return phase, axx, axy, axz


def _dda_probe_flats(light_bin, config: RenderConfig, tables: ShadowTables):
    """Simulate the 7-phase DDA from every start bin in the table space.

    Returns ``flats``: (7*max_steps, P) int32 — the flat bin id each probe
    of each start's path tests, with inactive/out-of-range/start-skip probes
    mapped to the sentinel V.  P = hash_w * (hash_h + 1) * (sz_hi - sz_lo),
    ordered (sx, sy, sz) row-major.  Replicates the scan implementation
    exactly: float stepping, truncation toward zero, the start-flat skip
    (including aliased flats), and masking of out-of-allocation indices.
    """
    cfg = config
    SX, SY = cfg.hash_width, cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo

    sx = jnp.arange(SX, dtype=jnp.int32)[:, None, None]
    sy = jnp.arange(SY, dtype=jnp.int32)[None, :, None]
    sz = jnp.arange(tables.sz_lo, tables.sz_hi, dtype=jnp.int32)[None, None, :]
    sx, sy, sz = (jnp.broadcast_to(a, (SX, SY, SZ)).reshape(-1)
                  for a in (sx, sy, sz))
    return _dda_probe_flats_from(sx, sy, sz, light_bin, cfg,
                                 tables.max_steps)


def _dda_probe_flats_from(sx, sy, sz, light_bin, config: RenderConfig,
                          max_steps: int):
    """DDA probe simulation from explicit start-bin arrays toward per-start
    (or scalar, broadcast) light bins — the shared core of the point-light
    table build and the directional extended start space
    (ops/shadow_dir.py).  Arguments are flat (P,) int32 arrays; returns
    (7*max_steps, P) int32 probe flats with sentinel V."""
    cfg = config
    V = cfg.hash_volume
    f32 = jnp.float32

    lbx, lby, lbz = light_bin
    fx, fy, fz = sx.astype(f32), sy.astype(f32), sz.astype(f32)
    dx = jnp.asarray(lbx, f32) - fx
    dy = jnp.asarray(lby, f32) - fy
    dz = jnp.asarray(lbz, f32) - fz
    largest = c_max(c_max(jnp.abs(dx), jnp.abs(dy)), jnp.abs(dz))
    stx = exact_f32_div(dx, largest)
    sty = exact_f32_div(dy, largest)
    stz = exact_f32_div(dz, largest)
    n_steps = largest.astype(jnp.int32)
    start_flat = (sx * cfg.hash_height + sy) * cfg.hash_length + sz

    P = sx.shape[0]

    # The serial DDA's only sequential dependence is the anchor accumulation
    # (temp += step at phase 6, alternative.cpp:460-466): unroll those
    # max_steps f32 adds exactly, then evaluate all 7 phase probes of every
    # cycle densely — no lax.scan (sequential small-array scans are
    # overhead-bound on TPU).
    ax, ay, az = fx, fy, fz
    anchors = []
    for _ in range(max_steps):
        anchors.append((ax, ay, az))
        ax = ax + stx
        ay = ay + sty
        az = az + stz
    K = max_steps
    Axs = jnp.stack([a[0] for a in anchors])       # (K, P)
    Ays = jnp.stack([a[1] for a in anchors])
    Azs = jnp.stack([a[2] for a in anchors])

    # Phase probes: (7, K, P).  Iteration 7k+p is active iff k < n_steps.
    offs = jnp.asarray(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
         [1, 1, 1]], f32)
    cx = Axs[None] + offs[:, 0][:, None, None] * stx[None, None]
    cy = Ays[None] + offs[:, 1][:, None, None] * sty[None, None]
    cz = Azs[None] + offs[:, 2][:, None, None] * stz[None, None]
    bx = cx.astype(jnp.int32)
    by = cy.astype(jnp.int32)
    bz = cz.astype(jnp.int32)
    flat = (bx * cfg.hash_height + by) * cfg.hash_length + bz
    active = (jnp.arange(K, dtype=jnp.int32)[None, :, None]
              < n_steps[None, None, :])
    ok = active & (flat >= 0) & (flat < V) & (flat != start_flat[None, None])
    return jnp.where(ok, flat, V).reshape(7 * K, P)


def dda_membership(light_bin, config: RenderConfig, tables: ShadowTables):
    """(P, V) bool membership: True where start p's path tests flat bin v."""
    cfg = config
    V = cfg.hash_volume
    flats = _dda_probe_flats(light_bin, cfg, tables)

    # Dense one-hot OR beats a scatter on TPU at these sizes.
    P = flats.shape[1]
    bins = jnp.arange(V, dtype=jnp.int32)[None, :]
    member = jnp.zeros((P, V), bool)
    for t0 in range(0, flats.shape[0], 14):
        chunk = flats[t0:t0 + 14]                  # (<=14, P)
        member = member | (chunk[:, :, None] == bins[None]).any(axis=0)
    return member


def dda_membership_words(light_bin, config: RenderConfig,
                         tables: ShadowTables):
    """(P, n_words) uint32: bit v of row p set iff member[p, v].

    Same probe simulation as :func:`dda_membership` (shared helper), but the
    one-hot runs over 32x fewer columns: probes scatter into words via a
    compare-select against the word index and an OR-fold — ~30x less compare
    and materialisation work than the dense (P, V) build, which matters when
    the simulation runs per frame of an animation batch.
    """
    cfg = config
    flats = _dda_probe_flats(light_bin, cfg, tables)    # (7K, P)
    return _words_from_flats(flats, cfg.hash_volume)


def _words_from_flats(flats, V: int):
    """(7K, P) probe flats (sentinel V) -> (P, n_words) uint32 bitmaps."""
    n_words = -(-V // 32)
    word_id = flats // 32                                # sentinel V -> n_words*
    shifted = (jnp.uint32(1)
               << (flats % 32).astype(jnp.uint32))
    # Sentinel probes (flats == V) must contribute nothing: V % 32 may alias
    # a real bit, so zero them explicitly.
    shifted = jnp.where(flats == V, jnp.uint32(0), shifted)

    cols = []
    for w in range(n_words):
        bits = jnp.where(word_id == w, shifted, jnp.uint32(0))  # (7K, P)
        cols.append(jax.lax.reduce(bits, jnp.uint32(0),
                                   jax.lax.bitwise_or, (0,)))   # (P,)
    return jnp.stack(cols, axis=1)                       # (P, n_words)


def unpack_member_words(words, config: RenderConfig):
    """(P, n_words) uint32 -> (P, V) bool (inverse of the word packing)."""
    V = config.hash_volume
    P, nw = words.shape
    bits = ((words[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None])
            & jnp.uint32(1))
    return bits.reshape(P, nw * 32)[:, :V] > 0


class Candidates(NamedTuple):
    """Compacted live occluder list (static length M), merged per
    (entity, membership word).

    A flat bin id's word is ``bin // 32``; one uint32 word covers 32
    consecutive flat bins (whole z-columns: hash_length divides 32), so an
    entity occupying several bins of the same word used to produce several
    candidates running the *identical* slab test.  Merging keeps one
    candidate carrying the OR of the occupied bins' bits (``mask``) — the
    occlusion test ``hit AND (bitmap[word] & mask) != 0`` equals the OR of
    the per-bin tests exactly (the slab test and self-skip depend only on
    the entity).  Graybox: 831 live slots -> 660 candidates.
    """

    valid: jax.Array      # (M,) bool
    ent: jax.Array        # (M,) int32 entity index
    bin: jax.Array        # (M,) int32 flat bin id (first occurrence)
    pmin: jax.Array       # (M, 3) float32 box min corner
    pmax: jax.Array       # (M, 3) float32 box max corner
    overflow: jax.Array   # () bool — True if capacity was exceeded
    mask: jax.Array       # (M,) int32 — occupied-bin bits within the word


def build_candidates(pos, ext, bins_ent, counts, member,
                     config: RenderConfig, tables: ShadowTables,
                     tested_any=None, dyn_pos=None) -> Candidates:
    """Flatten live (bin, slot) entries, prune bins no path tests, compact.

    ``tested_any`` (V,) bool may be passed directly (batched callers derive
    it from packed membership words; ``member`` is then unused and may be
    None).  ``dyn_pos`` (D, 3) overrides the positions of the leading D
    dynamic entities without materialising a per-frame ``pos`` copy.
    """
    cfg = config
    V = cfg.hash_volume
    cap = cfg.bin_capacity
    M = tables.max_candidates

    slot = jnp.arange(cap, dtype=jnp.int32)[None, :]
    live = slot < counts[:, None]                       # (V, cap)
    if tested_any is None:
        tested_any = member.any(axis=0)                 # (V,)

    # Merge per (entity, word): group the slot space by membership word
    # (32 consecutive flat bins), detect duplicate entities inside each
    # group, and build the occupied-bin bit masks.  All pairwise work is
    # word-local ((n_words, S, S) with S = 32*cap), so it stays tiny.
    n_words = -(-V // 32)
    Vp = n_words * 32
    elig = live & tested_any[:, None]                   # (V, cap)
    ente = jnp.where(elig, bins_ent, -1)
    if Vp != V:
        ente = jnp.pad(ente, ((0, Vp - V), (0, 0)), constant_values=-1)
    S = 32 * cap
    g_ent = ente.reshape(n_words, S)
    gb = ente.reshape(n_words, 32, cap)
    is_cand = g_ent >= 0
    # Occupied-bin presence per slot vs its word's 32 bins.
    occ = ((g_ent[:, :, None, None] == gb[:, None, :, :]).any(axis=3)
           & is_cand[:, :, None])                       # (nw, S, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))
    mask_w = (occ.astype(jnp.uint32) * weights[None, None, :]).sum(
        axis=2, dtype=jnp.uint32)                       # (nw, S)
    # First occurrence of each (entity, word) in slot order.
    eqm = ((g_ent[:, :, None] == g_ent[:, None, :])
           & is_cand[:, :, None] & is_cand[:, None, :])
    earlier = jnp.tril(jnp.ones((S, S), bool), -1)
    dup = (eqm & earlier[None]).any(axis=2)             # (nw, S)
    keep = (is_cand & ~dup).reshape(Vp, cap)[:V].reshape(-1)
    mask_flat = mask_w.reshape(Vp, cap)[:V].reshape(-1).astype(jnp.int32)

    n_keep = keep.sum()
    overflow = n_keep > M
    # Stable compaction: order by ~keep keeps kept entries first, in
    # (bin, slot) order.
    order = jnp.argsort(~keep, stable=True)[:M]
    valid = keep[order]
    flat_idx = order
    bin_id = (flat_idx // cap).astype(jnp.int32)
    mask = jnp.where(valid, mask_flat[flat_idx], 0)
    ent = jnp.where(valid, bins_ent.reshape(-1)[flat_idx], 0)
    pe = pos[ent]
    if dyn_pos is not None:
        for d in range(dyn_pos.shape[0]):
            pe = jnp.where((ent == d)[..., None], dyn_pos[d], pe)
    p = pe.astype(jnp.float32)
    q = (pe + ext[ent]).astype(jnp.float32)
    # Pad to a lane multiple: small grids (V*cap < max_candidates) would
    # otherwise produce a list shorter than the Pallas driver's 128-wide
    # SMEM blocking.  Padded rows are valid=False (kernels route them at
    # the always-zero membership word).
    L = valid.shape[0]
    Lp = max(128, -(-L // 128) * 128)
    if Lp != L:
        pad = Lp - L
        valid = jnp.pad(valid, (0, pad))
        ent = jnp.pad(ent, (0, pad))
        bin_id = jnp.pad(bin_id, (0, pad))
        mask = jnp.pad(mask, (0, pad))
        p = jnp.pad(p, ((0, pad), (0, 0)))
        q = jnp.pad(q, ((0, pad), (0, 0)))
    return Candidates(valid=valid, ent=ent, bin=bin_id, pmin=p, pmax=q,
                      overflow=overflow, mask=mask)


def trace_light_fast(bitmap_words, start_ent, origin, inv_dir,
                     cands: Candidates, config: RenderConfig) -> jax.Array:
    """OR-scan over candidates; True where the light is reachable.

    Args:
      bitmap_words: (H, W, n_words) uint32 per-pixel membership bitmap.
      start_ent, origin, inv_dir: as in ops.shadow.trace_light.
    """
    cfg = config
    ox, oy, oz = origin
    ivx, ivy, ivz = inv_dir

    def body(occluded, cand):
        valid, ent, bin_id, mask, pmin, pmax = cand
        word = bin_id // 32
        w = jax.lax.dynamic_index_in_dim(bitmap_words, word, axis=2,
                                         keepdims=False)
        member = (w & mask.astype(jnp.uint32)) != 0
        consider = valid & member & (ent != start_ent)

        x1 = (pmin[0] - ox) * ivx
        x2 = (pmax[0] - ox) * ivx
        lo = c_min(x1, x2)
        hi = c_max(x1, x2)
        y1 = (pmin[1] - oy) * ivy
        y2 = (pmax[1] - oy) * ivy
        lo = c_max(lo, c_min(y1, y2))
        hi = c_min(hi, c_max(y1, y2))
        z1 = (pmin[2] - oz) * ivz
        z2 = (pmax[2] - oz) * ivz
        lo = c_max(lo, c_min(z1, z2))
        hi = c_min(hi, c_max(z1, z2))
        hit = hi >= lo
        return occluded | (consider & hit), None

    occ0 = jnp.zeros(start_ent.shape, bool)
    occluded, _ = jax.lax.scan(
        body, occ0,
        (cands.valid, cands.ent, cands.bin, cands.mask, cands.pmin,
         cands.pmax))
    return ~occluded


def pixel_bitmap(member, start_sx, start_sy, start_sz,
                 config: RenderConfig, tables: ShadowTables) -> jax.Array:
    """Gather each pixel's membership row, packed to uint32 words.

    start_s{x,y,z}: (H, W) int32 start-bin coords (sz may be negative).
    Out-of-table starts clamp — callers should size the table to content
    (default_tables) so this never binds.
    """
    cfg = config
    V = cfg.hash_volume
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    n_words = -(-V // 32)

    # Pack member rows into u32 words once (P x n_words).
    P = member.shape[0]
    pad = n_words * 32 - V
    bits = jnp.pad(member, ((0, 0), (0, pad))).reshape(P, n_words, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    words = (bits.astype(jnp.uint32) * weights).sum(axis=2, dtype=jnp.uint32)

    sx = jnp.clip(start_sx, 0, cfg.hash_width - 1)
    sy = jnp.clip(start_sy, 0, SY - 1)
    sz = jnp.clip(start_sz - tables.sz_lo, 0, SZ - 1)
    idx = (sx * SY + sy) * SZ + sz
    return words[idx]                                   # (H, W, n_words)
