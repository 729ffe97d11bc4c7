"""Pallas TPU kernel for primary visibility.

Design (see SURVEY.md §7 stage 6): the jnp tracer's (bin_z, slot) candidate
scan is restructured so the kernel touches **no gathers and no scalar
loads** — everything is dense vector work on VMEM-resident tables:

* Candidate fields are pre-expanded in XLA from the (V, C) bin table to
  ``[hash_height, C*hash_length, W_pad]`` lane-aligned arrays (the bin_x of a
  pixel is ``lane // bin_size``, so a ``jnp.repeat`` along lanes bakes the
  per-column candidate into each lane).  Seven derived fields cover the hit
  test and depth key; per-block slices are ~1 MB and stream HBM->VMEM
  through the grid.
* The per-texel sprite-depth lookup — the one true gather in the reference
  inner loop (alternative.cpp:336-341) — becomes arithmetic: sprites whose
  depth map is the ramp ``max(0, d0 - slope*row)`` (the shipped tile is
  (19, 1); constant maps are (c, 0)) carry (d0, slope) as two more expanded
  fields.  Non-ramp atlases fall back to the jnp tracer.
* Candidate order collapses into the depth key: ``key = depth*64 + (63 -
  candidate_index)`` makes the sequential strictly-greater scan equal to a
  max-reduction (first-wins ties preserved), and the winning candidate is
  recovered from the low bits — no argmax bookkeeping.
* The early-exit heuristic (quirk Q5) is evaluated per bin from per-bin key
  maxima with an 8-step masked scan — identical culling, no serial breaks.

The kernel emits the per-pixel winning key; a jnp epilogue decodes the
winner entity and materialises the G-buffer (ops/trace.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .trace import GBufferArrays

# Sentinel below any real key (real keys are >= -2^29 for sane scenes).
KEY_MIN = -(2 ** 30)

# Ramp-atlas kernels compute per-row keys with running carries instead of
# fresh multiply chains (see _trace_kernel phase 1) — exact either way;
# profiling tools flip this to A/B both compiled variants.  Interleaved
# A/B on v5e graybox (F=64, R=40/G=2/TR=40): med 0.823 ms/f incremental
# vs 0.811 direct — speed-neutral (the kernel is not ALU-issue bound at
# these shapes).  The incremental form stays the default for its VMEM
# footprint: the running carries keep fewer block-wide temporaries live,
# and the direct variant OOM'd Mosaic's 16 MB scoped-vmem stack by ~2 MB
# on the full-capacity (64-candidate) whole-bin-row kernel that rides
# every production program as the slot-overflow fallback branch.
INCREMENTAL_KEYS = True

# Frames per trace-kernel grid step (see shadow_pallas.FRAMES_PER_BLOCK
# for the measured-negative story — default 1, kept for re-measurement).
TRACE_FRAMES_PER_BLOCK = 1


def ramp_depth_params(depth: np.ndarray):
    """Fit per-sprite (d0, slope) with depth[r, c] == max(0, d0 - slope*r).

    Returns (d0, slope) int32 arrays of shape (S,) or None when any sprite's
    depth map is not such a ramp (the Pallas path then falls back to jnp).
    """
    s, h, _ = depth.shape
    d0 = depth[:, 0, 0].astype(np.int64)
    if h > 1:
        slope = (depth[:, 0, 0] - depth[:, 1, 0]).astype(np.int64)
    else:
        slope = np.zeros(s, np.int64)
    rows = np.arange(h, dtype=np.int64)[None, :, None]
    expect = np.maximum(0, d0[:, None, None] - slope[:, None, None] * rows)
    if not bool((expect == depth.astype(np.int64)).all()):
        return None
    return d0.astype(np.int32), slope.astype(np.int32)


def depth_segments(depth: np.ndarray, max_segments: int = 64):
    """Fit piecewise ramps to row-constant depth maps.

    Generalises :func:`ramp_depth_params`: any sprite whose depth map is
    constant along columns decomposes into row segments where
    ``depth[r] == d0 - slope * (r - r0)`` — the kernel then resolves sprite
    depth with a select chain over segments instead of a texel gather
    (the reference's one true gather, alternative.cpp:336-341).

    Returns a tuple of (sprite, r0, r1, d0, slope) or None when some sprite
    is not column-constant or the total segment count exceeds
    ``max_segments`` (the jnp tracer then handles the atlas).
    """
    S, H, _ = depth.shape
    if not bool((depth == depth[:, :, :1]).all()):
        return None
    segs = []
    for s in range(S):
        d = depth[s, :, 0].astype(np.int64)
        r0 = 0
        while r0 < H:
            if r0 + 1 == H:
                segs.append((s, r0, H, int(d[r0]), 0))
                break
            slope = int(d[r0] - d[r0 + 1])
            r1 = r0 + 1
            while r1 < H and d[r1] == d[r0] - slope * (r1 - r0):
                r1 += 1
            segs.append((s, r0, r1, int(d[r0]), slope))
            r0 = r1
        if len(segs) > max_segments:
            return None
    return tuple(segs)


def depth_rects(depth: np.ndarray, max_rects: int = 96):
    """Fit 2D ramp rectangles to ARBITRARY depth maps (VERDICT r3 #4).

    Generalises :func:`depth_segments` beyond column-constant maps: every
    depth map decomposes into rectangles (sprite, r0, r1, c0, c1, d0,
    slope) with ``depth[r, c] == d0 - slope * (r - r0)`` inside each rect
    (blocky pixel art yields a handful; the cap bounds the kernel's select
    chain).  The kernel then resolves sprite depth on CLIPPED texel
    coordinates — ``clip(row, 0, SH-1)``, ``clip(col, 0, SW-1)`` — which
    reproduces the reference's per-texel gather (alternative.cpp:336-341,
    as transcribed in ops/trace.py:110-113) exactly for every reachable
    (row, col), in or out of the sprite window.

    Returns a tuple of 7-tuples, or None when the decomposition exceeds
    ``max_rects`` (the jnp tracer's gather then handles the atlas).
    """
    S, H, W = depth.shape
    rects = []
    for s in range(S):
        open_runs: dict = {}                     # (r0, r1, d0, slope) -> c0
        for c in range(W + 1):
            segs = set()
            if c < W:
                d = depth[s, :, c].astype(np.int64)
                r0 = 0
                while r0 < H:
                    if r0 + 1 == H:
                        segs.add((r0, H, int(d[r0]), 0))
                        break
                    slope = int(d[r0] - d[r0 + 1])
                    r1 = r0 + 1
                    while r1 < H and d[r1] == d[r0] - slope * (r1 - r0):
                        r1 += 1
                    segs.add((r0, r1, int(d[r0]), slope))
                    r0 = r1
            for run in list(open_runs):
                if run not in segs:
                    c0 = open_runs.pop(run)
                    rects.append((s, run[0], run[1], c0, c,
                                  run[2], run[3]))
            for run in segs:
                if run not in open_runs:
                    open_runs[run] = c
        if len(rects) > max_rects:
            return None
    return tuple(rects)


def normal_bands(normal: np.ndarray):
    """Detect two-band row-split normal maps: rows [0, split) share one
    normal, rows [split, H) another (the shipped tile: top face (0,1,0),
    front face (0,0,-1)).  Returns (split[S], top[S,3], front[S,3]) or None.
    """
    s, h, w, _ = normal.shape
    top = normal[:, 0, 0]                      # (S, 3)
    splits = np.zeros(s, np.int32)
    fronts = np.empty((s, 3), np.float32)
    for k in range(s):
        rows_equal_top = (normal[k] == top[k]).all(axis=(1, 2))  # (H,)
        split = int(rows_equal_top.argmin()) if not rows_equal_top.all() else h
        band2 = normal[k, split:] if split < h else normal[k, :0]
        front = normal[k, split, 0] if split < h else top[k]
        if not (normal[k, :split] == top[k]).all():
            return None
        if split < h and not (band2 == front).all():
            return None
        splits[k] = split
        fronts[k] = front
    return splits, top.astype(np.float32), fronts


def color_rects(color: np.ndarray, max_rects: int = 32):
    """Decompose sprite color-index maps into uniform rectangles.

    Pixel-art palette maps are blocky: the shipped tile is 14 rectangles.
    Returns a list of (sprite, r0, r1, c0, c1, value) — zero-valued rects
    omitted (the select chain starts from 0) — or None when the
    decomposition exceeds ``max_rects`` (fall back to the texel gather).
    """
    S, H, W = color.shape
    rects = []
    for s in range(S):
        open_runs: dict = {}
        for r in range(H + 1):
            runs = set()
            if r < H:
                row = color[s, r]
                c = 0
                while c < W:
                    c1 = c
                    while c1 < W and row[c1] == row[c]:
                        c1 += 1
                    runs.add((c, c1, int(row[c])))
                    c = c1
            for run in list(open_runs):
                if run not in runs:
                    r0 = open_runs.pop(run)
                    if run[2] != 0:
                        rects.append((s, r0, r, run[0], run[1], run[2]))
            for run in runs:
                if run not in open_runs:
                    open_runs[run] = r
        if len(rects) > max_rects:
            return None
    return rects


# Profiling hook (tools/prof_texp.py): "small" returns the pre-expansion
# field stack, "mm" the f32 matmul output before the int cast.
_texp_upto = None

# Timing-only kernel ablation hook (tools/prof_shadow_ablate.py --kernel
# trace): "nop3" skips the phase-3 winner-field resolve, "nobinmax" skips
# the phase-1 per-(bin, row) maxima writes, "noee" forces the pure-max
# phase-2 scan (no early-exit bookkeeping).  WRONG RESULTS — never set
# outside profiling.
_ablate = None


def _candidate_fields(p, e, sid, ent_ids, d0, slope, field_pack: bool):
    """Candidate field values for entities at positions ``p`` (..., 3).

    Returns the _expand_tables field list WITHOUT the valid masking: row 0
    carries the valid bit SET (packa with vi=1, or all-ones unpacked) —
    callers mask it with the per-slot valid bits afterwards.  Shared by
    the static per-entity table build and the per-frame dynamic-entity
    override so the two stay formula-identical.
    """
    one = jnp.ones_like(ent_ids)
    if field_pack:
        packa = (one + (sid << 1) + (d0[sid] << 4) + (slope[sid] << 9)
                 + (e[..., 1] << 11))
        packb = ((p[..., 0] + 2048)
                 + ((p[..., 0] + e[..., 0] + 2048) << 12))
        return [
            packa,
            packb,
            p[..., 1] + p[..., 2],
            p[..., 1] + e[..., 1] + p[..., 2] + e[..., 2],
            p[..., 1] - p[..., 2],
            ent_ids,
            p[..., 2],                                        # posz
        ]
    return [
        one,
        p[..., 0],
        p[..., 0] + e[..., 0],
        p[..., 1] + p[..., 2],
        p[..., 1] + e[..., 1] + p[..., 2] + e[..., 2],
        p[..., 1] - p[..., 2],
        e[..., 1],
        d0[sid],
        slope[sid],
        ent_ids,
        p[..., 2],                                            # posz
        sid,
    ]


def entity_field_table(pos, ext, sprite_id, d0, slope,
                       field_pack: bool = False):
    """(N, n_fields) int32 static candidate fields, one row per entity.

    Computed ONCE per jitted program (outside any per-frame vmap) so
    _expand_tables' per-frame work collapses to a single gather plus the
    dynamic-entity override — the per-candidate field arithmetic runs on
    nicely-tiled (N,) arrays instead of per frame on (HH, HL, cap, HW)
    tiles whose 12-wide minor dim wastes ~90% of each vector op.
    """
    ids = jnp.arange(pos.shape[0], dtype=jnp.int32)
    fields = _candidate_fields(pos, ext, sprite_id, ids, d0, slope,
                               field_pack)
    return jnp.stack(fields, axis=-1)


def _expand_tables(pos, ext, sprite_id, d0, slope, bins_ent, counts,
                   config: RenderConfig, w_pad: int, dyn_pos=None,
                   n_compact: int | None = None,
                   slot_cap: int | None = None,
                   field_pack: bool = False,
                   ent_fields=None,
                   expand: bool = True):
    """Build lane-expanded candidate field tables.

    Returns a stacked array ``[n_fields, HH, C*HL, w_pad]`` int32 with field
    order: valid, f0 (posx), f1 (posx+ex), f2 (py+pz), f3 (py+ey+pz+ez),
    f4 (py-pz), f5 (ey), f6 (d0), f7 (slope), ent.

    ``field_pack``: pack the small fields into two rows —
    ``packa = valid | sid<<1 | d0<<4 | slope<<9 | ey<<11`` (17 bits) and
    ``packb = (f0+2048) | (f1+2048)<<12`` (24 bits) — shrinking the table
    to [packa, packb, f2, f3, f4, ent, pz] (7 rows instead of 12): ~45%
    less table HBM traffic for both the expansion write and the kernel
    read.  Callers must prove the field ranges host-side
    (``field_pack_ok``); all packed values stay < 2^24, so the f32 MXU
    lane expansion remains exact.

    ``dyn_pos`` (D, 3) overrides the positions of the leading D (dynamic)
    entities — batched callers vmap over per-frame (bins, dyn_pos) without
    materialising a per-frame copy of the whole ``pos`` array.

    ``n_compact``: compact each (bin_y, bin_x) column's hash_length*cap
    candidate rows down to the first ``n_compact`` LIVE entries (live slots
    are a per-bin prefix, so the compaction is a prefix-sum gather — no
    sort), appending a bin-z field the kernel needs for the early-exit
    bookkeeping.  Candidates beyond the bound are dropped — callers guard
    with the per-column live total (see models/batched.py).  On the graybox
    the mean column has ~9 live entries of 64, so the kernel's vector work
    shrinks ~2.7x.  [Measured slower than slot_cap — the bin-z masked
    maxima the early-exit needs outweigh the smaller tables.]

    ``slot_cap``: keep only the first ``slot_cap`` SLOTS of every bin — a
    static slice (live entries are a slot prefix) that preserves the
    kernel's structured per-bin layout, so the early-exit bookkeeping
    stays slice-based.  Exact only when every bin count <= slot_cap;
    callers guard with max(counts) and reroute to the full-cap kernel
    (graybox peaks at 6 of 8).  Mutually exclusive with ``n_compact``.

    ``expand=False``: skip the lane expansion and return the SMALL table
    ``[n_fields, HH, C*HL, KP]`` int32 (KP = hash_width rounded up to a
    sublane multiple, zero-padded) for the kernel-side MXU expansion
    (``trace_keys_pallas(kernel_expand=True)``).  The compiled-program
    census put the expanded table at 7.3 MB/frame of HBM write plus the
    same read back in the kernel — the largest single buffer in the
    batched program; expanding inside the kernel deletes both.  Field
    values are identical (the XLA path's f32 matmul was exact, so the
    pass-through changes nothing).
    """
    cfg = config
    HW, HH, HL = cfg.hash_width, cfg.hash_height, cfg.hash_length
    cap = cfg.bin_capacity
    NC = HL * cap                     # candidates per pixel column

    # (HH, HL, cap, HW): candidate entity for (biny, binz, slot, binx).
    # The bin tables' flat-index layout is (x*HH + y)*HL + z
    # (alternative.cpp:180-182), so the reorder is a pure transpose — a
    # gather by precomputed flat indices lowered ~10x slower on TPU.
    ent = jnp.transpose(bins_ent.reshape(HW, HH, HL, cap),
                        (1, 2, 0, 3))                         # (HH, HL, HW, cap)
    cnt = jnp.transpose(counts.reshape(HW, HH, HL), (1, 2, 0))
    valid = jnp.arange(cap)[None, None, None, :] < cnt[..., None]

    ent = jnp.moveaxis(ent, 3, 2)                             # (HH, HL, cap, HW)
    valid = jnp.moveaxis(valid, 3, 2)

    ent_s = jnp.where(valid, ent, 0)
    if ent_fields is not None:
        # Static per-entity table (entity_field_table): ONE gather per
        # frame replaces the per-candidate field arithmetic below.
        gf = ent_fields[ent_s]                    # (HH, HL, cap, HW, NF)
        if dyn_pos is not None:
            for d in range(dyn_pos.shape[0]):
                dv = jnp.stack(_candidate_fields(
                    dyn_pos[d], ext[d], sprite_id[d],
                    jnp.int32(d), d0, slope, field_pack))
                gf = jnp.where((ent_s == d)[..., None], dv, gf)
        stacked = jnp.moveaxis(gf, -1, 0)         # (F, HH, HL, cap, HW)
        # Invalid slots must read as valid=0 through row 0 (the
        # zero-padded lanes of the selection matmul already do).
        stacked = stacked.at[0].set(
            jnp.where(valid, stacked[0], 0))
    else:
        p = pos[ent_s]                                        # (..., 3)
        if dyn_pos is not None:
            for d in range(dyn_pos.shape[0]):
                p = jnp.where((ent_s == d)[..., None], dyn_pos[d], p)
        e = ext[ent_s]
        sid = sprite_id[ent_s]
        fields = _candidate_fields(p, e, sid, ent_s, d0, slope, field_pack)
        # Invalid slots must read as valid=0 through row 0 (the
        # zero-padded lanes of the selection matmul already do).
        fields[0] = jnp.where(valid, fields[0], 0)
        stacked = jnp.stack(fields)               # (F, HH, HL, cap, HW)
    F = stacked.shape[0]
    if slot_cap is not None and slot_cap < cap:
        assert n_compact is None
        stacked = stacked[:, :, :, :slot_cap]
        NC = HL * slot_cap
    stacked = stacked.reshape(F, HH, NC, HW)
    if n_compact is not None:
        NCc = n_compact
        # Exclusive per-column prefix of bin counts along z: live entries
        # of bin b sit at compact positions [pre[b], pre[b+1]).
        pre = jnp.concatenate(
            [jnp.zeros((HH, 1, HW), jnp.int32),
             jnp.cumsum(cnt, axis=1, dtype=jnp.int32)], axis=1)
        p = jnp.broadcast_to(
            jnp.arange(NCc, dtype=jnp.int32)[None, :, None], (HH, NCc, HW))
        b_of = jnp.zeros((HH, NCc, HW), jnp.int32)
        for b in range(1, HL):
            b_of = jnp.where(p >= pre[:, b:b + 1, :], b, b_of)
        s_of = p - jnp.take_along_axis(pre, b_of, axis=1)
        valid_p = p < pre[:, HL:HL + 1, :]
        src = jnp.where(valid_p, b_of * cap + s_of, 0)
        stacked = jnp.take_along_axis(
            stacked, jnp.broadcast_to(src[None], (F, HH, NCc, HW)), axis=2)
        if field_pack:
            # Row 0 is the packed small-field row; gathered entries carry
            # their own valid bit (live sources), padding clears to 0.
            stacked = stacked.at[0].set(jnp.where(valid_p, stacked[0], 0))
        else:
            stacked = stacked.at[0].set(valid_p.astype(jnp.int32))
        stacked = jnp.concatenate(
            [stacked, jnp.where(valid_p, b_of, 0)[None]], axis=0)
        F = F + 1
    # Expand bin_x -> lanes and pad to w_pad.  Expressed as an MXU matmul
    # against a 0/1 lane-selection matrix: a jnp.repeat along lanes lowers
    # to a lane gather, which is an order of magnitude slower than the
    # systolic array at these shapes.  Field values are small ints (< 2^24),
    # so the f32 contraction is exact.  Padding lanes get valid=0.
    assert pos.shape[0] < (1 << 24), \
        "entity ids must stay f32-exact for the MXU lane expansion"
    if not expand:
        KP = -(-HW // 8) * 8
        return jnp.pad(stacked, ((0, 0),) * 3 + ((0, KP - HW),))
    sel = lane_select_matrix(cfg, w_pad)
    NCt = stacked.shape[2]
    if _texp_upto == "small":
        return stacked
    flat = stacked.reshape(F * HH * NCt, HW).astype(jnp.float32)
    if _texp_upto == "mm":
        return jax.lax.dot_general(
            flat, sel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    # precision=HIGHEST is load-bearing: the TPU default lowers f32
    # matmuls to one bf16 pass, silently truncating any field needing
    # more than 8 mantissa bits (entity ids!).  Measured cost: nil (K=12).
    lanes = jax.lax.dot_general(
        flat, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return lanes.astype(jnp.int32).reshape(F, HH, NCt, w_pad)


@functools.lru_cache(maxsize=None)
def _lane_select_np(hash_width: int, bin_size: int, view_width: int,
                    w_pad: int):
    sel = np.zeros((hash_width, w_pad), np.float32)
    lanes = np.arange(view_width)
    sel[np.minimum(lanes // bin_size, hash_width - 1), lanes] = 1.0
    return sel


def lane_select_matrix(config: RenderConfig, w_pad: int) -> jax.Array:
    """(hash_width, w_pad) 0/1 f32: column l selects bin_x = l // bin_size
    (zero beyond the view width, so padding lanes read as invalid)."""
    return jnp.asarray(_lane_select_np(config.hash_width, config.bin_size,
                                       config.view_width, w_pad))


def _trace_kernel(row0_ref, tab_ref, *refs, config,
                  rows_per_block: int, n_cands: int, nc2: int, w_pad: int,
                  segments=None, compact: bool = False,
                  packed_picks: bool = False,
                  packed_fields: bool = False, frames: int = 1,
                  kernel_expand: bool = False, pick2: bool = False):
    """Row-block body.  Blocks carry a leading frame dim of ``frames``: the
    grid is (frame_blocks, row_blocks, lane_tiles), so one launch traces a
    whole animation batch and each grid step traces ``frames`` frames'
    blocks (frames=1 for single-frame callers; > 1 amortises the
    per-grid-step fixed cost — see shadow_pallas.FRAMES_PER_BLOCK).

    ``compact``: the candidate rows are column-compacted live entries (an
    extra bin-z field rides the table); per-bin maxima and empty flags use
    bin-z masks instead of structured (bin, slot) slices.

    ``packed_picks``: winner attributes resolve as THREE masked maxima of
    bit-packed fields instead of six — A = (ent*8 + sid)*32 + sdep,
    B = (pz + 2^14)*2^15 + (rowbase + 2^14), C = posx — the epilogue
    unpacks.  Callers must prove the bounds host-side (ent < 2^18,
    sid < 8, sdep < 32, |pz| and |rowbase| < 2^14); scenes outside them
    use the unpacked kernel.

    ``kernel_expand``: the table window is the SMALL (n_f, 1, NC, KP)
    pre-expansion table plus a (KP, wt) 0/1 lane-selection operand; the
    lane expansion runs on the MXU in VMEM (exactly the XLA expansion's
    contraction, HIGHEST precision) — ~22 MB/frame of HBM table traffic
    (write + cast round-trip + kernel read) disappears."""
    # w_pad here is the LANE-TILE width (the full padded width divided by
    # the lane-tile grid axis); lane_i carries the global lane index.
    if kernel_expand:
        sel_ref, refs = refs[0], refs[1:]
    else:
        sel_ref = None
    wt0 = pl.program_id(2) * w_pad
    lane_i = (jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 1)
              + wt0)
    cand_i = jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 0)
    for fb in range(frames):
        _trace_frame_body(fb, lane_i, cand_i, row0_ref, tab_ref, refs,
                          config=config, rows_per_block=rows_per_block,
                          n_cands=n_cands, nc2=nc2, segments=segments,
                          compact=compact, packed_picks=packed_picks,
                          packed_fields=packed_fields, sel_ref=sel_ref,
                          pick2=pick2)


def _trace_frame_body(fb, lane_i, cand_i, row0_ref, tab_ref, refs, *,
                      config, rows_per_block: int, n_cands: int, nc2: int,
                      segments, compact: bool, packed_picks: bool,
                      packed_fields: bool, sel_ref=None,
                      pick2: bool = False):
    """One frame's block of the trace kernel body (``fb`` indexes the
    frame within the grid step's frame block)."""
    if packed_picks and pick2:
        # Two-pick mode (see trace_keys_pallas): sdep drops out of A
        # (consumers re-derive it from sid + row with the static depth
        # decomposition) and posx packs into A's low bits — one output
        # window fewer and no per-row sdep work in the resolve.
        (a_ref, b_ref, mkey_scr, empty_scr, keys_scr) = refs
        c_ref = None
    elif packed_picks:
        # Packed mode has no separate keys output: the A/B/C picks are
        # masked to KEY_MIN on miss rows, so hit == (B >= 0) downstream
        # (valid B is nonnegative under the host-proved |pz|/|rowbase|
        # bounds) — one output window fewer.
        (a_ref, b_ref, c_ref,
         mkey_scr, empty_scr, keys_scr) = refs
    else:
        (key_ref, ent_ref, sdep_ref, pz_ref, rb_ref, px_ref, sid_ref,
         mkey_scr, empty_scr, keys_scr) = refs
    if _ablate == "empty":
        # Pure floor bound: same grid + operand windows, no kernel work.
        outs = (((a_ref, b_ref) if pick2 else (a_ref, b_ref, c_ref))
                if packed_picks
                else (key_ref, ent_ref, sdep_ref, pz_ref, rb_ref, px_ref,
                      sid_ref))
        for ref in outs:
            ref[fb] = jnp.full(ref.shape[1:], jnp.int32(KEY_MIN), jnp.int32)
        return
    cfg = config
    HL = cfg.hash_length
    # Structured layouts carry n_cands = HL * cap rows (cap may be a
    # slot-compacted bin capacity); compact layouts use bin-z masks.
    cap = n_cands // HL
    H = cfg.view_height
    R = rows_per_block

    if sel_ref is None:
        def trow(i):
            return tab_ref[fb, i, 0]
    else:
        # Kernel-side lane expansion: ONE MXU contraction expands every
        # field row of the small (n_f*NC, KP) table to (n_f*NC, wt) —
        # the same 0/1 selection matmul the XLA path ran per frame, at
        # HIGHEST precision (field values carry up to 24 mantissa bits;
        # the default single bf16 pass would truncate them).  The i32 ->
        # f32 -> i32 round trip is exact for |v| < 2^24 (the same bound
        # the XLA expansion already asserts).
        n_f = tab_ref.shape[1]
        flat = (tab_ref[fb].reshape(n_f * n_cands, tab_ref.shape[-1])
                .astype(jnp.float32))
        exp = jax.lax.dot_general(
            flat, sel_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        tabv = exp.astype(jnp.int32)              # (n_f*NC, wt)

        def trow(i):
            return tabv[i * n_cands:(i + 1) * n_cands]
    if packed_fields:
        # Two packed rows (see _expand_tables field_pack): unpack once per
        # block — a handful of vector shifts amortised over all phases.
        pa = trow(0)
        pb = trow(1)
        valid = pa & 1
        fsid = (pa >> 1) & 7
        f6 = (pa >> 4) & 31
        f7 = (pa >> 9) & 3
        f5 = (pa >> 11) & 63
        f0 = (pb & 4095) - 2048
        f1 = (pb >> 12) - 2048
        f2 = trow(2)
        f3 = trow(3)
        f4 = trow(4)
        fent = trow(5)
        fpz = trow(6)
        fbinz = trow(7) if compact else None
    else:
        valid = trow(0)
        f0 = trow(1)
        f1 = trow(2)
        f2 = trow(3)
        f3 = trow(4)
        f4 = trow(5)
        f5 = trow(6)
        f6 = trow(7)
        f7 = trow(8)
        fent = trow(9)
        fpz = trow(10)
        fsid = trow(11)
        fbinz = trow(12) if compact else None

    # Per-bin empty masks (jr-independent): row b holds bin b's emptiness.
    for b in range(HL):
        if compact:
            any_valid = jnp.max(
                jnp.where(fbinz == b, valid, 0), axis=0, keepdims=True)
        else:
            any_valid = jnp.max(valid[b * cap:(b + 1) * cap], axis=0,
                                keepdims=True)
        empty_scr[b:b + 1] = 1 - any_valid

    block = pl.program_id(1)
    j0 = row0_ref[0] + block * R

    # Row-independent pieces of the hit test and key, hoisted out of the
    # per-row phases (the lane span and candidate tie-break don't change
    # with jr).
    lane_ok = (valid > 0) & (lane_i >= f0) & (lane_i < f1)
    tie = nc2 - 1 - cand_i

    # Rect-mode depth (depth_rects, 7-tuples) clips the texel column once
    # per block (the column doesn't change with jr).
    rect_depth = segments is not None and len(segments[0]) == 7
    if rect_depth:
        colc = jnp.clip(lane_i - f0, 0, cfg.sprite_width - 1)

    def cand_sdep(jr):
        """Per-candidate sprite-depth term for screen row j0+jr."""
        world_j = H - (j0 + jr)
        row = f3 - world_j
        if segments is None:
            return jnp.maximum(0, f6 - f7 * row)
        if rect_depth:
            # Arbitrary depth maps: ramp-rect select chain on CLIPPED
            # texel coordinates — reproduces the reference's per-texel
            # gather (alternative.cpp:336-341; ops/trace.py:110-113)
            # including its clamp semantics, with no gather.
            rowc = jnp.clip(row, 0, cfg.sprite_height - 1)
            sdep = jnp.zeros_like(row)
            for (s, r0, r1, c0, c1, d0k, slopek) in segments:
                inseg = (fsid == s) & (rowc >= r0) & (rowc < r1)
                if not (c0 == 0 and c1 == cfg.sprite_width):
                    inseg &= (colc >= c0) & (colc < c1)
                sdep = jnp.where(inseg, d0k - slopek * (rowc - r0), sdep)
            return sdep
        # Piecewise-ramp depth: select chain over (sprite, row-range)
        # segments — no gather (alternative.cpp:336-341's depth fetch).
        sdep = jnp.zeros_like(row)
        for (s, r0, r1, d0k, slopek) in segments:
            inseg = (fsid == s) & (row >= r0) & (row < r1)
            sdep = jnp.where(inseg, d0k - slopek * (row - r0), sdep)
        return sdep

    def cand_keys(jr):
        """Per-candidate keys (and sdep) for screen row j0+jr."""
        world_j = H - (j0 + jr)
        row = f3 - world_j
        hit = lane_ok & (world_j > f2) & (world_j <= f3)
        sdep = cand_sdep(jr)
        depth = f4 + jnp.minimum(0, f5 - row) - sdep
        key = jnp.where(hit, depth * nc2 + tie, jnp.int32(KEY_MIN))
        return key, sdep

    # Phase 1: per-row candidate keys -> per-(bin, jr) maxima.  Keys are
    # stashed in VMEM scratch so the winner resolve (phase 3) reads them
    # back instead of recomputing (~40% of the kernel's vector work); the
    # sprite-depth term is recomputed there instead (2 vector ops for ramp
    # atlases) — halving the stash is what lets whole-bin-row blocks
    # (rows_per_block=40) fit VMEM.
    #
    # Ramp atlases compute the key INCREMENTALLY across the unrolled rows:
    # key(hit) = f4*nc2 + tie + min(0, (f5-row)*nc2) - max(0, (f6-f7*row)
    # *nc2), and row advances by exactly 1 per jr — so the two inner
    # affine terms ride running carries (en -= nc2, dn -= f7*nc2) instead
    # of fresh multiply chains: 11 vector ops per row instead of 14, exact
    # (integer adds), identical keys.
    inc = INCREMENTAL_KEYS and segments is None
    if inc:
        key0 = f4 * nc2 + tie                     # row-independent part
        row0v = f3 - (H - j0)                     # row at jr = 0
        f7n = f7 * nc2
        en = (f5 - row0v) * nc2
        dn = (f6 - f7 * row0v) * nc2
        # Row-range hit test as ONE unsigned compare: f2 < world_j <= f3
        # iff 0 <= row < f3 - f2 with row = f3 - world_j, and the sprite
        # row span f3 - f2 = ey + ez >= 0 — so u32(row) < u32(span) (a
        # negative row wraps above any valid span).  ``row`` rides the
        # same +1-per-jr carry the key terms do.
        rowv = row0v
        hspan = (f3 - f2).astype(jnp.uint32)
    for jr in range(R):
        if inc:
            hit = lane_ok & (rowv.astype(jnp.uint32) < hspan)
            key = jnp.where(
                hit, key0 + jnp.minimum(0, en) - jnp.maximum(0, dn),
                jnp.int32(KEY_MIN))
            rowv = rowv + 1
            en = en - nc2
            dn = dn - f7n
        else:
            key, _ = cand_keys(jr)
        keys_scr[jr * n_cands:(jr + 1) * n_cands] = key
        if _ablate == "nobinmax":
            continue
        for b in range(HL):
            if compact:
                mb = jnp.max(jnp.where(fbinz == b, key, jnp.int32(KEY_MIN)),
                             axis=0, keepdims=True)
            else:
                mb = jnp.max(key[b * cap:(b + 1) * cap], axis=0,
                             keepdims=True)
            mkey_scr[b * R + jr:b * R + jr + 1] = mb

    # Phase 2: early-exit scan over bins (quirk Q5), all jr rows at once.
    wt = lane_i.shape[1]               # this grid step's lane-tile width
    total = jnp.full((R, wt), jnp.int32(KEY_MIN), jnp.int32)
    counter = jnp.zeros((R, wt), jnp.int32)
    for b in range(HL):
        m = mkey_scr[b * R:(b + 1) * R]
        if cfg.early_exit and _ablate != "noee":
            empty = empty_scr[b:b + 1] > 0
            use = counter < 2
            has = use & (m > total)
            total = jnp.where(has, m, total)
            counter = jnp.where(
                use, jnp.where(empty, 0, counter + has.astype(jnp.int32)),
                counter)
        else:
            total = jnp.maximum(total, m)

    if not packed_picks:
        key_ref[fb] = total

    # Phase 3: winner-field resolve (keys are unique, so a masked max over
    # candidates recovers each winner attribute) — saves the epilogue a
    # per-pixel gather per attribute.
    if _ablate == "nop3":
        for jr in range(R):
            row = total[jr:jr + 1, :]
            if packed_picks:
                a_ref[fb, jr:jr + 1, :] = row
                b_ref[fb, jr:jr + 1, :] = row
                if not pick2:
                    c_ref[fb, jr:jr + 1, :] = row
            else:
                for ref in (ent_ref, sdep_ref, pz_ref, rb_ref, px_ref,
                            sid_ref):
                    ref[fb, jr:jr + 1, :] = row
        return
    if packed_picks:
        if pick2:
            # Both picks row-independent: A = (ent*8 + sid)*1024 +
            # (posx + 512) — sdep is re-derived downstream from sid + row
            # via the static depth decomposition, so its per-row resolve
            # work (and the third output) disappears.
            base_a = (fent * 8 + fsid) * 1024 + (f0 + 512)
        else:
            base_a = (fent * 8 + fsid) * 32              # + sdep per row
        base_b = (fpz + 16384) * 32768 + (f3 + 16384)    # row-independent
    need_sdep = not (packed_picks and pick2)
    if inc and need_sdep:
        dd = f6 - f7 * row0v                 # running f6 - f7*row carry
    for jr in range(R):
        key = keys_scr[jr * n_cands:(jr + 1) * n_cands]
        if not need_sdep:
            sdep = None
        elif inc:
            sdep = jnp.maximum(0, dd)
            dd = dd - f7
        else:
            sdep = cand_sdep(jr)
        match = key == total[jr:jr + 1, :]      # at most one candidate true

        def pick(field):
            return jnp.max(jnp.where(match, field, jnp.int32(KEY_MIN)),
                           axis=0, keepdims=True)

        if packed_picks:
            # Miss rows (total == KEY_MIN) match EVERY stashed KEY_MIN
            # key, so the raw picks would carry max-over-all-candidates
            # garbage there; masking them to KEY_MIN lets the decoders
            # (and the winner-input shadow kernel) recover hit = B >= 0
            # without a separate keys output.
            hitrow = total[jr:jr + 1, :] > jnp.int32(KEY_MIN // 2)
            kmin = jnp.int32(KEY_MIN)
            a_val = base_a if pick2 else base_a + sdep
            a_ref[fb, jr:jr + 1, :] = jnp.where(hitrow, pick(a_val), kmin)
            b_ref[fb, jr:jr + 1, :] = jnp.where(hitrow, pick(base_b), kmin)
            if not pick2:
                c_ref[fb, jr:jr + 1, :] = jnp.where(hitrow, pick(f0), kmin)
        else:
            ent_ref[fb, jr:jr + 1, :] = pick(fent)
            sdep_ref[fb, jr:jr + 1, :] = pick(sdep)
            pz_ref[fb, jr:jr + 1, :] = pick(fpz)
            rb_ref[fb, jr:jr + 1, :] = pick(f3)
            px_ref[fb, jr:jr + 1, :] = pick(f0)
            sid_ref[fb, jr:jr + 1, :] = pick(fsid)


def trace_keys_pallas(tables: jax.Array, config: RenderConfig,
                      rows_per_block: int = 8, w_pad: int | None = None,
                      segments=None, row0=None, n_rows: int | None = None,
                      packed_picks: bool = False,
                      max_lane_tile: int = 1024,
                      frames_per_block: int | None = None,
                      kernel_expand: bool = False,
                      pick2: bool = False):
    """Run the kernel; returns per-pixel winning keys (n_rows, w_pad) int32.

    ``pick2`` (with ``packed_picks``): resolve winners as TWO packed
    maxima instead of three — A = (ent*8 + sid)*1024 + (posx + 512),
    B unchanged — dropping the per-row sdep resolve work and the third
    output buffer; decoders re-derive sdep from sid + row via the scene's
    static depth decomposition.  Extra host-proved bounds (``pick2_ok``):
    posx + 512 in [0, 1024) for any binned entity.

    ``tables`` may carry a leading frame axis (F, n_fields, HH, NC, w_pad):
    the grid becomes (F, row_blocks) and every output gains the frame axis —
    one launch traces a whole animation batch with zero per-frame dispatch
    overhead.  A 4D ``tables`` is the single-frame case (F=1, squeezed).

    ``row0``/``n_rows`` select a screen-row window [row0, row0+n_rows) —
    the shard_map row-sharding hook (each shard renders its own window
    with the unchanged kernel).  ``row0`` is traced (it comes from
    ``jax.lax.axis_index``) and rides scalar prefetch so the per-block
    table slice can be indexed by absolute bin row; it must be a multiple
    of ``rows_per_block`` so row blocks stay inside one bin row.

    Wide frames ride a lane-tile grid axis: every phase of the kernel is
    per-lane independent, so blocks beyond ``max_lane_tile`` lanes split
    into 512-lane tiles (VMEM scratch and table slices scale with the
    tile, not the frame width — a 4096-wide supersampled frame would
    otherwise blow the ~16 MB VMEM budget).

    ``kernel_expand``: ``tables`` is the SMALL pre-expansion table
    ``(F, n_fields, HH, NC, KP)`` (``_expand_tables(expand=False)``); the
    kernel runs the lane-expansion matmul itself against a (KP, w_pad)
    selection operand — see ``_trace_kernel``.
    """
    cfg = config
    batched = tables.ndim == 5
    if not batched:
        tables = tables[None]
    F = tables.shape[0]
    # Field layouts by row count: 12 = unpacked, 13 = unpacked + bin-z
    # (column compaction), 7 = field-packed, 8 = field-packed + bin-z.
    n_f = tables.shape[1]
    packed_fields = n_f <= 8
    compact = n_f in (13, 8)
    if n_rows is None:
        n_rows = cfg.view_height
    if row0 is None:
        row0 = 0
    row0 = jnp.asarray(row0, jnp.int32).reshape(1)
    if w_pad is None:
        w_pad = -(-cfg.view_width // 128) * 128
    wt = w_pad if w_pad <= max_lane_tile else min(512, max_lane_tile)
    while w_pad % wt:
        wt -= 128
    assert wt >= 128 and w_pad % wt == 0
    WT = w_pad // wt
    n_cands = tables.shape[3]
    nc2 = 1
    while nc2 < n_cands:
        nc2 *= 2
    R = rows_per_block
    assert n_rows % R == 0, "row window must divide by rows_per_block"
    bs = cfg.bin_size
    assert bs % R == 0, "rows_per_block must divide bin_size"

    # Frames per grid step (see shadow_pallas.FRAMES_PER_BLOCK): the
    # per-step fixed cost amortises over FB frames' blocks.  VMEM bound:
    # double-buffered table + output windows scale with FB; the keys stash
    # does not (frames run sequentially through it).
    n_out = (2 if pick2 else 3) if packed_picks else 7
    # VMEM window bytes per step: the small table lane-pads KP -> 128.
    # NOTE (ADVICE r3): this budget assumes FB=1 (the measured default —
    # TRACE_FRAMES_PER_BLOCK pins it).  With kernel_expand the kernel body
    # additionally materialises expansion temporaries — flat (n_f*NC, KP)
    # f32 plus exp/tabv (n_f*NC, wt) f32+i32 (~2.6-5 MB at full capacity)
    # and the (KP, wt) sel window — that this formula does NOT count; add
    # them before ever raising FB or growing shapes toward the ~16 MB
    # scoped-vmem edge.
    tab_w = 128 if kernel_expand else wt
    step_bytes = 2 * 4 * (tables.shape[1] * n_cands * tab_w
                          + (n_out + 1) * R * wt)
    stash_bytes = 4 * wt * (R * n_cands + cfg.hash_length * (R + 1))
    FB = frames_per_block
    if FB is None:
        # 10 MB budget of the 16 MB scoped-vmem limit: Mosaic's spill /
        # liveness overhead on this kernel measured several MB (the
        # direct-keys variant of the full-capacity fallback OOM'd at
        # ~18 MB with ~8.5 MB of accounted windows).
        FB = max(1, min(TRACE_FRAMES_PER_BLOCK,
                        ((10 << 20) - stash_bytes) // step_bytes))
        while F % FB:
            FB -= 1
    assert F % FB == 0, "frames_per_block must divide the frame count"

    kernel = functools.partial(_trace_kernel, config=cfg,
                               rows_per_block=R, n_cands=n_cands, nc2=nc2,
                               w_pad=wt, segments=segments,
                               compact=compact, packed_picks=packed_picks,
                               packed_fields=packed_fields, frames=FB,
                               kernel_expand=kernel_expand, pick2=pick2)
    # Interpreter mode on non-TPU backends (CPU tests validate the kernel
    # logic; compiled Mosaic runs on real TPUs).
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = jax.ShapeDtypeStruct((F, n_rows, w_pad), jnp.int32)
    spec = pl.BlockSpec((FB, R, wt), lambda f, i, w, *_: (f, i, w),
                        memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(
        (FB, tables.shape[1], 1, n_cands,
         tables.shape[4] if kernel_expand else wt),
        lambda f, i, w, row0_ref: (f, 0, (row0_ref[0] + i * R) // bs,
                                   0, 0 if kernel_expand else w),
        memory_space=pltpu.VMEM)]
    operands = [tables]
    if kernel_expand:
        KP = tables.shape[4]
        selm = lane_select_matrix(cfg, w_pad)
        selm = jnp.pad(selm, ((0, KP - selm.shape[0]), (0, 0)))
        in_specs.append(pl.BlockSpec((KP, wt), lambda f, i, w, *_: (0, w),
                                     memory_space=pltpu.VMEM))
        operands.append(selm)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # row0
        grid=(F // FB, n_rows // R, WT),
        in_specs=in_specs,
        out_specs=(spec,) * n_out,
        scratch_shapes=[
            pltpu.VMEM((cfg.hash_length * R, wt), jnp.int32),
            pltpu.VMEM((cfg.hash_length, wt), jnp.int32),
            pltpu.VMEM((R * n_cands, wt), jnp.int32),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(out,) * n_out,
    )(row0, *operands)
    if not batched:
        outs = tuple(o[0] for o in outs)
    return outs


def field_pack_ok(scene, config: RenderConfig) -> bool:
    """Host-side range proof for ``_expand_tables(field_pack=True)``.

    packa needs sid < 8, 0 <= d0 < 32, 0 <= slope < 4, ey < 64; packb
    needs biased f0/f1 in [0, 4096) — binned entities have
    posx in (-ext_x, view_width) (the frustum cull,
    alternative.cpp:212-219), so view_width + max ext_x <= 2047 suffices
    for any reachable (incl. per-frame dynamic) position.
    """
    ext = np.asarray(scene.ext)
    ex = int(ext[:, 0].max())
    ey = int(ext[:, 1].max())
    if not (scene.atlas.color.shape[0] <= 8 and ey < 64
            and ex <= 2047 and config.view_width + ex <= 2047):
        return False
    params = ramp_depth_params(np.asarray(scene.atlas.depth))
    if params is None:
        return True       # segments path: d0/slope rows carry zeros
    d0, slope = (np.asarray(v) for v in params)
    return bool((d0 >= 0).all() and (d0 < 32).all()
                and (slope >= 0).all() and (slope < 4).all())


def _resolve_depth_params(atlas_color, depth_params, segments):
    """Normalise the (depth_params, segments) pair: single-ramp params win
    when present (cheaper than the select chain)."""
    assert depth_params is not None or segments is not None
    if depth_params is not None:
        d0, slope = depth_params
        segments = None   # single-ramp arithmetic is cheaper than selects
    else:
        S = atlas_color.shape[0]
        d0 = np.zeros(S, np.int32)
        slope = np.zeros(S, np.int32)
    return jnp.asarray(d0), jnp.asarray(slope), segments


def trace_pixels_pallas(pos, ext, sprite_id, atlas_color, atlas_depth,
                        atlas_normal, palette, bins_ent, counts,
                        config: RenderConfig,
                        depth_params, bands=None,
                        rects=None, segments=None, row0=None,
                        n_rows: int | None = None,
                        packed_picks: bool = False,
                        field_pack: bool = False,
                        kernel_expand: bool = False) -> GBufferArrays:
    """Drop-in replacement for ops.trace.trace_pixels on atlases whose depth
    maps are ramps or piecewise ramps (any column-constant map).

    ``depth_params``: (d0, slope) arrays from ``ramp_depth_params`` — or
    None when ``segments`` (from ``depth_segments``) drives the in-kernel
    depth select chain instead.
    ``bands``: host-side result of ``normal_bands`` (or None) — two-band
    atlases resolve normals with select chains instead of gathers.
    ``rects``: host-side result of ``color_rects`` (or None) — blocky color
    maps resolve palette indices with select chains instead of a gather.
    """
    cfg = config
    if n_rows is None:
        n_rows = cfg.view_height
    d0, slope, segments = _resolve_depth_params(atlas_color, depth_params,
                                                segments)
    w_pad = -(-cfg.view_width // 128) * 128
    tables = _expand_tables(pos, ext, sprite_id, d0, slope, bins_ent,
                            counts, cfg, w_pad, field_pack=field_pack,
                            expand=not kernel_expand)
    winners = trace_keys_pallas(tables, cfg, segments=segments,
                                row0=row0, n_rows=n_rows,
                                packed_picks=packed_picks,
                                kernel_expand=kernel_expand)
    return gbuffer_from_winners(winners, atlas_color, atlas_normal, palette,
                                cfg, bands, rects, row0, n_rows)


def static_sdep(depth_static, sid, row, col, config=None,
                sprite_hw: tuple[int, int] | None = None):
    """Sprite depth from a winner's (sid, row[, col]) via the scene's
    STATIC depth decomposition — the pick2 decoders' (and the
    winner-direct shadow kernel's) replacement for a kernel-resolved
    sdep.  ``depth_static``: ("ramp", d0s, slopes) with per-sprite python
    ints — the kernel's ``max(0, d0 - slope*row)`` formula — or
    ("segments", segs) with 5-tuple row segments (raw row) or 7-tuple
    ramp rects (CLIPPED row/col, the gather semantics).  Integer
    arithmetic: bit-identical to the kernel's per-candidate sdep for the
    winner."""
    if sprite_hw is None:
        sprite_hw = (config.sprite_height, config.sprite_width)
    sh, sw = sprite_hw
    kind = depth_static[0]
    if kind == "ramp":
        d0s, slopes = depth_static[1], depth_static[2]
        if len(d0s) == 1:
            return jnp.maximum(0, jnp.int32(d0s[0])
                               - jnp.int32(slopes[0]) * row)
        sdep = jnp.zeros_like(row)
        for k in range(len(d0s)):
            v = jnp.maximum(0, jnp.int32(d0s[k])
                            - jnp.int32(slopes[k]) * row)
            sdep = jnp.where(sid == k, v, sdep)
        return sdep
    segs = depth_static[1]
    sdep = jnp.zeros_like(row)
    if len(segs[0]) == 7:
        rowc = jnp.clip(row, 0, sh - 1)
        colc = jnp.clip(col, 0, sw - 1)
        for (s, r0, r1, c0, c1, d0k, slopek) in segs:
            inseg = (sid == s) & (rowc >= r0) & (rowc < r1)
            if not (c0 == 0 and c1 == sw):
                inseg &= (colc >= c0) & (colc < c1)
            sdep = jnp.where(inseg, d0k - slopek * (rowc - r0), sdep)
        return sdep
    for (s, r0, r1, d0k, slopek) in segs:
        inseg = (sid == s) & (row >= r0) & (row < r1)
        sdep = jnp.where(inseg, d0k - slopek * (row - r0), sdep)
    return sdep


def pick2_ok(scene, config: RenderConfig) -> bool:
    """Host-side range proof for the two-pick winner resolve.

    On top of the packed-pick bounds (``DeferredRenderer._packed_bounds_ok``)
    A packs posx + 512 into 10 low bits: binned winners have
    ``posx in (-ext_x, view_width)`` (the frustum cull,
    alternative.cpp:212-219), so ``ext_x <= 512`` and
    ``view_width + 512 <= 1023`` suffice for any reachable position."""
    ext = np.asarray(scene.ext)
    return bool(int(ext[:, 0].max()) <= 512
                and config.view_width + 512 <= 1023)


def gbuffer_from_winners(winners, atlas_color, atlas_normal, palette,
                         config: RenderConfig, bands=None, rects=None,
                         row0=None, n_rows: int | None = None,
                         width: int | None = None,
                         depth_static=None) -> GBufferArrays:
    """Decode the kernel's per-pixel winner fields into a G-buffer.

    Pure elementwise XLA — batched callers ``jax.vmap`` this over the frame
    axis of the kernel outputs.

    ``width``: lane count to decode (default ``view_width``).  The batched
    pipeline passes the kernel's padded width so the whole frame stays
    lane-padded end-to-end — pad lanes decode as background pixels (their
    keys are KEY_MIN: the expansion tables zero validity beyond the view
    width), and skipping the narrowing here deletes eight per-field pad
    copies on the shadow kernel's inputs downstream.
    """
    cfg = config
    H, W = cfg.view_height, cfg.view_width
    if n_rows is None:
        n_rows = H
    if width is None:
        width = W
    if len(winners) == 2:
        # Two-pick kernel output: A = (ent*8 + sid)*1024 + (posx + 512),
        # B as in the 3-pick mode; sdep re-derives from sid + row below
        # via the static depth decomposition (bit-identical to the
        # kernel's per-candidate sdep for the winner).
        assert depth_static is not None, "pick2 decode needs depth_static"
        a, b = (x[:, :width] for x in winners)
        hit = b >= 0
        ent = a >> 13
        sid = (a >> 10) & 7
        posx = (a & 1023) - 512
        sdep = None
        pz = (b >> 15) - 16384
        rowbase = (b & 32767) - 16384
    elif len(winners) == 3:
        # Packed-picks kernel output: unpack A/B/C (see _trace_kernel).
        # Misses carry KEY_MIN in every field (masked in-kernel), so
        # hit == (B >= 0): valid B = (pz+2^14)*2^15 + (rowbase+2^14) is
        # nonnegative under the host-proved packed bounds.
        a, b, posx = (x[:, :width] for x in winners)
        hit = b >= 0
        ent = a >> 8
        sid = (a >> 5) & 7
        sdep = a & 31
        pz = (b >> 15) - 16384
        rowbase = (b & 32767) - 16384
    else:
        keys, ent, sdep, pz, rowbase, posx, sid = (
            x[:, :width] for x in winners)
        hit = keys > KEY_MIN // 2

    # Winner attributes come straight from the kernel; only the per-texel
    # color/normal maps still need gathers.
    j = jnp.arange(n_rows, dtype=jnp.int32)[:, None]
    if row0 is not None:
        j = j + jnp.asarray(row0, jnp.int32)
    i = jnp.arange(width, dtype=jnp.int32)[None, :]
    world_j = jnp.int32(H) - j

    row = rowbase - world_j
    col = i - posx
    if sdep is None:
        sdep = static_sdep(depth_static, sid, row, col, cfg)
    texel = ((jnp.where(hit, sid, 0) * cfg.sprite_height
              + jnp.clip(row, 0, cfg.sprite_height - 1))
             * cfg.sprite_width + jnp.clip(col, 0, cfg.sprite_width - 1))
    if rects is not None:
        # Rect-decomposed color map: select chain, no per-pixel gather.
        cidx = jnp.zeros((n_rows, width), jnp.int32)
        for (s, r0, r1, c0, c1, value) in rects:
            in_rect = ((sid == s) & (row >= r0) & (row < r1)
                       & (col >= c0) & (col < c1))
            cidx = jnp.where(in_rect, value, cidx)
    else:
        cidx = atlas_color.reshape(-1)[texel]

    # Palette resolve as a select chain — palettes are tiny and selects beat
    # a per-pixel gather by ~1 ms/frame on TPU.
    bg = jnp.asarray(cfg.background, jnp.uint8)
    color = jnp.broadcast_to(bg, (n_rows, width, 4))
    for k in range(palette.shape[0]):
        color = jnp.where((hit & (cidx == k))[..., None], palette[k], color)

    if bands is not None and atlas_color.shape[0] <= 8:
        # Two-band normals via select chains: no per-pixel gathers.
        splits, tops, fronts = (np.asarray(b) for b in bands)
        S = splits.shape[0]
        normal = jnp.zeros((n_rows, width, 3), jnp.float32)
        for k in range(S):
            is_k = hit & (sid == k)
            top_band = (row < int(splits[k]))[..., None]
            nk = jnp.where(top_band, jnp.asarray(tops[k]),
                           jnp.asarray(fronts[k]))
            normal = jnp.where(is_k[..., None], nk, normal)
    else:
        normal = jnp.where(hit[..., None],
                           atlas_normal.reshape(-1, 3)[texel], 0.0)
    y = jnp.where(hit, rowbase - pz - row - sdep, 0)
    z = jnp.where(hit, pz + sdep, 0)
    entity = jnp.where(hit, ent, 0)
    return GBufferArrays(normal=normal, color=color, y=y, z=z,
                         entity_index=entity)


def winner_dot(winners, tl, bands, config: RenderConfig):
    """Lambert dot (``gbuf.normal · tl``) straight from the packed picks —
    the (h, w, 3) f32 normal buffer (a 2 MB/frame HBM materialisation in
    the round-4 census) never exists.

    Float-identical to ``normal[...,0]*tl[0] + normal[...,1]*tl[1] +
    normal[...,2]*tl[2]`` over the two-band select-chain normals of
    ``gbuffer_from_winners``: each (sprite, band) arm evaluates the SAME
    three-product left-to-right sum with that band's constant normal, and
    the select keys (hit, sid, row-band) are identical — so every pixel
    takes the same value through the same float ops.  Miss pixels (zero
    normals, quirk Q6) read constant 0.0 where the original computed
    ``(0*tl0 + 0*tl1) + 0*tl2``; the two differ only when every tl
    component is NaN (light exactly on the surface point, length == 0),
    and both then shade to the ambient factor through ``max(0, dot)`` and
    fail the ``dot > 0`` shadow-needed test — output-identical.

    ``winners``: 2- or 3-tuple of packed picks (see trace_keys_pallas).
    ``tl``: 3-tuple of (h, w) f32 towards-light components.  ``bands``:
    host-side ``normal_bands`` result (required).
    """
    cfg = config
    H = cfg.view_height
    a, b = winners[0], winners[1]
    hit = b >= 0
    sid = ((a >> 10) & 7) if len(winners) == 2 else ((a >> 5) & 7)
    rowbase = (b & 32767) - 16384
    j = jnp.arange(a.shape[0], dtype=jnp.int32)[:, None]
    row = rowbase - (jnp.int32(H) - j)
    splits, tops, fronts = (np.asarray(x) for x in bands)
    tl0, tl1, tl2 = tl
    dot = jnp.zeros(a.shape, jnp.float32)
    for k in range(splits.shape[0]):
        def arm(n):
            return (jnp.float32(n[0]) * tl0 + jnp.float32(n[1]) * tl1
                    + jnp.float32(n[2]) * tl2)

        nk = jnp.where((row < int(splits[k])), arm(tops[k]),
                       arm(fronts[k]))
        dot = jnp.where(hit & (sid == k), nk, dot)
    return dot


def trace_pixels_pallas_batched(pos, ext, sprite_id, atlas_color,
                                atlas_normal, palette, bins_ent, counts,
                                dyn_pos, config: RenderConfig, depth_params,
                                bands=None, rects=None, segments=None,
                                n_compact: int | None = None,
                                rows_per_block: int = 8,
                                packed_picks: bool = False,
                                slot_cap: int | None = None,
                                field_pack: bool = False,
                                wide: bool = False,
                                return_winners: bool = False,
                                kernel_expand: bool = False,
                                pick2: bool = False, depth_static=None):
    """Primary visibility for a whole animation batch in ONE kernel launch.

    ``pick2``/``depth_static``: two-pick winner resolve (see
    ``trace_keys_pallas``) — ``depth_static`` is the host-static depth
    decomposition (("ramp", d0s, slopes) or ("segments", segs)) the
    decoders re-derive sdep with.  Requires ``pick2_ok`` bounds.

    ``bins_ent`` (F, V, cap) / ``counts`` (F, V): per-frame bin tables (from
    a vmapped StaticBins.merge).  ``dyn_pos`` (F, D, 3): per-frame positions
    of the leading D dynamic entities (the reference's player is entity 0,
    alternative.cpp:643-660); the static ``pos`` array is shared across
    frames.  Returns a G-buffer whose arrays lead with the frame axis.

    The table expansion and epilogue are the single-frame functions under
    ``jax.vmap`` (one big XLA op per stage instead of F small ones); the
    kernel itself runs on a (F, row_blocks) grid.
    """
    cfg = config
    d0, slope, segments = _resolve_depth_params(atlas_color, depth_params,
                                                segments)
    w_pad = -(-cfg.view_width // 128) * 128

    # Static per-entity fields: built once per program, shared by every
    # frame's expansion (the vmap closes over it).
    ef = entity_field_table(pos, ext, sprite_id, d0, slope,
                            field_pack=field_pack)

    def winners_with(ncc, sc=None):
        def fn():
            tables = jax.vmap(
                lambda be, cnt, dp: _expand_tables(
                    pos, ext, sprite_id, d0, slope, be, cnt, cfg, w_pad,
                    dyn_pos=dp, n_compact=ncc, slot_cap=sc,
                    field_pack=field_pack, ent_fields=ef,
                    expand=not kernel_expand)
            )(bins_ent, counts, dyn_pos)
            return trace_keys_pallas(tables, cfg, segments=segments,
                                     rows_per_block=rows_per_block,
                                     packed_picks=packed_picks,
                                     kernel_expand=kernel_expand,
                                     pick2=pick2)
        return fn

    if n_compact is not None:
        # Column-live totals can exceed the compact bound on hostile
        # frames: reroute the batch to the uncompacted kernel (exact for
        # any scene) rather than silently dropping candidates.
        HH, HL = cfg.hash_height, cfg.hash_length
        col_live = counts.reshape(counts.shape[0], cfg.hash_width, HH,
                                  HL).sum(axis=3)
        ok = jnp.max(col_live) <= n_compact
        winners = jax.lax.cond(ok, winners_with(n_compact),
                               winners_with(None))
    elif slot_cap is not None and slot_cap < cfg.bin_capacity:
        # Slot compaction is exact iff no bin holds more entries than the
        # cap this batch; hostile frames reroute to the full-cap kernel.
        ok = jnp.max(counts) <= slot_cap
        winners = jax.lax.cond(ok, winners_with(None, slot_cap),
                               winners_with(None))
    else:
        winners = winners_with(None)()
    # ``wide``: decode all w_pad lanes so the downstream shadow stage needs
    # no per-field pad copies (pad lanes decode as background pixels).
    gbuf = jax.vmap(
        lambda w: gbuffer_from_winners(w, atlas_color, atlas_normal,
                                       palette, cfg, bands, rects,
                                       width=w_pad if wide else None,
                                       depth_static=depth_static)
    )(winners)
    if return_winners:
        # Winner-direct shadow mode: the shadow kernel re-derives its
        # per-pixel inputs from the masked packed picks in VMEM.
        return gbuf, winners
    return gbuf
