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


def _expand_tables(pos, ext, sprite_id, d0, slope, bins_ent, counts,
                   config: RenderConfig, w_pad: int):
    """Build lane-expanded candidate field tables.

    Returns a stacked array ``[n_fields, HH, C*HL, w_pad]`` int32 with field
    order: valid, f0 (posx), f1 (posx+ex), f2 (py+pz), f3 (py+ey+pz+ez),
    f4 (py-pz), f5 (ey), f6 (d0), f7 (slope), ent.
    """
    cfg = config
    HW, HH, HL = cfg.hash_width, cfg.hash_height, cfg.hash_length
    cap = cfg.bin_capacity
    NC = HL * cap                     # candidates per pixel column

    # (HH, HL, cap, HW): candidate entity for (biny, binz, slot, binx).
    flat = ((jnp.arange(HW)[None, :] * HH + jnp.arange(HH)[:, None])
            * HL)                     # (HH, HW) base
    flat = flat[:, None, :] + jnp.arange(HL)[None, :, None]   # (HH, HL, HW)
    ent = bins_ent[flat]                                      # (HH, HL, HW, cap)
    cnt = counts[flat]                                        # (HH, HL, HW)
    valid = jnp.arange(cap)[None, None, None, :] < cnt[..., None]

    ent = jnp.moveaxis(ent, 3, 2)                             # (HH, HL, cap, HW)
    valid = jnp.moveaxis(valid, 3, 2)

    ent_s = jnp.where(valid, ent, 0)
    p = pos[ent_s]                                            # (..., 3)
    e = ext[ent_s]
    sid = sprite_id[ent_s]
    fields = [
        valid.astype(jnp.int32),
        p[..., 0],
        p[..., 0] + e[..., 0],
        p[..., 1] + p[..., 2],
        p[..., 1] + e[..., 1] + p[..., 2] + e[..., 2],
        p[..., 1] - p[..., 2],
        e[..., 1],
        d0[sid],
        slope[sid],
        ent_s,
        p[..., 2],                                            # posz
        sid,
    ]
    stacked = jnp.stack(fields)                               # (F, HH, HL, cap, HW)
    F = stacked.shape[0]
    stacked = stacked.reshape(F, HH, NC, HW)
    # Expand bin_x -> lanes and pad to w_pad.  Padding lanes get valid=0.
    lanes = jnp.repeat(stacked, cfg.bin_size, axis=3)
    lanes = lanes[..., :cfg.view_width]
    pad = w_pad - cfg.view_width
    lanes = jnp.pad(lanes, ((0, 0), (0, 0), (0, 0), (0, pad)))
    return lanes


def _trace_kernel(row0_ref, tab_ref, key_ref, ent_ref, sdep_ref, pz_ref,
                  rb_ref, px_ref, sid_ref, mkey_scr, empty_scr, *, config,
                  rows_per_block: int, n_cands: int, nc2: int, w_pad: int,
                  segments=None):
    cfg = config
    cap = cfg.bin_capacity
    HL = cfg.hash_length
    H = cfg.view_height
    R = rows_per_block

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 1)
    cand_i = jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 0)

    valid = tab_ref[0, 0]
    f0 = tab_ref[1, 0]
    f1 = tab_ref[2, 0]
    f2 = tab_ref[3, 0]
    f3 = tab_ref[4, 0]
    f4 = tab_ref[5, 0]
    f5 = tab_ref[6, 0]
    f6 = tab_ref[7, 0]
    f7 = tab_ref[8, 0]
    fent = tab_ref[9, 0]
    fpz = tab_ref[10, 0]
    fsid = tab_ref[11, 0]

    # Per-bin empty masks (jr-independent): row b holds bin b's emptiness.
    for b in range(HL):
        any_valid = jnp.max(valid[b * cap:(b + 1) * cap], axis=0,
                            keepdims=True)
        empty_scr[b:b + 1] = 1 - any_valid

    block = pl.program_id(0)
    j0 = row0_ref[0] + block * R

    def cand_keys(jr):
        """Per-candidate keys (and sdep) for screen row j0+jr."""
        world_j = H - (j0 + jr)
        row = f3 - world_j
        hit = ((valid > 0)
               & (lane_i >= f0) & (lane_i < f1)
               & (world_j > f2) & (world_j <= f3))
        if segments is None:
            sdep = jnp.maximum(0, f6 - f7 * row)
        else:
            # Piecewise-ramp depth: select chain over (sprite, row-range)
            # segments — no gather (alternative.cpp:336-341's depth fetch).
            sdep = jnp.zeros_like(row)
            for (s, r0, r1, d0k, slopek) in segments:
                inseg = (fsid == s) & (row >= r0) & (row < r1)
                sdep = jnp.where(inseg, d0k - slopek * (row - r0), sdep)
        depth = f4 + jnp.minimum(0, f5 - row) - sdep
        key = jnp.where(hit, depth * nc2 + (nc2 - 1 - cand_i),
                        jnp.int32(KEY_MIN))
        return key, sdep

    # Phase 1: per-row candidate keys -> per-(bin, jr) maxima.
    for jr in range(R):
        key, _ = cand_keys(jr)
        for b in range(HL):
            mkey_scr[b * R + jr:b * R + jr + 1] = jnp.max(
                key[b * cap:(b + 1) * cap], axis=0, keepdims=True)

    # Phase 2: early-exit scan over bins (quirk Q5), all jr rows at once.
    total = jnp.full((R, w_pad), jnp.int32(KEY_MIN), jnp.int32)
    counter = jnp.zeros((R, w_pad), jnp.int32)
    for b in range(HL):
        m = mkey_scr[b * R:(b + 1) * R]
        if cfg.early_exit:
            empty = empty_scr[b:b + 1] > 0
            use = counter < 2
            has = use & (m > total)
            total = jnp.where(has, m, total)
            counter = jnp.where(
                use, jnp.where(empty, 0, counter + has.astype(jnp.int32)),
                counter)
        else:
            total = jnp.maximum(total, m)

    key_ref[:] = total

    # Phase 3: winner-field resolve (keys are unique, so a masked max over
    # candidates recovers each winner attribute) — saves the epilogue a
    # per-pixel gather per attribute.
    for jr in range(R):
        key, sdep = cand_keys(jr)
        match = key == total[jr:jr + 1, :]      # at most one candidate true

        def pick(field):
            return jnp.max(jnp.where(match, field, jnp.int32(KEY_MIN)),
                           axis=0, keepdims=True)

        ent_ref[jr:jr + 1, :] = pick(fent)
        sdep_ref[jr:jr + 1, :] = pick(sdep)
        pz_ref[jr:jr + 1, :] = pick(fpz)
        rb_ref[jr:jr + 1, :] = pick(f3)
        px_ref[jr:jr + 1, :] = pick(f0)
        sid_ref[jr:jr + 1, :] = pick(fsid)


def trace_keys_pallas(tables: jax.Array, config: RenderConfig,
                      rows_per_block: int = 8, w_pad: int | None = None,
                      segments=None, row0=None, n_rows: int | None = None):
    """Run the kernel; returns per-pixel winning keys (n_rows, w_pad) int32.

    ``row0``/``n_rows`` select a screen-row window [row0, row0+n_rows) —
    the shard_map row-sharding hook (each shard renders its own window
    with the unchanged kernel).  ``row0`` is traced (it comes from
    ``jax.lax.axis_index``) and rides scalar prefetch so the per-block
    table slice can be indexed by absolute bin row; it must be a multiple
    of ``rows_per_block`` so row blocks stay inside one bin row.
    """
    cfg = config
    if n_rows is None:
        n_rows = cfg.view_height
    if row0 is None:
        row0 = 0
    row0 = jnp.asarray(row0, jnp.int32).reshape(1)
    if w_pad is None:
        w_pad = -(-cfg.view_width // 128) * 128
    n_cands = cfg.hash_length * cfg.bin_capacity
    nc2 = 1
    while nc2 < n_cands:
        nc2 *= 2
    R = rows_per_block
    assert n_rows % R == 0, "row window must divide by rows_per_block"
    bs = cfg.bin_size
    assert bs % R == 0, "rows_per_block must divide bin_size"

    kernel = functools.partial(_trace_kernel, config=cfg,
                               rows_per_block=R, n_cands=n_cands, nc2=nc2,
                               w_pad=w_pad, segments=segments)
    # Interpreter mode on non-TPU backends (CPU tests validate the kernel
    # logic; compiled Mosaic runs on real TPUs).
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    out = jax.ShapeDtypeStruct((n_rows, w_pad), jnp.int32)
    spec = pl.BlockSpec((R, w_pad), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # row0
        grid=(n_rows // R,),
        in_specs=[pl.BlockSpec(
            (tables.shape[0], 1, n_cands, w_pad),
            lambda i, row0_ref: (0, (row0_ref[0] + i * R) // bs, 0, 0),
            memory_space=pltpu.VMEM)],
        out_specs=(spec,) * 7,
        scratch_shapes=[
            pltpu.VMEM((cfg.hash_length * R, w_pad), jnp.int32),
            pltpu.VMEM((cfg.hash_length, w_pad), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=(out,) * 7,
    )(row0, tables)


def trace_pixels_pallas(pos, ext, sprite_id, atlas_color, atlas_depth,
                        atlas_normal, palette, bins_ent, counts,
                        config: RenderConfig,
                        depth_params, bands=None,
                        rects=None, segments=None, row0=None,
                        n_rows: int | None = None) -> GBufferArrays:
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
    H, W = cfg.view_height, cfg.view_width
    if n_rows is None:
        n_rows = H
    assert depth_params is not None or segments is not None
    if depth_params is not None:
        d0, slope = depth_params
        segments = None   # single-ramp arithmetic is cheaper than selects
    else:
        S = atlas_color.shape[0]
        d0 = np.zeros(S, np.int32)
        slope = np.zeros(S, np.int32)
    w_pad = -(-W // 128) * 128
    tables = _expand_tables(pos, ext, sprite_id, jnp.asarray(d0),
                            jnp.asarray(slope), bins_ent, counts, cfg, w_pad)
    keys, ent, sdep, pz, rowbase, posx, sid = (
        a[:, :W] for a in trace_keys_pallas(tables, cfg, segments=segments,
                                            row0=row0, n_rows=n_rows))

    # Winner attributes come straight from the kernel; only the per-texel
    # color/normal maps still need gathers.
    hit = keys > KEY_MIN // 2
    j = jnp.arange(n_rows, dtype=jnp.int32)[:, None]
    if row0 is not None:
        j = j + jnp.asarray(row0, jnp.int32)
    i = jnp.arange(W, dtype=jnp.int32)[None, :]
    world_j = jnp.int32(H) - j

    row = rowbase - world_j
    col = i - posx
    texel = ((jnp.where(hit, sid, 0) * cfg.sprite_height
              + jnp.clip(row, 0, cfg.sprite_height - 1))
             * cfg.sprite_width + jnp.clip(col, 0, cfg.sprite_width - 1))
    if rects is not None:
        # Rect-decomposed color map: select chain, no per-pixel gather.
        cidx = jnp.zeros((n_rows, W), jnp.int32)
        for (s, r0, r1, c0, c1, value) in rects:
            in_rect = ((sid == s) & (row >= r0) & (row < r1)
                       & (col >= c0) & (col < c1))
            cidx = jnp.where(in_rect, value, cidx)
    else:
        cidx = atlas_color.reshape(-1)[texel]

    # Palette resolve as a select chain — palettes are tiny and selects beat
    # a per-pixel gather by ~1 ms/frame on TPU.
    bg = jnp.asarray(cfg.background, jnp.uint8)
    color = jnp.broadcast_to(bg, (n_rows, W, 4))
    for k in range(palette.shape[0]):
        color = jnp.where((hit & (cidx == k))[..., None], palette[k], color)

    if bands is not None and atlas_color.shape[0] <= 8:
        # Two-band normals via select chains: no per-pixel gathers.
        splits, tops, fronts = (np.asarray(b) for b in bands)
        S = splits.shape[0]
        normal = jnp.zeros((n_rows, W, 3), jnp.float32)
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
