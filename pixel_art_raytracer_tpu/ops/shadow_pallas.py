"""Pallas TPU kernel for the table-driven shadow pass.

Builds on ops/shadow_fast.py: membership simulation and candidate compaction
stay in XLA (tiny), while all per-pixel work runs in a kernel that keeps
pixel state in VMEM and streams candidate parameters from SMEM.  Three
structural wins over the XLA candidate scan:

* **In-VMEM membership bitmaps.**  A pixel's start bin is
  (lane/bin_size, row-band-or-background, sz) — thanks to the oblique
  invariant wy+wz == world_j, the y coordinate is the pixel row's band for
  every hit pixel and a single aliased row for background pixels.  So the
  per-pixel 24-word membership bitmap is a select over the handful of sz
  values from small lane-expanded tables, built once per block in VMEM —
  replacing a 3.7M-element XLA gather per frame.
* **Per-block candidate pruning.**  Candidates whose bins no start bin
  reachable from the block tests are skipped wholesale; the kernel loops a
  dynamic per-block count over a pruned index list.
* **VMEM-resident pixel state.**  Occlusion accumulators, origins, and
  reciprocal directions never round-trip HBM between candidates.

Output: per-pixel ``lit`` mask, identical to shadow_fast.trace_light_fast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .shadow_fast import Candidates, ShadowTables


def pack_member_words(member) -> jax.Array:
    """(P, V) bool -> (P, n_words) uint32 bitmap rows."""
    P, V = member.shape
    n_words = -(-V // 32)
    pad = n_words * 32 - V
    bits = jnp.pad(member, ((0, 0), (0, pad))).reshape(P, n_words, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return (bits.astype(jnp.uint32) * weights).sum(axis=2, dtype=jnp.uint32)


def block_candidate_lists(cands: Candidates, member, rows_per_block: int,
                          config: RenderConfig, tables: ShadowTables,
                          max_per_block: int):
    """Per-row-block pruned candidate index lists.

    A candidate survives for a block when ``member[start, cand.bin]`` is set
    for some start bin reachable from the block: sx free, sy in {block row
    band, background row}, sz free.  Returns (lists (NB, max_per_block) i32,
    counts (NB,) i32, overflow bool).
    """
    cfg = config
    H = cfg.view_height
    NB = H // rows_per_block
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo

    m = member.reshape(cfg.hash_width, SY, SZ, -1)
    per_sy = m.any(axis=(0, 2))                                   # (SY, V)
    block_sy = (jnp.arange(NB, dtype=jnp.int32) * rows_per_block) // cfg.bin_size
    reach = per_sy[block_sy] | per_sy[cfg.hash_height][None, :]   # (NB, V)

    rel = cands.valid[None, :] & reach[:, cands.bin]              # (NB, M)
    counts = rel.sum(axis=1)
    overflow = (counts > max_per_block).any() | cands.overflow
    order = jnp.argsort(~rel, axis=1, stable=True)[:, :max_per_block]
    return order.astype(jnp.int32), counts.astype(jnp.int32), overflow


def used_block_relevance(member, szidx, bg, config: RenderConfig,
                         tables: ShadowTables, rows_per_block: int,
                         row0=0):
    """Exact per-block bin relevance from the frame's *actual* start bins.

    ``block_candidate_lists`` prunes by which starts are reachable; this
    prunes by which starts this frame's pixels actually occupy: a block's
    relevance is the OR of membership rows over the (sx, sz | background)
    start combinations present among its pixels.  Dropping a bin with no
    present start is exact — every pixel's membership bit for it is zero.

    ``row0``: absolute screen row of szidx/bg's first row (row-sharded
    windows pass their shard offset).  Returns rel: (NB, V) bool.
    """
    cfg = config
    W = cfg.view_width
    R = rows_per_block
    NB = szidx.shape[0] // R
    SX = cfg.hash_width
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo

    sz = szidx[:, :W]
    isbg = (bg[:, :W] > 0)

    lane_sx = np.minimum(np.arange(W) // cfg.bin_size, SX - 1)
    lane_ind = jnp.asarray(np.eye(SX, dtype=np.int32)[lane_sx])   # (W, SX)

    oh = ((sz[..., None] == jnp.arange(SZ, dtype=jnp.int32))
          & ~isbg[..., None]).astype(jnp.int32)                   # (h, W, SZ)
    pres = jnp.einsum("hws,wx->hxs", oh, lane_ind)
    pres = (pres.reshape(NB, R, SX, SZ).sum(axis=1) > 0)          # (NB, SX, SZ)
    presbg = jnp.einsum("hw,wx->hx", isbg.astype(jnp.int32), lane_ind)
    presbg = (presbg.reshape(NB, R, SX).sum(axis=1) > 0)          # (NB, SX)

    m = member.reshape(SX, SY, SZ, -1)
    block_sy = (jnp.asarray(row0, jnp.int32)
                + jnp.arange(NB, dtype=jnp.int32) * R) // cfg.bin_size
    mrows = jnp.moveaxis(m[:, block_sy], 1, 0)                    # (NB, SX, SZ, V)
    rel = jnp.einsum("bxs,bxsv->bv", pres.astype(jnp.int32),
                     mrows.astype(jnp.int32)) > 0

    from .cstyle import c_div

    sy_bg = min(int(c_div(cfg.view_height, cfg.bin_size)), SY - 1)
    mbg = m[:, sy_bg, -tables.sz_lo]                              # (SX, V)
    rel = rel | (jnp.einsum("bx,xv->bv", presbg.astype(jnp.int32),
                            mbg.astype(jnp.int32)) > 0)
    return rel


def candidate_lists_from_relevance(cands: Candidates, rel):
    """Compact candidate index lists from an (NB, V) relevance map.

    Per-row stable argsort (a cumsum+scatter variant measured slower on
    TPU — cumsum is a sequential scan there).
    """
    relc = cands.valid[None, :] & rel[:, cands.bin]               # (NB, M)
    counts = relc.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~relc, axis=1, stable=True)
    return order.astype(jnp.int32), counts


def lane_member_tables(member_words, config: RenderConfig,
                       tables: ShadowTables, rows_per_block: int,
                       w_pad: int, row0=0, n_rows: int | None = None):
    """Lane-expanded per-block membership word tables.

    ``row0``/``n_rows`` select the screen-row window (for row-sharded
    shards); defaults cover the full frame.  Returns:
      t_row: (NB, SZ * n_words, w_pad) uint32 — words for sy = block row
             band, per sz, expanded over lanes (sx = lane // bin_size).
      t_bg:  (n_words, w_pad) uint32 — words for the background start
             (sy = aliased background row, sz = index of 0).
    """
    cfg = config
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    nw = member_words.shape[1]
    NB = (n_rows if n_rows is not None
          else cfg.view_height) // rows_per_block

    m = member_words.reshape(cfg.hash_width, SY, SZ, nw)
    block_sy = (jnp.asarray(row0, jnp.int32)
                + jnp.arange(NB, dtype=jnp.int32) * rows_per_block
                ) // cfg.bin_size

    def expand(rows):  # (..., SX, nw) -> (..., nw, w_pad)
        lanes = jnp.repeat(rows, cfg.bin_size, axis=-2)[..., :cfg.view_width, :]
        lanes = jnp.pad(lanes,
                        [(0, 0)] * (lanes.ndim - 2)
                        + [(0, w_pad - cfg.view_width), (0, 0)])
        return jnp.moveaxis(lanes, -2, -1)

    rows = jnp.moveaxis(m[:, block_sy], 1, 0)          # (NB, SX, SZ, nw)
    rows = jnp.moveaxis(rows, 2, 1)                    # (NB, SZ, SX, nw)
    t_row = expand(rows).reshape(NB, SZ * nw, w_pad)

    from .cstyle import c_div

    sy_bg = int(c_div(cfg.view_height, cfg.bin_size))
    sy_bg = min(sy_bg, SY - 1)
    bg_rows = m[:, sy_bg, -tables.sz_lo]               # (SX, nw)
    t_bg = expand(bg_rows)                             # (nw, w_pad)
    return t_row, t_bg


def _shadow_kernel(counts_ref, cbin_ref, lists_ref, box_ref, centi_ref,
                   trow_ref, tbg_ref, szidx_ref, bg_ref, oy_ref, oz_ref,
                   ivx_ref, ivy_ref, ivz_ref, ent_ref, out_ref, bitmap_scr,
                   *, w_pad: int, rows: int, n_words: int, n_sz: int):
    """Per-block pruned candidate counts and the flat-bin id table ride
    scalar prefetch (tiny); the pruned per-block index lists stream through
    a blocked SMEM input (whole SMEM tables would be buffered per grid
    step, blowing the 1 MB budget); box corners / entity ids live in VMEM
    and are read with scalar loads.
    """
    block = pl.program_id(0)
    n = counts_ref[block]
    R = rows

    lane = jax.lax.broadcasted_iota(jnp.int32, (R, w_pad), 1)
    ox = lane.astype(jnp.float32)
    oy = oy_ref[...]
    oz = oz_ref[...]
    ivx = ivx_ref[...]
    ivy = ivy_ref[...]
    ivz = ivz_ref[...]
    ent = ent_ref[...]
    szidx = szidx_ref[...]
    bg = bg_ref[...] > 0

    # Build this block's per-pixel membership bitmap in VMEM: select the
    # lane-vector of words by each pixel's sz (or the background row).
    for w in range(n_words):
        acc = jnp.where(bg, tbg_ref[w:w + 1, :], jnp.uint32(0))
        for s in range(n_sz):
            rowvec = trow_ref[0, s * n_words + w:s * n_words + w + 1, :]
            acc = jnp.where(~bg & (szidx == s), rowvec, acc)
        bitmap_scr[w] = acc
    # Dedicated always-zero word: padded/invalid candidates index it.
    bitmap_scr[n_words] = jnp.zeros((R, w_pad), jnp.uint32)

    def chunk_body(i, occ):
        # Candidates stream in chunks of 8 through this block's *pruned*
        # index list (lists_ref, SMEM); all parameter reads are scalar
        # loads.  Padded/invalid candidates point at the dedicated
        # always-zero bitmap word.
        c0 = i * 8

        for cc in range(8):
            m = c0 + cc
            c = lists_ref[0, m // 128, m % 128]
            b_c = cbin_ref[c]                      # scalar flat-ish bin id
            word_c = b_c // 32
            bit_c = b_c % 32
            # Scalar loads from the VMEM tables: scalars broadcast freely
            # into the [R, w_pad] vector math (vector extracts would need a
            # both-dims broadcast, which Mosaic lacks).
            px = box_ref[c, 0]
            py = box_ref[c, 1]
            pz = box_ref[c, 2]
            qx = box_ref[c, 3]
            qy = box_ref[c, 4]
            qz = box_ref[c, 5]
            ent_c = centi_ref[c, 0]

            w = bitmap_scr[word_c]
            member = ((w >> bit_c.astype(jnp.uint32)) & jnp.uint32(1)) > 0

            # Slab test with the reference's std::min/std::max argument
            # order (alternative.cpp:40-83).
            x1 = (px - ox) * ivx
            x2 = (qx - ox) * ivx
            lo = jnp.where(x2 < x1, x2, x1)
            hi = jnp.where(x1 < x2, x2, x1)
            y1 = (py - oy) * ivy
            y2 = (qy - oy) * ivy
            a = jnp.where(y2 < y1, y2, y1)
            b = jnp.where(y1 < y2, y2, y1)
            lo = jnp.where(lo < a, a, lo)
            hi = jnp.where(b < hi, b, hi)
            z1 = (pz - oz) * ivz
            z2 = (qz - oz) * ivz
            a = jnp.where(z2 < z1, z2, z1)
            b = jnp.where(z1 < z2, z2, z1)
            lo = jnp.where(lo < a, a, lo)
            hi = jnp.where(b < hi, b, hi)
            hit = hi >= lo

            occ_new = member & hit & (ent != ent_c)
            # int32 accumulator: Mosaic cannot legalize i1 loop carries.
            occ = occ | occ_new.astype(jnp.int32)
        return occ

    occ0 = jnp.zeros((R, w_pad), jnp.int32)
    n_chunks = (n + 7) // 8
    occluded = jax.lax.fori_loop(0, n_chunks, chunk_body, occ0)
    out_ref[...] = jnp.where(occluded > 0, 0, 1).astype(jnp.int32)


def trace_light_pallas(member, szidx, bg, start_ent, oy, oz, ivx, ivy, ivz,
                       cands: Candidates, config: RenderConfig,
                       tables: ShadowTables, rows_per_block: int = 8,
                       row0=0) -> jax.Array:
    """Kernel driver.  Pixel inputs are (h, w_pad)-shaped (szidx is the
    clamped sz table index, bg marks background pixels); ``h`` may be a
    row-sharded window whose absolute first screen row is ``row0``.
    Returns lit (h, w_pad) int32 (1 = reachable)."""
    cfg = config
    H = oy.shape[0]
    w_pad = oy.shape[1]
    R = rows_per_block
    NB = H // R
    SZ = tables.sz_hi - tables.sz_lo

    member_words = pack_member_words(member)
    n_words = member_words.shape[1]
    t_row, t_bg = lane_member_tables(member_words, cfg, tables, R, w_pad,
                                     row0=row0, n_rows=H)
    rel = used_block_relevance(member, szidx, bg, cfg, tables, R, row0=row0)
    lists, blk_counts = candidate_lists_from_relevance(cands, rel)

    M = cands.bin.shape[0]
    assert M % 8 == 0
    # Invalid/padded candidates point at the always-zero bitmap word.
    cbin = jnp.where(cands.valid, cands.bin, n_words * 32).astype(jnp.int32)
    box = jnp.zeros((M, 8), jnp.float32)
    box = box.at[:, 0:3].set(cands.pmin).at[:, 3:6].set(cands.pmax)
    centi = jnp.broadcast_to(
        jnp.where(cands.valid, cands.ent, -(10 ** 9))[:, None],
        (M, 8)).astype(jnp.int32)

    kernel = functools.partial(_shadow_kernel, w_pad=w_pad, rows=R,
                               n_words=n_words, n_sz=SZ)
    interpret = jax.devices()[0].platform not in ("tpu", "axon")

    def pix(i=0):
        return pl.BlockSpec((R, w_pad), lambda i_, *_: (i_, 0),
                            memory_space=pltpu.VMEM)

    # SMEM operands are buffered per grid step (40 x their size): whole
    # tables must not ride scalar prefetch, but a *blocked* SMEM spec only
    # buffers its 4 KB block — the per-block pruned candidate list uses
    # that.  Box/entity parameter tables live in VMEM (scalar loads).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # per-block counts, cbin
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, M // 128, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),    # pruned index lists
            pl.BlockSpec(box.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),    # box corners
            pl.BlockSpec(centi.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),    # candidate entity ids
            pl.BlockSpec((1, SZ * n_words, w_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),    # t_row
            pl.BlockSpec(memory_space=pltpu.VMEM),    # t_bg (full)
            pix(), pix(), pix(), pix(), pix(), pix(), pix(), pix(),
        ],
        out_specs=pl.BlockSpec((R, w_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_words + 1, R, w_pad), jnp.uint32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, w_pad), jnp.int32),
        interpret=interpret,
    )(blk_counts, cbin, lists.reshape(-1, M // 128, 128), box, centi,
      t_row, t_bg,
      szidx, bg, oy, oz, ivx, ivy, ivz, start_ent)
