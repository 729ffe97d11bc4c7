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


def effective_lane_groups(w_pad: int, requested: int = 1,
                          max_tile: int = 512) -> int:
    """Lane-group count actually used for a padded width: at least
    ``requested``, and enough that each tile is <= ``max_tile`` lanes
    (VMEM scratch scales with the tile, not the frame width), constrained
    to tiles that are 128-lane multiples.  Falls back to 128-lane tiles
    when no divisor fits."""
    lanes128 = w_pad // 128
    want = max(requested, -(-w_pad // max_tile))
    for g in range(want, lanes128 + 1):
        if lanes128 % g == 0:
            return g
    return lanes128


# Budget for the host-estimable terms; Mosaic's own block temporaries
# (which the estimate cannot see and which also scale with n_words*gw)
# take the rest of the ~16 MB stack.  Calibration: the 10k-box 2048^2
# scale scene (n_words=169, SZ=9, R=8 because 2048 % 40 != 0) needs a
# 17.73 MB stack at gw=512 (observed compile OOM, round 5) with a
# host-estimable footprint of ~7.8 MB — so the budget sits below that
# to force gw<=256 there, while graybox (n_words=24, estimate ~3.1 MB)
# keeps its measured-optimal single 512-lane tile.
LANE_FIT_BUDGET_BYTES = 6 * 2 ** 20


def fit_lane_groups(w_pad: int, requested: int, config: RenderConfig,
                    tables: ShadowTables, rows_per_block: int,
                    member_expand: bool = True) -> int:
    """VMEM-aware lane-group count for the shadow kernel.

    The kernel holds the whole membership table slice per lane tile —
    ``(SZ+1) * n_words * gw`` words as the member-expand scratch (or the
    lane-expanded t_row windows when ``member_expand`` is off) — so its
    scoped-vmem need scales with the HASH VOLUME, not just the frame
    width.  Graybox's 24 words fit a 512-lane tile easily; a 10k-box
    2048^2 world has ~169 words and OOM'd Mosaic's 16 MB stack at
    gw=512 (round-5 scale-bench regression).  Pick the widest 128-lane-
    multiple tile whose estimated residency fits ``LANE_FIT_BUDGET_BYTES``,
    then delegate to ``effective_lane_groups`` for divisibility."""
    cfg = config
    SZ = tables.sz_hi - tables.sz_lo
    n_words = -(-cfg.hash_volume // 32)
    R = rows_per_block
    mt_rows = 2 * (SZ + 1) * n_words

    def est(gw: int) -> int:
        member = (SZ + 1) * n_words * gw          # scratch (mx) / t_row
        if member_expand:
            member += 2 * mt_rows * 128           # msmall window (dbuf)
            member += 2 * 128 * gw                # lane-selection window
        else:
            member *= 2                           # double-buffered window
        pix = 2 * 9 * R * gw                      # pixel windows + out
        return 4 * (member + pix + R * gw)        # + wcur

    max_tile = 128
    for gw in (512, 384, 256, 128):
        if est(gw) <= LANE_FIT_BUDGET_BYTES:
            max_tile = gw
            break
    return effective_lane_groups(w_pad, requested, max_tile=max_tile)


def used_block_relevance(member, szidx, bg, config: RenderConfig,
                         tables: ShadowTables, rows_per_block: int,
                         row0=0, lane_groups: int | None = None):
    """Exact per-block bin relevance from the frame's *actual* start bins.

    A block's relevance is the OR of membership rows over the
    (sx, sz | background) start combinations present among its pixels.
    Dropping a bin with no present start is exact — every pixel's
    membership bit for it is zero.  (Reference dense-bitmap form;
    production paths use the packed-word ``tile_candidate_relevance``,
    unit-tested equal.)

    ``row0``: absolute screen row of szidx/bg's first row (row-sharded
    windows pass their shard offset).

    ``lane_groups``: split each row block into that many lane tiles and
    prune per (block, tile) — the vectorizable form of per-corridor
    candidate lists (a tile sees only ~3 of the 12 start columns, roughly
    halving the surviving candidates).  None returns (NB, V); an int
    returns (NB, G, V).
    """
    cfg = config
    W = cfg.view_width
    R = rows_per_block
    NB = szidx.shape[0] // R
    SX = cfg.hash_width
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    G = lane_groups or 1
    tw = szidx.shape[1] // G           # lanes per tile (of the padded width)

    sz = szidx[:, :W]
    isbg = (bg[:, :W] > 0)

    f32 = jnp.float32
    lanes = np.arange(W)
    lane_sx = np.minimum(lanes // cfg.bin_size, SX - 1)
    # (W, G, SX) 0/1: lane w contributes to tile w // tw, column sx(w).
    lane_ind = np.zeros((W, G, SX), np.float32)
    lane_ind[lanes, np.minimum(lanes // tw, G - 1), lane_sx] = 1.0
    lane_ind = jnp.asarray(lane_ind)

    # All contractions in f32 on the MXU (int einsums run as slow vector
    # loops); values are 0/1 with sums << 2^24, so results are exact.
    oh = ((sz[..., None] == jnp.arange(SZ, dtype=jnp.int32))
          & ~isbg[..., None]).astype(f32)                         # (h, W, SZ)
    pres = jnp.einsum("hws,wgx->hgxs", oh, lane_ind,
                      preferred_element_type=f32)
    pres = (pres.reshape(NB, R, G, SX, SZ).sum(axis=1) > 0)
    presbg = jnp.einsum("hw,wgx->hgx", isbg.astype(f32), lane_ind,
                        preferred_element_type=f32)
    presbg = (presbg.reshape(NB, R, G, SX).sum(axis=1) > 0)       # (NB, G, SX)

    m = member.reshape(SX, SY, SZ, -1)
    block_sy = (jnp.asarray(row0, jnp.int32)
                + jnp.arange(NB, dtype=jnp.int32) * R) // cfg.bin_size
    mrows = jnp.moveaxis(m[:, block_sy], 1, 0)                    # (NB, SX, SZ, V)
    rel = jnp.einsum("bgxs,bxsv->bgv", pres.astype(f32),
                     mrows.astype(f32), preferred_element_type=f32) > 0

    from .cstyle import c_div

    sy_bg = min(int(c_div(cfg.view_height, cfg.bin_size)), SY - 1)
    mbg = m[:, sy_bg, -tables.sz_lo]                              # (SX, V)
    rel = rel | (jnp.einsum("bgx,xv->bgv", presbg.astype(f32),
                            mbg.astype(f32),
                            preferred_element_type=f32) > 0)
    return rel[:, 0] if lane_groups is None else rel


def tile_candidate_relevance(member_words, szidx, bg, cands: Candidates,
                             config: RenderConfig, tables: ShadowTables,
                             rows_per_block: int, row0=0,
                             lane_groups: int = 1, needs=None,
                             n_sx: int | None = None, lane_rows=None,
                             bg_row=None):
    """Per-(row-block, lane-tile) candidate relevance straight from packed
    membership words — no dense (starts, V) bitmap unpack.

    Same result as ``used_block_relevance`` followed by indexing with
    ``cands.bin`` (tested against it), but ~20x less element work: the
    start-presence fold ORs whole uint32 words, and the per-candidate bit
    rides a one-hot matmul over the word axis (HIGHEST precision — the
    16-bit halves would truncate in the TPU's default bf16 pass).

    ``needs`` ((h, w_pad) int32/bool, optional): restrict start presence to
    pixels whose shading actually depends on the shadow result.  A pixel
    with Lambert ``dot <= 0`` shades to the ambient factor whether lit or
    not (alternative.cpp:744-758: ``min(1, max(0, dot) + ambient)`` equals
    ``ambient`` when ``dot <= 0``), so its start bin need not keep any
    candidate alive — dropping it cannot change any output pixel.
    Background pixels carry zero normals (quirk Q6), so a dot-based mask
    subsumes the background row too.

    ``n_sx``/``lane_rows``/``bg_row`` generalise the start space for the
    directional extension (ops/shadow_dir.py): ``n_sx`` overrides the
    leading start-space axis, ``lane_rows`` ((>=W,) int32, may be traced)
    overrides the lane -> leading-axis mapping, and ``bg_row`` (traced
    int32) overrides the background start's row on the sz axis.

    Returns relc (NB, G, M) bool.
    """
    cfg = config
    W = cfg.view_width
    R = rows_per_block
    NB = szidx.shape[0] // R
    SX = cfg.hash_width if n_sx is None else n_sx
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    G = lane_groups
    tw = szidx.shape[1] // G
    nw = member_words.shape[1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    sz = szidx[:, :W]
    isbg = (bg[:, :W] > 0)
    active = jnp.ones_like(isbg) if needs is None else (needs[:, :W] > 0)

    # Start presence per (block, tile): fold the row axis FIRST as int
    # sz-bitmasks (1 << sz, plus a background bit at SZ) — (h, W) int32
    # element work instead of materialising the (h, W, SZ) f32 one-hot
    # the round-2 form contracted (~10x fewer elements; the drift-immune
    # loop profile put this stage at ~0.05 ms/frame).  The folded
    # (NB, W) masks unpack to a small (NB, W, SZ+1) 0/1, and the
    # lane->(tile, sx) mapping stays an MXU one-hot contraction (exact:
    # 0/1 products, sums << 2^24).  [A round-3 earlier attempt that
    # packed the WORD OR-fold this way was slower — this one packs the
    # row fold, which has 40x more elements to collapse.]
    if lane_rows is None:
        lanes = np.arange(W)
        lane_sx = np.minimum(lanes // cfg.bin_size, SX - 1)
        lane_ind = np.zeros((W, G, SX), np.float32)
        lane_ind[lanes, np.minimum(lanes // tw, G - 1), lane_sx] = 1.0
        lane_ind = jnp.asarray(lane_ind)
    else:
        lr = lane_rows[:W]
        gidx = jnp.minimum(jnp.arange(W, dtype=jnp.int32) // tw, G - 1)
        lane_ind = ((gidx[:, None, None]
                     == jnp.arange(G, dtype=jnp.int32)[None, :, None])
                    & (lr[:, None, None]
                       == jnp.arange(SX, dtype=jnp.int32)[None, None, :])
                    ).astype(f32)                         # (W, G, SX)

    if SZ <= 31:
        bits = jnp.where(active,
                         jnp.where(isbg, jnp.int32(1) << SZ,
                                   jnp.int32(1) << sz), 0)    # (h, W)
        rowor = jax.lax.reduce(bits.reshape(NB, R, W), jnp.int32(0),
                               jax.lax.bitwise_or, (1,))      # (NB, W)
        unpacked = ((rowor[..., None]
                     >> jnp.arange(SZ + 1, dtype=jnp.int32)) & 1
                    ).astype(f32)                             # (NB, W, SZ+1)
    else:
        # Wide row axes (> 31 sz rows + background) don't fit an int32
        # bitmask: fold the rows as a one-hot sum instead (the round-2
        # form; slower but unbounded — directional extended axes and
        # huge-grid default tables land here).
        idx = jnp.where(isbg, jnp.int32(SZ), sz)
        oh = ((idx[..., None] == jnp.arange(SZ + 1, dtype=jnp.int32))
              & active[..., None]).astype(f32)                # (h, W, SZ+1)
        unpacked = (oh.reshape(NB, R, W, SZ + 1).sum(axis=1) > 0
                    ).astype(f32)                             # (NB, W, SZ+1)
    presall = jnp.einsum("bws,wgx->bgxs", unpacked, lane_ind,
                         preferred_element_type=f32) > 0      # (NB,G,SX,SZ+1)
    pres = presall[..., :SZ]                                  # (NB,G,SX,SZ)
    presbg = presall[..., SZ]                                 # (NB, G, SX)

    from .cstyle import c_div

    m = member_words.reshape(SX, SY, SZ, nw)
    block_sy = (jnp.asarray(row0, jnp.int32)
                + jnp.arange(NB, dtype=jnp.int32) * R) // cfg.bin_size
    mrows = jnp.moveaxis(m[:, block_sy], 1, 0)            # (NB, SX, SZ, nw)
    sy_bg = min(int(c_div(cfg.view_height, cfg.bin_size)), SY - 1)
    if bg_row is None:
        mbg = m[:, sy_bg, -tables.sz_lo]                  # (SX, nw)
    else:
        mbg = jax.lax.dynamic_index_in_dim(m[:, sy_bg], bg_row, axis=1,
                                           keepdims=False)

    # Packed OR-fold over present starts: (NB, G, SX, SZ, nw) select then
    # bitwise-OR reduce — whole words, no per-bin unpack.
    selw = jnp.where(pres[..., None], mrows[:, None], jnp.uint32(0))
    rel_words = jax.lax.reduce(selw, jnp.uint32(0), jax.lax.bitwise_or,
                               (2, 3))                    # (NB, G, nw)
    selbg = jnp.where(presbg[..., None], mbg[None, None], jnp.uint32(0))
    rel_words = rel_words | jax.lax.reduce(
        selbg, jnp.uint32(0), jax.lax.bitwise_or, (2,))

    # Candidate word select as a one-hot matmul over the word axis, then
    # the occupied-bin mask test (candidates are merged per (ent, word)).
    wc = cands.bin // 32
    onehot = (wc[:, None] == jnp.arange(nw, dtype=jnp.int32)).astype(f32)
    lo = (rel_words & jnp.uint32(0xffff)).astype(f32).reshape(NB * G, nw)
    hi = (rel_words >> jnp.uint32(16)).astype(f32).reshape(NB * G, nw)
    dn = (((1,), (1,)), ((), ()))
    lo_c = jax.lax.dot_general(lo, onehot, dn, precision=hp,
                               preferred_element_type=f32)
    hi_c = jax.lax.dot_general(hi, onehot, dn, precision=hp,
                               preferred_element_type=f32)
    word_c = (lo_c.astype(jnp.uint32)
              | (hi_c.astype(jnp.uint32) << jnp.uint32(16)))
    relc = (word_c.reshape(NB, G, -1)
            & cands.mask.astype(jnp.uint32)[None, None]) != 0
    return relc & cands.valid[None, None]


def range_candidate_relevance(member_words, blk_szrange, cands: Candidates,
                              config: RenderConfig, tables: ShadowTables,
                              rows_per_block: int, row0=0,
                              lane_groups: int = 1):
    """Per-row-block candidate relevance from the block's [sz_lo, sz_hi)
    START-ROW HULL instead of exact per-pixel start presence.

    ``tile_candidate_relevance`` folds a presence bit per (block, tile,
    sx, sz) out of every pixel's start row — several full passes over the
    (F, h, w_pad) pixel buffers.  This variant replaces the presence set
    with its rectangular hull: every sx column (a row block always spans
    all lane columns) crossed with the block's needs-gated sz range
    (``block_sz_ranges`` — already computed for the kernel's bitmap
    loop), so the whole fold runs on the SMALL (SX, SZ, nw) membership
    row table and the pixel buffers are never re-read.

    Exactness: the hull is a SUPERSET of the exact presence set, and
    block relevance is monotone in presence (an OR), so every exactly-
    relevant candidate stays relevant — extra candidates only add kernel
    visits whose member tests are zero for every actually-present pixel
    (the same argument as the pruning itself; unit-tested as a superset
    and pixel-identical end-to-end).  The background start row
    contributes nothing under diffuse gating: background pixels carry
    zero normals (quirk Q6), so their Lambert dot is 0 and ``needs``
    excludes them from presence in the exact fold too.

    Returns relc (NB, G, M) bool — all G tiles of a block share the
    block's relevance (the hull has no lane resolution).
    """
    cfg = config
    R = rows_per_block
    NB = blk_szrange.shape[0] // 2
    SX = cfg.hash_width
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    nw = member_words.shape[1]
    f32 = jnp.float32
    hp = jax.lax.Precision.HIGHEST

    lo = blk_szrange.reshape(NB, 2)[:, 0]
    hi = blk_szrange.reshape(NB, 2)[:, 1]
    szi = jnp.arange(SZ, dtype=jnp.int32)
    rmask = (szi[None, :] >= lo[:, None]) & (szi[None, :] < hi[:, None])

    m = member_words.reshape(SX, SY, SZ, nw)
    block_sy = (jnp.asarray(row0, jnp.int32)
                + jnp.arange(NB, dtype=jnp.int32) * R) // cfg.bin_size
    mrows = jnp.moveaxis(m[:, block_sy], 1, 0)        # (NB, SX, SZ, nw)
    sel = jnp.where(rmask[:, None, :, None], mrows, jnp.uint32(0))
    rel_words = jax.lax.reduce(sel, jnp.uint32(0), jax.lax.bitwise_or,
                               (1, 2))                # (NB, nw)

    # Candidate word select as a one-hot matmul (HIGHEST precision —
    # 16-bit halves truncate in the default bf16 pass), then the
    # occupied-bin mask test — same tail as tile_candidate_relevance.
    wc = cands.bin // 32
    onehot = (wc[:, None] == jnp.arange(nw, dtype=jnp.int32)).astype(f32)
    lov = (rel_words & jnp.uint32(0xffff)).astype(f32)
    hiv = (rel_words >> jnp.uint32(16)).astype(f32)
    dn = (((1,), (1,)), ((), ()))
    lo_c = jax.lax.dot_general(lov, onehot, dn, precision=hp,
                               preferred_element_type=f32)
    hi_c = jax.lax.dot_general(hiv, onehot, dn, precision=hp,
                               preferred_element_type=f32)
    word_c = (lo_c.astype(jnp.uint32)
              | (hi_c.astype(jnp.uint32) << jnp.uint32(16)))
    relc = (word_c[:, None]
            & cands.mask.astype(jnp.uint32)[None, None]) != 0
    relc = jnp.broadcast_to(relc, (NB, lane_groups, relc.shape[-1]))
    return relc & cands.valid[None, None]


def candidate_lists_from_relevance(cands: Candidates, rel):
    """Compact candidate index lists from an (NB, V) or (NB, G, V)
    relevance map.

    Per-row stable argsort (a cumsum+scatter variant measured slower on
    TPU — cumsum is a sequential scan there).  Returns lists shaped like
    ``rel`` with V replaced by M, and counts shaped like ``rel[..., 0]``.
    """
    # Merged candidates carry occupied-bin masks: relevant iff ANY of the
    # candidate's bins is relevant (indexing by the first bin alone would
    # drop occluders reachable only through another occupied bin).
    lead = rel.shape[:-1]
    relw = pack_member_words(rel.reshape(-1, rel.shape[-1]))
    relw = relw.reshape(lead + (relw.shape[-1],))
    wsel = relw[..., cands.bin // 32]                     # (NB[, G], M)
    relc = cands.valid & ((wsel & cands.mask.astype(jnp.uint32)) != 0)
    return candidate_lists_from_relc(relc)


def candidate_lists_from_relc(relc, cap: int | None = None):
    """Compact index lists from per-candidate relevance (…, M) bool.

    ``cap``: capped top-k compaction instead of the full argsort — the
    relevant candidates arrive in the SAME ascending index order as the
    stable argsort prefix (scores ``M - idx`` are distinct, so top-k is
    exact), the list just stops at ``cap`` entries.  Exact only when
    every tile's relevant count fits the cap: callers must guard
    ``max(counts) <= cap`` and reroute hostile frames to the exact path
    (the same pattern as the candidate-capacity overflow guard).  Tail
    entries beyond the count are zero-score picks — arbitrary real or
    padded candidates, harmless exactly as the argsort tail is (their
    membership masks are zero for every pixel of this tile, and padded
    candidates route to the always-zero bitmap word)."""
    counts = relc.sum(axis=-1).astype(jnp.int32)
    M = relc.shape[-1]
    if cap is None or cap >= M:
        order = jnp.argsort(~relc, axis=-1, stable=True)
        return order.astype(jnp.int32), counts
    iota = jnp.arange(M, dtype=jnp.int32)
    score = jnp.where(relc, (M - iota).astype(jnp.float32), 0.0)
    _, idx = jax.lax.top_k(score, cap)
    return idx.astype(jnp.int32), counts


def member_row_tables_small(member_words, config: RenderConfig,
                            tables: ShadowTables, row0=0,
                            n_rows: int | None = None):
    """SMALL (pre-expansion) membership tables for the kernel-side MXU
    lane expansion (``shadow_call_batched(member_small=...)``).

    The lane-expanded ``lane_member_tables`` were the compiled batched
    program's two largest HBM writers (the round-3 cost census put the two
    half-expansion dot fusions at ~7 MB/frame written, read back by the
    kernel's t_row windows).  This variant keeps the table in start-bin
    space — (n_sy, 2*(SZ+1)*nw, KXP) int32, ~100x smaller — and the
    shadow kernel expands each block's bin row over lanes itself with the
    SAME 0/1 lane-selection contraction at HIGHEST precision (16-bit word
    halves; exactness-equivalent to the XLA expansion by construction).

    Row layout per bin row: rows [0, (SZ+1)*nw) are the LO 16-bit halves
    of membership word ``w`` for sz row ``s`` at flat index ``s*nw + w``
    — with ``s == SZ`` the background start row — and rows
    [(SZ+1)*nw, 2*(SZ+1)*nw) the HI halves.  Minor dim = hash_width
    padded to a sublane multiple (zero lanes select nothing).
    """
    cfg = config
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    nw = member_words.shape[1]
    SX = cfg.hash_width
    if n_rows is None:
        n_rows = cfg.view_height
    n_sy = -(-n_rows // cfg.bin_size)

    m = member_words.reshape(SX, SY, SZ, nw)
    block_sy = (jnp.asarray(row0, jnp.int32) // cfg.bin_size
                + jnp.arange(n_sy, dtype=jnp.int32))
    rows = jnp.moveaxis(m[:, block_sy], 1, 0)          # (n_sy, SX, SZ, nw)
    rows = jnp.moveaxis(rows, 1, 3)                    # (n_sy, SZ, nw, SX)

    from .cstyle import c_div

    sy_bg = min(int(c_div(cfg.view_height, cfg.bin_size)), SY - 1)
    bgr = jnp.moveaxis(m[:, sy_bg, -tables.sz_lo], 0, 1)       # (nw, SX)
    full = jnp.concatenate(
        [rows.reshape(n_sy, SZ * nw, SX),
         jnp.broadcast_to(bgr[None], (n_sy, nw, SX))], axis=1)
    lo = (full & jnp.uint32(0xffff)).astype(jnp.int32)
    hi = (full >> jnp.uint32(16)).astype(jnp.int32)
    tab = jnp.concatenate([lo, hi], axis=1)   # (n_sy, 2*(SZ+1)*nw, SX)
    KXP = -(-SX // 8) * 8
    return jnp.pad(tab, ((0, 0), (0, 0), (0, KXP - SX)))


def lane_member_tables(member_words, config: RenderConfig,
                       tables: ShadowTables, rows_per_block: int,
                       w_pad: int, row0=0, n_rows: int | None = None,
                       n_sx: int | None = None, lane_sel=None,
                       bg_row=None, halves: bool = False):
    """Lane-expanded membership word tables, one row per DISTINCT bin row.

    ``row0``/``n_rows`` select the screen-row window (for row-sharded
    shards); defaults cover the full frame.  ``row0`` must be a bin-row
    multiple (the shard_map driver guarantees it).
    ``n_sx``/``lane_sel``/``bg_row`` generalise the start space for the
    directional extension (ops/shadow_dir.py): ``lane_sel`` is a
    ((n_sx, w_pad) 0/1 f32, may be traced) lane-selection matrix and
    ``bg_row`` (traced int32) the background start's sz-axis row.
    Returns:
      t_row: (n_sy, SZ * n_words, w_pad) uint32 — words for each bin row
             the window touches, per sz, expanded over lanes
             (sx = lane // bin_size).  Row k covers screen rows
             [k*bin_size, (k+1)*bin_size) of the window; the kernel's index
             map is ``block // (bin_size // rows_per_block)``.
      t_bg:  (n_words, w_pad) uint32 — words for the background start
             (sy = aliased background row, sz = index of 0).

    ``halves``: return each table as an (lo, hi) pair of uint32 16-bit
    halves instead of the combined words.  The expansion matmuls emit the
    halves directly (XLA fuses the u32 convert into each MXU pass), so
    skipping the combine deletes a full-table HBM pass (~3.5 MB/frame
    written + 7 read on graybox); the shadow kernel ORs the halves at its
    (rare, word-change-gated) row reads instead.
    """
    cfg = config
    SY = cfg.hash_height + 1
    SZ = tables.sz_hi - tables.sz_lo
    nw = member_words.shape[1]
    if n_rows is None:
        n_rows = cfg.view_height
    n_sy = -(-n_rows // cfg.bin_size)

    m = member_words.reshape(cfg.hash_width if n_sx is None else n_sx,
                             SY, SZ, nw)
    block_sy = (jnp.asarray(row0, jnp.int32) // cfg.bin_size
                + jnp.arange(n_sy, dtype=jnp.int32))

    from .trace_pallas import lane_select_matrix

    sel = (lane_select_matrix(cfg, w_pad) if lane_sel is None
           else lane_sel)                                  # (SX, w_pad) 0/1

    def expand(rows):  # (..., SX, nw) -> (..., nw, w_pad) (or half pair)
        # Lane expansion as an MXU matmul (lane gathers are slow); uint32
        # words split into 16-bit halves so the f32 contraction is exact.
        r = jnp.moveaxis(rows, -2, -1)                     # (..., nw, SX)
        shp = r.shape
        r2 = r.reshape(-1, shp[-1])
        lo = (r2 & jnp.uint32(0xffff)).astype(jnp.float32)
        hi = (r2 >> jnp.uint32(16)).astype(jnp.float32)
        dn = (((1,), (0,)), ((), ()))
        # precision=HIGHEST is load-bearing: the TPU default lowers f32
        # matmuls to one bf16 pass, truncating the 16-bit word halves.
        hp = jax.lax.Precision.HIGHEST
        lo_l = jax.lax.dot_general(lo, sel, dn, precision=hp,
                                   preferred_element_type=jnp.float32)
        hi_l = jax.lax.dot_general(hi, sel, dn, precision=hp,
                                   preferred_element_type=jnp.float32)
        if halves:
            return (lo_l.astype(jnp.uint32).reshape(shp[:-1] + (w_pad,)),
                    hi_l.astype(jnp.uint32).reshape(shp[:-1] + (w_pad,)))
        out = (lo_l.astype(jnp.uint32)
               | (hi_l.astype(jnp.uint32) << jnp.uint32(16)))
        return out.reshape(shp[:-1] + (w_pad,))

    rows = jnp.moveaxis(m[:, block_sy], 1, 0)          # (n_sy, SX, SZ, nw)
    rows = jnp.moveaxis(rows, 2, 1)                    # (n_sy, SZ, SX, nw)
    if halves:
        t_row = tuple(t.reshape(n_sy, SZ * nw, w_pad)
                      for t in expand(rows))
    else:
        t_row = expand(rows).reshape(n_sy, SZ * nw, w_pad)

    from .cstyle import c_div

    sy_bg = int(c_div(cfg.view_height, cfg.bin_size))
    sy_bg = min(sy_bg, SY - 1)
    if bg_row is None:
        bg_rows = m[:, sy_bg, -tables.sz_lo]           # (SX, nw)
    else:
        bg_rows = jax.lax.dynamic_index_in_dim(m[:, sy_bg], bg_row,
                                               axis=1, keepdims=False)
    t_bg = expand(bg_rows)                             # (nw, w_pad)
    return t_row, t_bg


# Timing-only ablation hook (tools/prof_shadow_ablate.py): "noslab" skips
# the slab test (hit=member), "nomember" skips the bitmap read (member=
# always true), "noloads" replaces every per-candidate scalar load with
# constants (bounds the scalar-load cost), "nobody" strips the visit to
# the list load plus one vector op (bounds the loop/issue overhead),
# "notrow" swaps the t_row window for an 8-row dummy (bounds the
# membership-table DMA cost; requires bitmap_ondemand).
# WRONG RESULTS — never set outside profiling.
_ablate = None

def trunc_div_magic(d: int, zmax: int):
    """(mul, shift) with (x * mul) >> shift == x // d for all x in
    [0, zmax] — exhaustively verified host-side (the kernel's winner-input
    mode derives the sz bin with it: TPU vector integer division by a
    non-power-of-two constant has no native lowering, and f32 division is
    not correctly rounded on this target).  Raises if no 31-bit-safe pair
    exists (callers then fall back to the legacy pixel-input mode)."""
    x = np.arange(zmax + 1, dtype=np.int64)
    want = x // d
    for s in range(16, 31):
        m = (1 << s) // d + 1
        if m * zmax >= 1 << 31:
            continue
        if (((x * m) >> s) == want).all():
            return int(m), int(s)
    raise ValueError(f"no exact trunc-div magic for d={d}, zmax={zmax}")


# Default for ``shadow_call_batched(bitmap_ondemand=None)``: lazy per-word
# bitmap tiles built inside the word-change refresh (exact either way;
# profiling tools flip this to A/B both compiled variants).  Interleaved
# A/B on v5e graybox (F=64, R=40/G=2): med 0.867 ms/f lazy vs 0.862
# prebuilt — neutral, and the lazy build deletes the (n_words+1, R, gw)
# VMEM scratch (~1 MB at R=40), so it stays the default.
BITMAP_ONDEMAND = True

# Default frames-per-grid-step cap for ``shadow_call_batched``.  The
# hypothesis was that batching frames into one grid step amortises the
# per-step fixed cost (the kernel has ~17 operand windows; in-kernel
# ablations bound the body at only ~1/3 of the stage) — but the
# interleaved sweep MEASURED IT SLOWER: fpb=1 0.840 vs fpb=4 0.875 vs
# fpb=8 0.874 ms/f full-pipeline at F=64 (the 4x-unrolled kernel body
# and coarser DMA pipelining eat the step savings).  Default stays 1;
# the mechanism is kept (tested, exact) for re-measurement on hardware
# with different step overheads.
FRAMES_PER_BLOCK = 1


def _shadow_kernel(meta_ref, ptab_ref, *rest,
                   w_pad: int, rows: int, n_words: int, n_sz: int,
                   meta_off: int, mq: int,
                   lane_groups: int = 1, chunk: int = 8,
                   saturate: bool = False, packed_params: bool = False,
                   bitmap_ondemand: bool = True, frames: int = 1,
                   trow_halves: bool = False, winner_inputs: bool = False,
                   tab_sz_lo: int = 0, view_height: int = 0,
                   zmul: int = 0, zshift: int = 0,
                   member_expand: bool = False, shade=None,
                   pick2: bool = False, depth_static=None,
                   sprite_hw=None, ray_bands=None, no_lists: bool = False):
    """Row-block body on a (frame_blocks, row_blocks) grid — every block
    carries a leading frame dim of ``frames``, so one launch shades a whole
    animation batch and each grid step shades ``frames`` frames' tiles.
    Per-block pruned candidate counts, flat-bin ids, and the pruned index
    lists stream through blocked SMEM inputs (whole SMEM tables would be
    buffered per grid step, blowing the 1 MB budget).

    Window layout: the glue-split ablations (docs/PERF.md rule 14) put
    the stage's fixed cost in XLA glue copies feeding the kernel, NOT in
    per-step window count — so the 8 per-pixel inputs ride separate
    windows straight from their producers (szidx/bg/ent i32, oy/oz/ivx/
    ivy/ivz f32; no stacking copy), while the cheap-to-concat small
    tables stay merged: the per-candidate i32 param tables as ``ptab``
    (cword/cmask/centi rows, or the 4 packed rows) and the per-block
    counts + sz ranges as ``meta`` (counts then interleaved [lo, hi) at
    offset ``meta_off``).

    ``lane_groups`` > 1 splits the block into that many 128-multiple lane
    tiles, each streaming its own (smaller) pruned candidate list — the
    vectorizable form of per-corridor candidate pruning (VERDICT #4).

    ``bitmap_ondemand``: build each membership word's (R, gw) pixel tile
    lazily inside the word-change refresh (a tile's candidates touch only
    ~half the words, and the lazy build replaces the word-cache's dynamic
    multi-vreg ``bitmap_scr[word]`` read with cheap single-row table
    reads) instead of prebuilding all ``n_words`` tiles up front.  Exact
    either way — the refresh reproduces exactly the select chain the
    prebuild runs for that word.
    """
    if no_lists:
        # All-visits mode: the visit index IS the candidate index (the
        # member test zeroes tile-irrelevant candidates, so skipping the
        # relevance/list machinery is exact) — no lists operand at all.
        lists_ref = None
    else:
        lists_ref, *rest = rest
    if member_expand:
        mtab_ref, msel_ref = rest[:2]
        rest = rest[2:]
        trow_refs = tbg_refs = ()
    else:
        mtab_ref = msel_ref = None
        nt = 2 if trow_halves else 1
        trow_refs = rest[:nt]
        tbg_refs = rest[nt:2 * nt]
        rest = rest[2 * nt:]
    if ray_bands is not None:
        # In-kernel ray-dot mode (shade + pick2 only): the Lambert dot
        # derives from the picks + the frame's light scalars — no dot
        # window at all.
        n_pix = 5
    else:
        n_pix = ((6 if pick2 else 7) if shade is not None else 5) \
            if winner_inputs else 8
    pix_refs = rest[:n_pix]
    out_ref = rest[n_pix]
    scratch = rest[n_pix + 1:]
    block = pl.program_id(1)
    g = pl.program_id(2)
    R = rows
    G = lane_groups
    gw = w_pad // G
    if packed_params and not no_lists:
        # This tile's row within the 8-tile lists band (see the driver's
        # lists BlockSpec).
        list_row = (block * G + g) % lists_ref.shape[1]
    else:
        list_row = None

    lane = (jax.lax.broadcasted_iota(jnp.int32, (R, gw), 1) + g * gw)
    ox = lane.astype(jnp.float32)
    for fb in range(frames):
        _shadow_frame_body(
            fb, block, g, list_row, ox, lane,
            meta_ref, ptab_ref, lists_ref, trow_refs, tbg_refs,
            mtab_ref, msel_ref, pix_refs, out_ref,
            scratch, w_pad=w_pad, rows=R, n_words=n_words, n_sz=n_sz,
            meta_off=meta_off, mq=mq,
            lane_groups=G, chunk=chunk, saturate=saturate,
            packed_params=packed_params, bitmap_ondemand=bitmap_ondemand,
            winner_inputs=winner_inputs, tab_sz_lo=tab_sz_lo,
            view_height=view_height, zmul=zmul, zshift=zshift,
            trow_halves=trow_halves, member_expand=member_expand,
            shade=shade, pick2=pick2, depth_static=depth_static,
            sprite_hw=sprite_hw, ray_bands=ray_bands, no_lists=no_lists)


def _shadow_frame_body(fb, block, g, list_row, ox, lane,
                       meta_ref, ptab_ref, lists_ref, trow_refs, tbg_refs,
                       mtab_ref, msel_ref, pix_refs, out_ref, scratch,
                       *, w_pad: int, rows: int, n_words: int, n_sz: int,
                       meta_off: int, mq: int,
                       lane_groups: int, chunk: int, saturate: bool,
                       packed_params: bool, bitmap_ondemand: bool,
                       winner_inputs: bool, tab_sz_lo: int,
                       view_height: int, zmul: int, zshift: int,
                       trow_halves: bool, member_expand: bool = False,
                       shade=None, pick2: bool = False, depth_static=None,
                       sprite_hw=None, ray_bands=None,
                       no_lists: bool = False, kernel_geom: bool = False,
                       sz_source: str = "meta"):
    """One frame's tile of the shadow kernel body (``fb`` indexes the
    frame within the grid step's frame block).

    ``kernel_geom`` (fused trace+shadow mode, ops/fused_pallas): the two
    packed picks arrive as the trace phase's OUTPUT refs and the inverse
    ray components derive in-kernel via the divkernel primitives — no
    per-pixel input windows at all.  ``sz_source`` selects where the
    block's [sz_lo, sz_hi) membership fold bounds come from: "meta"
    (the XLA block_sz_ranges hull, the unfused default), "reduce" (two
    whole-tile reduces over the winner-decoded szidx — the fused kernel
    cannot receive an XLA hull because it depends on the trace output),
    or "full" (the whole table range; always exact, more fold rows)."""
    if _ablate is not None and _ablate.startswith("empty"):
        # Pure floor bound: same grid + operand windows, no kernel work.
        # "emptyno<win>" variants additionally shrink one window in the
        # driver, isolating that window's per-step DMA/fill share.
        out_ref[fb] = jnp.ones(out_ref.shape[1:], jnp.int32)
        return
    if member_expand:
        mexp_scr, *scratch = scratch
    if bitmap_ondemand:
        (wcur_scr,) = scratch
    else:
        bitmap_scr, wcur_scr = scratch
    R = rows
    G = lane_groups
    gw = w_pad // G
    if winner_inputs:
        # Winner-direct mode: the trace kernel's masked packed picks (A, B)
        # ride straight in; every per-pixel shadow input derives in VMEM —
        # exactly the chain gbuffer_from_winners + light_geometry +
        # models/batched.py run in XLA, op for op:
        #   hit    = B >= 0                   (miss fields are KEY_MIN)
        #   sdep   = A & 31;  pz = (B >> 15) - 16384
        #   z      = hit ? pz + sdep : 0;  y = hit ? world_j - z : 0
        #   ent    = hit ? A >> 8 : 0
        #   bg     = (y + z) == 0  ==  !hit   (hits have world_j >= 1)
        #   oy/oz  = float(y/z)               (exact int converts)
        #   szidx  = clip(trunc_div(z, bin_size) - sz_lo, 0, SZ-1)
        # The int->f32 converts and truncating division replicate
        # cstyle exactly (z is int32; trunc = floor adjusted on z < 0).
        if kernel_geom:
            # Fused mode: the picks are the trace phase's output refs
            # (VMEM) and iv derives in-kernel — no iv windows.
            wa_ref, wb_ref = pix_refs
            wc_ref = dot_ref = None
            ivx_ref = ivy_ref = ivz_ref = None
        elif ray_bands is not None:
            # In-kernel ray-dot: no dot window (derived below from the
            # picks + this frame's light scalars in meta).
            wa_ref, wb_ref, ivx_ref, ivy_ref, ivz_ref = pix_refs
            wc_ref = dot_ref = None
        elif shade is not None and not pick2:
            (wa_ref, wb_ref, wc_ref, dot_ref,
             ivx_ref, ivy_ref, ivz_ref) = pix_refs
        elif shade is not None:
            # pick2 packs posx into A — no separate win_c window.
            (wa_ref, wb_ref, dot_ref,
             ivx_ref, ivy_ref, ivz_ref) = pix_refs
            wc_ref = None
        else:
            wa_ref, wb_ref, ivx_ref, ivy_ref, ivz_ref = pix_refs
        wa = wa_ref[fb]
        wb = wb_ref[fb]
        hit = wb >= 0
        jrow = block * R + jax.lax.broadcasted_iota(jnp.int32, (R, gw), 0)
        world_j = jnp.int32(view_height) - jrow
        if pick2:
            # Two-pick decode: A = (ent*8 + sid)*1024 + (posx + 512);
            # sdep re-derives from sid + row (and col for rect depth)
            # via the static depth decomposition — bit-identical to the
            # kernel-resolved sdep of the 3-pick mode.
            from .trace_pallas import static_sdep

            sid_w = (wa >> 10) & 7
            rowbase = (wb & 32767) - 16384
            srow = rowbase - world_j
            scol = lane - ((wa & 1023) - 512)
            sdep_w = static_sdep(depth_static, sid_w, srow, scol,
                                 sprite_hw=sprite_hw)
            z = jnp.where(hit, ((wb >> 15) - 16384) + sdep_w, 0)
            ent = jnp.where(hit, wa >> 13, 0)
        else:
            z = jnp.where(hit, ((wb >> 15) - 16384) + (wa & 31), 0)
            ent = jnp.where(hit, wa >> 8, 0)
        y = jnp.where(hit, world_j - z, 0)
        bg = ~hit
        oy = y.astype(jnp.float32)
        oz = z.astype(jnp.float32)
        # Truncating division by the (non-power-of-two) bin size as a
        # host-verified multiply-shift (zmul/zshift exact over the packed
        # |pz| + sdep range by construction — see trunc_div_magic).
        zq = lambda v: (v * zmul) >> zshift
        qz = jnp.where(z < 0, -zq(-z), zq(z))
        szidx = jnp.clip(qz - tab_sz_lo, 0, n_sz - 1)
    else:
        (szidx_ref, bg_ref, ent_ref, oy_ref, oz_ref,
         ivx_ref, ivy_ref, ivz_ref) = pix_refs
        oy = oy_ref[fb]
        oz = oz_ref[fb]
        szidx = szidx_ref[fb]
        bg = bg_ref[fb] > 0
        ent = ent_ref[fb]
    if kernel_geom:
        # In-kernel inverse ray components: exactly the
        # ops/shade.light_geometry(int_exact=True) chain —
        # rn_recip(rn_div_int) on the integer light deltas
        # (value-identical within the guarded L1 domain; callers reroute
        # violating frames, models/batched.py).  y/z/lane are the
        # winner-decoded values above, so the operands match the XLA
        # chain's bit for bit.  Reference: alternative.cpp:707-722.
        from .divkernel import rn_div_int, rn_recip

        ml = meta_ref.shape[2]
        lt0 = meta_ref[fb, 0, ml - 3]
        lt1 = meta_ref[fb, 0, ml - 2]
        lt2 = meta_ref[fb, 0, ml - 1]
        dxi = lt0 - lane
        dyi = lt1 - y
        dzi = lt2 - z
        ln = jnp.abs(dxi) + jnp.abs(dyi) + jnp.abs(dzi)
        ivx = rn_recip(rn_div_int(dxi, ln))
        ivy = rn_recip(rn_div_int(dyi, ln))
        ivz = rn_recip(rn_div_int(dzi, ln))
    elif _ablate == "noiv":
        # Timing-only dummy iv (see the driver's window shrink).
        ivx = jnp.broadcast_to(ivx_ref[fb, :1], (R, gw))
        ivy = jnp.broadcast_to(ivy_ref[fb, :1], (R, gw))
        ivz = jnp.broadcast_to(ivz_ref[fb, :1], (R, gw))
    else:
        ivx = ivx_ref[fb]
        ivy = ivy_ref[fb]
        ivz = ivz_ref[fb]

    notbg = ~bg
    if sz_source == "meta":
        sz_lo = meta_ref[fb, 0, meta_off + 2 * block]
        sz_hi = meta_ref[fb, 0, meta_off + 2 * block + 1]
    elif sz_source == "reduce":
        # Fused mode: the block's [sz_lo, sz_hi) fold bounds derive from
        # the winner-decoded szidx itself (two whole-tile reduces per
        # grid step) — the XLA hull needs the trace output, which never
        # leaves VMEM here.  The un-needs-gated hull is a superset of
        # the exact fold's range and covers EVERY notbg pixel's row, so
        # the word refresh selects the true member row for every pixel
        # (needs-excluded pixels may flip lit vs the gated hull, but
        # they shade to ambient either way — same final RGB).
        sz_lo = jnp.min(jnp.where(notbg, szidx, n_sz - 1))
        sz_hi = jnp.max(jnp.where(notbg, szidx, 0)) + 1
    else:
        assert sz_source == "full"
        sz_lo = jnp.int32(0)
        sz_hi = jnp.int32(n_sz)

    if member_expand:
        # Kernel-side lane expansion of this block's bin-row membership
        # table: ONE MXU contraction per grid step expands the SMALL
        # (2*(SZ+1)*nw, KXP) start-space table over this tile's lanes —
        # exactly the 0/1 selection matmul the XLA lane_member_tables ran
        # per frame, at HIGHEST precision (16-bit word halves; a default
        # bf16 pass would truncate them).  The ~7 MB/frame the XLA
        # expansion wrote to HBM (and the kernel's t_row windows read
        # back) never materialises; the expanded rows live in VMEM
        # scratch for the word-change reads below.
        mt = mtab_ref.shape[2]
        half = mt // 2
        flat = mtab_ref[fb, 0].astype(jnp.float32)
        exp = jax.lax.dot_general(
            flat, msel_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        ei = exp.astype(jnp.int32)
        mexp_scr[:] = (ei[:half].astype(jnp.uint32)
                       | (ei[half:].astype(jnp.uint32) << jnp.uint32(16)))

        def trow_row(ridx):
            return mexp_scr[pl.ds(ridx, 1), :]

        def tbg_row(widx):
            # Background start rows sit at sz index n_sz of the small
            # table (member_row_tables_small row layout).
            return mexp_scr[pl.ds(n_sz * n_words + widx, 1), :]
    else:
        def trow_row(ridx):
            """One lane row of the bin-row membership table (halves
            OR'd)."""
            if trow_halves:
                return (trow_refs[0][fb, 0, pl.ds(ridx, 1), :]
                        | (trow_refs[1][fb, 0, pl.ds(ridx, 1), :]
                           << jnp.uint32(16)))
            return trow_refs[0][fb, 0, pl.ds(ridx, 1), :]

        def tbg_row(widx):
            """One lane row of the background membership table."""
            if trow_halves:
                return (tbg_refs[0][fb, pl.ds(widx, 1), :]
                        | (tbg_refs[1][fb, pl.ds(widx, 1), :]
                           << jnp.uint32(16)))
            return tbg_refs[0][fb, pl.ds(widx, 1), :]

    if not bitmap_ondemand:
        # Build this tile's per-pixel membership bitmap in VMEM: select the
        # lane-vector of words by each pixel's sz (or the background row).
        # A block's pixels span only a few of the n_sz table rows (wy+wz is
        # near-constant within a bin row), so the select chain runs a
        # dynamic fori_loop over the block's actual [sz_lo, sz_hi) range
        # (from SMEM) instead of all n_sz cases statically.
        for w in range(n_words):
            bitmap_scr[w] = jnp.where(bg, tbg_row(w),
                                      jnp.uint32(0))
        # Dedicated always-zero word: padded/invalid candidates index it.
        bitmap_scr[n_words] = jnp.zeros((R, gw), jnp.uint32)

        def sz_body(s, _):
            mask = notbg & (szidx == s)
            for w in range(n_words):
                rowvec = trow_row(s * n_words + w)
                bitmap_scr[w] = jnp.where(mask, rowvec, bitmap_scr[w])
            return _

        jax.lax.fori_loop(sz_lo, sz_hi, sz_body, 0)

    def chunk_body(i, carry):
        # Candidates stream in unrolled chunks through this tile's *pruned*
        # index list (lists_ref, SMEM); all parameter reads are scalar
        # loads.  Overshoot past the count is harmless: tail candidates are
        # real but tile-irrelevant (their membership bits are zero for
        # every pixel here), and padded/invalid candidates point at the
        # dedicated always-zero bitmap word.
        occ, prev_word = carry
        c0 = i * chunk

        for cc in range(chunk):
            m = c0 + cc
            if _ablate == "nobody":
                # Loop skeleton only: list load + one vector op per visit.
                c = m if no_lists else lists_ref[fb, 0, 0, m // 128,
                                                 m % 128]
                occ = occ | (ent == c).astype(jnp.int32)
                continue
            if _ablate == "noloads":
                # Full vector work, zero scalar loads: constant params.
                c = m
                word_c = jnp.int32(0)
                mask_c = jnp.int32(1)
                px = py = pz = jnp.float32(-1.0)
                qx = qy = qz = jnp.float32(1.0)
                ent_c = jnp.int32(0)
            elif packed_params:
                # Flat-minor SMEM tables + bit-packed params: 5 scalar
                # loads per candidate (vs 10) with single-op addressing —
                # the ablation profile shows the kernel is fixed-cost
                # bound per visit, so scalar-load count is the budget.
                # wordent = word << 18 | ent; boxa/boxb = 10-bit-field
                # packed corners + 512 (bounds host-proved by
                # box_pack_ok; out-of-range scenes use the unpacked
                # layout).  The lists block holds an 8-tile band; this
                # tile's row is (block*G + g) % band.  ptab rows:
                # 0=wordent, 1=mask, 2=boxa, 3=boxb.
                c = m if no_lists else lists_ref[fb, list_row, m]
                we = ptab_ref[fb, 0, c]
                word_c = we >> 18
                ent_c = we & jnp.int32(0x3ffff)
                mask_c = ptab_ref[fb, 1, c]
                ba = ptab_ref[fb, 2, c]
                bb = ptab_ref[fb, 3, c]
                px = ((ba & 1023) - 512).astype(jnp.float32)
                py = (((ba >> 10) & 1023) - 512).astype(jnp.float32)
                pz = ((ba >> 20) - 512).astype(jnp.float32)
                qx = ((bb & 1023) - 512).astype(jnp.float32)
                qy = (((bb >> 10) & 1023) - 512).astype(jnp.float32)
                qz = ((bb >> 20) - 512).astype(jnp.float32)
            else:
                # ptab row bands: cword [0, mq), cmask [mq, 2mq),
                # centi [2mq, 3mq), box corners [3mq, 3mq + M/16).
                c = m if no_lists else lists_ref[fb, 0, 0, m // 128,
                                                 m % 128]
                word_c = ptab_ref[fb, c // 128, c % 128]
                mask_c = ptab_ref[fb, mq + c // 128, c % 128]
                # Scalar loads from the SMEM tables: scalars broadcast
                # freely into the [R, gw] vector math (vector extracts
                # would need a both-dims broadcast, which Mosaic lacks).
                # Candidate c's box corners live at flat [c*8, c*8+6) of
                # the 128-minor band — 8 | 128, so one candidate's
                # fields share a row.  Corners are integral world coords
                # stored i32; the scalar int->f32 convert is exact.
                bq = 3 * mq + c // 16
                br = (c % 16) * 8
                px = ptab_ref[fb, bq, br].astype(jnp.float32)
                py = ptab_ref[fb, bq, br + 1].astype(jnp.float32)
                pz = ptab_ref[fb, bq, br + 2].astype(jnp.float32)
                qx = ptab_ref[fb, bq, br + 3].astype(jnp.float32)
                qy = ptab_ref[fb, bq, br + 4].astype(jnp.float32)
                qz = ptab_ref[fb, bq, br + 5].astype(jnp.float32)
                ent_c = ptab_ref[fb, 2 * mq + c // 128, c % 128]

            if _ablate == "nomember":
                member = jnp.ones((R, gw), jnp.bool_)
            else:
                # Word-change caching: candidate lists come out of a
                # stable compaction of (bin, slot)-ordered candidates, so
                # word_c is (mostly) nondecreasing along the list — the
                # dynamic bitmap_scr[word] read (measured costlier than
                # the whole slab test at G=2) runs only when the word
                # changes; the common case re-reads the staged copy at a
                # static address.  Exact for ANY order: after the
                # predicated refresh wcur always equals
                # bitmap_scr[word_c].
                @pl.when(word_c != prev_word)
                def _():
                    if bitmap_ondemand:
                        # Lazy build: reproduce the prebuild's select chain
                        # for just this word.  Padded candidates (word_c ==
                        # n_words, mask 0) clamp to a real word — their
                        # member test is killed by the zero mask, so any
                        # tile contents are fine.  Single-row table reads
                        # at a dynamic index are cheap (1 x gw); the
                        # prebuild era's dynamic bitmap_scr[word_c] read
                        # moved a whole (R, gw) tile instead.
                        wc = jnp.minimum(word_c, jnp.int32(n_words - 1))
                        t = jnp.where(bg, tbg_row(wc),
                                      jnp.uint32(0))

                        def sz_acc(s, t):
                            # "notrow" ablation: the driver passes an
                            # 8-row dummy t_row window — keep the loop and
                            # dynamic-row-read structure, clamp the index.
                            ridx = s * n_words + wc
                            if _ablate == "notrow":
                                ridx = ridx % 8
                            rowvec = trow_row(ridx)
                            return jnp.where(notbg & (szidx == s), rowvec,
                                             t)

                        wcur_scr[:] = jax.lax.fori_loop(sz_lo, sz_hi,
                                                        sz_acc, t)
                    else:
                        wcur_scr[:] = bitmap_scr[word_c]

                prev_word = word_c
                w = wcur_scr[:]
                # Merged-candidate occupancy: any occupied bin's bit set.
                member = (w & mask_c.astype(jnp.uint32)) != jnp.uint32(0)

            if _ablate == "noslab":
                hit = member
            else:
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
        return occ, prev_word

    n = meta_ref[fb, 0, block * G + g]
    occ0 = jnp.zeros((R, gw), jnp.int32)
    # prev_word starts at an impossible value so the first candidate
    # always stages its word.
    carry0 = (occ0, jnp.int32(-1))
    n_chunks = (n + chunk - 1) // chunk
    if saturate:
        # Tile saturation early-out: once every pixel is occluded no
        # further candidate can change the result (occlusion is an OR) —
        # the tile-level form of the reference's first-hit short-circuit
        # (alternative.cpp:490-493).  MEASURED 15x SLOWER on v5e (0.92 ->
        # 13.98 ms/frame): the per-chunk vector->scalar reduce in the
        # while_loop condition serializes the Mosaic pipeline.  Kept as an
        # opt-in for future hardware; default off.
        def cond_fn(st):
            i, (occ, _) = st
            return (i < n_chunks) & (jnp.min(occ) < 1)

        def body_fn(st):
            i, carry = st
            return i + 1, chunk_body(i, carry)

        _, (occluded, _) = jax.lax.while_loop(cond_fn, body_fn,
                                              (jnp.int32(0), carry0))
    else:
        occluded, _ = jax.lax.fori_loop(0, n_chunks, chunk_body, carry0)
    if shade is None:
        out_ref[fb] = jnp.where(occluded > 0, 0, 1).astype(jnp.int32)
        return
    # Shade-in-kernel epilogue (winner-input mode only): the final pixel
    # never leaves VMEM as a separate lit mask — the kernel emits packed
    # RGB (r | g<<8 | b<<16) and the XLA epilogue only unpacks.  Every
    # float op replicates ops/shade.py (factor_from_dot) and the
    # gbuffer_from_winners rects/palette select chains, op for op, on the
    # same operand values: ``dot`` rides in as the SAME materialised f32
    # buffer the XLA shade would read, ``lit`` is the kernel's own
    # occlusion result, color values are static palette entries.
    # Reference lighting loop: alternative.cpp:702-760; u8 truncation
    # sprites.hpp:8-16.
    rects, palette_rgb, background, ambient = shade
    f32 = jnp.float32
    if ray_bands is None:
        dot = dot_ref[fb]
    else:
        # In-kernel Lambert dot: correctly-rounded towards-light
        # components (ops/divkernel.rn_div_int == cstyle.exact_f32_div on
        # this operand class, exhaustively verified) through the SAME
        # two-band select chain as trace_pallas.winner_dot — the (F, h,
        # w_pad) f32 dot buffer the shade window forced XLA to
        # materialise never exists.  Callers guard the division domain
        # (max L1 length < 2^13) and reroute hostile frames.  Reference
        # float sequence: alternative.cpp:707-722, 744-747.
        from .divkernel import rn_div_int

        # Light scalars ride the tail of the meta row (see
        # shadow_call_batched's meta concat).
        lt0 = meta_ref[fb, 0, meta_ref.shape[2] - 3]
        lt1 = meta_ref[fb, 0, meta_ref.shape[2] - 2]
        lt2 = meta_ref[fb, 0, meta_ref.shape[2] - 1]
        dxi = lt0 - lane
        dyi = lt1 - y
        dzi = lt2 - z
        ln = jnp.abs(dxi) + jnp.abs(dyi) + jnp.abs(dzi)
        tl0 = rn_div_int(dxi, ln)
        tl1 = rn_div_int(dyi, ln)
        tl2 = rn_div_int(dzi, ln)
        splits, tops, fronts = ray_bands
        dot = jnp.zeros((R, gw), f32)
        for k in range(len(splits)):
            def _arm(n):
                return (f32(n[0]) * tl0 + f32(n[1]) * tl1
                        + f32(n[2]) * tl2)

            nk = jnp.where(srow < int(splits[k]), _arm(tops[k]),
                           _arm(fronts[k]))
            dot = jnp.where(hit & (sid_w == k), nk, dot)
    lit = occluded == 0
    amb = f32(ambient)
    # c_max(0, dot): where(0 < dot, dot, 0) — NaN dots keep 0.
    diffuse = jnp.where(f32(0.0) < dot, dot, f32(0.0))
    s = diffuse + amb
    # c_min(1, s): where(s < 1, s, 1).
    bright = jnp.where(s < f32(1.0), s, f32(1.0))
    factor = jnp.where(lit, bright, amb)
    # Winner attribute decode (same fields gbuffer_from_winners reads).
    if pick2:
        sid = sid_w                   # srow/scol already decoded above
    else:
        sid = (wa >> 5) & 7
        rowbase = (wb & 32767) - 16384
        srow = rowbase - world_j
        scol = lane - wc_ref[fb]
    cidx = jnp.zeros((R, gw), jnp.int32)
    for (sk, r0, r1, c0, c1, value) in rects:
        in_rect = ((sid == sk) & (srow >= r0) & (srow < r1)
                   & (scol >= c0) & (scol < c1))
        cidx = jnp.where(in_rect, value, cidx)
    chans = []
    for ch in range(3):
        cv = jnp.full((R, gw), f32(background[ch]))
        for k in range(len(palette_rgb)):
            cv = jnp.where(hit & (cidx == k), f32(palette_rgb[k][ch]), cv)
        # trunc(color * factor) — f32 -> i32 truncates toward zero, same
        # as the reference's u8 cast for these in-range values.
        chans.append((cv * factor).astype(jnp.int32))
    out_ref[fb] = chans[0] | (chans[1] << 8) | (chans[2] << 16)


def shadow_call_batched(blk_counts, blk_szrange, cword, cmask, lists, box,
                        centi,
                        t_row, t_bg, szidx, bg, start_ent, oy, oz,
                        ivx, ivy, ivz,
                        config: RenderConfig, tables: ShadowTables,
                        rows_per_block: int = 8,
                        lane_groups: int = 1,
                        chunk: int = 8,
                        saturate: bool = False,
                        packed_params: bool = False,
                        bitmap_ondemand: bool | None = None,
                        frames_per_block: int | None = None,
                        winners=None, member_small=None,
                        shade=None, pick2: bool = False,
                        depth_static=None, ray_bands=None,
                        lights=None, no_lists: bool = False) -> jax.Array:
    """Launch the shadow kernel on a (frame_blocks, row_blocks) grid.

    ``member_small``: (F, n_sy, 2*(SZ+1)*nw, KXP) int32 small membership
    tables (``member_row_tables_small``) — the kernel expands each
    block's bin row over lanes itself on the MXU and ``t_row``/``t_bg``
    may be None: the lane-expanded tables (the compiled program's two
    largest HBM buffers) never materialise.

    ``shade`` (winner-input mode only): (dot, win_c, rects, palette_rgb,
    background, ambient) — the kernel shades its tile in VMEM and the
    output becomes PACKED RGB int32 (r | g<<8 | b<<16) instead of the
    lit mask; ``dot`` is the (F, h, w_pad) f32 Lambert dot (the same
    buffer the XLA shade would read), ``win_c`` the trace kernel's posx
    pick, and the rest static host values (color_rects decomposition,
    palette RGB rows, background RGB, ambient).

    ``winners``: (A, B) masked packed trace picks (F, h, w_pad) i32 — the
    winner-direct input mode: the kernel derives every per-pixel shadow
    input (start entity, origin, background flag, sz table row) from the
    packed fields in VMEM, and ``szidx``/``bg``/``start_ent``/``oy``/``oz``
    may be passed as None (five HBM pixel buffers and their producing XLA
    passes disappear).  Requires the trace side's masked packed picks
    (hit == B >= 0) and full-frame blocks (no row-shard ``row0``).

    ``t_row``/``t_bg`` may each be an (lo, hi) uint32 half pair (from
    ``lane_member_tables(halves=True)``): the kernel ORs the halves at
    its word-change row reads, skipping the XLA combine pass.

    Every argument leads with the frame axis F (single-frame callers pass
    F=1); with ``lane_groups`` G > 1 each row block carries G per-lane-tile
    candidate lists:
      blk_counts (F, NB*G) i32, blk_szrange (F, NB*2) i32 (per-block
      [sz_lo, sz_hi) bounds of the non-background pixels' table rows),
      cword/cmask (F, Mq, 128) i32 (membership word + occupied-bin bits),
      lists (F, NB, G*Mq, 128) i32, box (F, M//16, 128) f32 (packed
      corners), centi (F, Mq, 128) i32,
      t_row (F, n_sy, SZ*nw, w_pad) u32, t_bg (F, nw, w_pad) u32,
      pixel inputs (F, h, w_pad).
    Returns lit (F, h, w_pad) int32 (1 = reachable).

    ``packed_params``: bit-packed flat-minor candidate tables instead
    (from ``candidate_param_tables_packed``; bounds host-proved by
    ``box_pack_ok``): cword := wordent (F, 1, M) i32, cmask (F, 1, M)
    i32, lists (F, NB, G, M) i32, box := boxa (F, 1, M) i32,
    centi := boxb (F, 1, M) i32.

    ``bitmap_ondemand``: lazy per-word bitmap build inside the kernel's
    word-change refresh (see ``_shadow_kernel``); None takes the module
    default ``BITMAP_ONDEMAND`` (profiling tools flip it to A/B both
    compiled variants).

    ``frames_per_block``: frames shaded per grid step (must divide F).
    The kernel's ~17 operand windows give each grid step a fixed cost
    comparable to a whole tile's candidate work; batching frames into one
    step amortises it (same bytes, 1/FB the steps).  None picks the
    largest divisor of F up to the module default ``FRAMES_PER_BLOCK``
    that fits the VMEM budget.
    """
    if bitmap_ondemand is None:
        bitmap_ondemand = BITMAP_ONDEMAND
    cfg = config
    member_expand = member_small is not None
    if member_expand:
        trow_halves = False
        trows, tbgs = (), ()
    else:
        trow_halves = isinstance(t_row, tuple)
        trows = t_row if trow_halves else (t_row,)
        tbgs = t_bg if trow_halves else (t_bg,)
    F, H, w_pad = (winners[0] if winners is not None else oy).shape
    R = rows_per_block
    G = lane_groups
    NB = H // R
    SZ = tables.sz_hi - tables.sz_lo
    if member_expand:
        n_words = member_small.shape[2] // (2 * (SZ + 1))
        assert member_small.shape[2] == 2 * (SZ + 1) * n_words
    else:
        n_words = tbgs[0].shape[1]
    assert shade is None or winners is not None, \
        "shade-in-kernel requires winner-direct inputs"
    assert not pick2 or (winners is not None and depth_static is not None), \
        "pick2 winner inputs need the static depth decomposition"
    assert ray_bands is None or (shade is not None and pick2
                                 and lights is not None), \
        "in-kernel ray-dot needs shade-in-kernel + pick2 + light scalars"
    if packed_params:
        M = cword.shape[2]
        Mq = M // 128
    else:
        Mq = cword.shape[1]
        M = Mq * 128
    # The t_row index map (block // bpr) selects each block's bin-row
    # membership table; a non-dividing R would silently pick wrong rows.
    assert cfg.bin_size % R == 0 and H % R == 0, \
        "rows_per_block must divide both bin_size and the row count"
    bpr = cfg.bin_size // R            # row blocks per bin row
    assert w_pad % (G * 128) == 0, "lane groups must be 128-lane multiples"

    assert M % chunk == 0, "chunk must divide the candidate capacity"
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    gw = w_pad // G

    # Per-step VMEM for one frame's windows (x2 for Mosaic's double
    # buffering): pixel inputs + the output block + the bin-row/bg
    # membership tables.
    if ray_bands is not None:
        n_pix = 5
    else:
        n_pix = ((6 if pick2 else 7) if shade is not None else 5) \
            if winners is not None else 8
    frame_bytes = 2 * 4 * ((n_pix + 1) * R * gw
                           + (0 if member_expand else
                              (2 if trow_halves else 1)
                              * (SZ + 1) * n_words * gw))
    FB = frames_per_block
    if FB is None:
        FB = max(1, min(FRAMES_PER_BLOCK, (10 << 20) // frame_bytes))
        while F % FB:
            FB -= 1
    assert F % FB == 0, "frames_per_block must divide the frame count"

    # Winner-input mode: exact multiply-shift constants for the in-kernel
    # truncating division by bin_size (|z| <= 2^14 + 31 under the packed
    # pick bounds the mode requires).
    zmul, zshift = (trunc_div_magic(cfg.bin_size, (1 << 14) + 32)
                    if winners is not None else (0, 0))

    kernel = functools.partial(_shadow_kernel, w_pad=w_pad, rows=R,
                               n_words=n_words, n_sz=SZ, lane_groups=G,
                               meta_off=NB * G, mq=Mq,
                               chunk=chunk, saturate=saturate,
                               packed_params=packed_params,
                               bitmap_ondemand=bitmap_ondemand, frames=FB,
                               trow_halves=trow_halves,
                               winner_inputs=winners is not None,
                               tab_sz_lo=tables.sz_lo,
                               view_height=cfg.view_height,
                               zmul=zmul, zshift=zshift,
                               member_expand=member_expand,
                               shade=None if shade is None else shade[2:],
                               pick2=pick2, depth_static=depth_static,
                               sprite_hw=(cfg.sprite_height,
                                          cfg.sprite_width),
                               ray_bands=ray_bands, no_lists=no_lists)

    # Window layout: the glue-split ablations (docs/PERF.md rule 14) showed
    # the stage floor is XLA glue (pad/stack copies feeding the kernel),
    # NOT per-step window count — so the per-pixel inputs ride separate
    # windows straight from their producers (no stacking copy), while the
    # small broadcast tables (counts + sz ranges; the i32 param tables) are
    # merged host-side where the concat is cheap.
    if winners is not None:
        if ray_bands is not None:
            pixels = (winners[0], winners[1], ivx, ivy, ivz)
        elif shade is not None and pick2:
            pixels = (winners[0], winners[1], shade[0], ivx, ivy, ivz)
        elif shade is not None:
            pixels = (winners[0], winners[1], shade[1], shade[0],
                      ivx, ivy, ivz)
        else:
            pixels = (winners[0], winners[1], ivx, ivy, ivz)
    else:
        pixels = (szidx.astype(jnp.int32), bg.astype(jnp.int32),
                  start_ent.astype(jnp.int32), oy, oz, ivx, ivy, ivz)
    meta_parts = [blk_counts.astype(jnp.int32),
                  blk_szrange.astype(jnp.int32)]
    if ray_bands is not None:
        # Per-frame light scalars for the in-kernel ray-dot derivation.
        meta_parts.append(lights.astype(jnp.int32))
    meta = jnp.concatenate(meta_parts, axis=-1)[:, None, :]

    def pix():
        return pl.BlockSpec((FB, R, gw), lambda f, i, g: (f, i, g),
                            memory_space=pltpu.VMEM)

    n_smallpix = 0
    if _ablate == "noiv":
        # Timing-only: shrink the three inverse-direction windows to an
        # 8-row dummy (the body broadcasts row 0) — quantifies the iv
        # windows' share of the FULL kernel's cost (iteration counts and
        # every other operand are unchanged; only slab-test values are
        # wrong, which does not alter any loop bound).
        pixels = pixels[:-3] + tuple(a[:, :8, :] for a in pixels[-3:])
        n_smallpix = 3

        def smallpix():
            return pl.BlockSpec((FB, 8, gw), lambda f, i, g: (f, 0, g),
                                memory_space=pltpu.VMEM)

    # Capped top-k lists (candidate_lists_from_relc(cap=...)) arrive
    # narrower than M; the list table depth rides its own shape.
    L = M if no_lists else lists.size // (F * NB * G)
    assert L % chunk == 0, "chunk must divide the list capacity"
    if no_lists:
        # All-visits mode: no list table at all — the kernel visits every
        # candidate slot in index order (callers pass blk_counts = the
        # live candidate count).
        if packed_params:
            ptab = jnp.stack([cword[:, 0], cmask[:, 0], box[:, 0],
                              centi[:, 0]], axis=1)
            param_specs = [
                pl.BlockSpec((FB, 4, M), lambda f, i, g: (f, 0, 0),
                             memory_space=pltpu.SMEM)]
        else:
            ptab = jnp.concatenate([cword, cmask, centi,
                                    box.astype(jnp.int32)], axis=1)
            param_specs = [
                pl.BlockSpec((FB, 3 * Mq + M // 16, 128),
                             lambda f, i, g: (f, 0, 0),
                             memory_space=pltpu.SMEM)]
        param_ops = (ptab,)
    elif packed_params:
        # The lists block rides an 8-row band of the (F, NB*G, L) table:
        # a (1, 1, L) block would violate the TPU lowering rule (the
        # second-minor block dim must be 8-divisible or equal the array
        # dim); the kernel indexes its tile's row with (i*G + g) % 8.
        lb = 8 if (NB * G) % 8 == 0 else NB * G
        ptab = jnp.stack([cword[:, 0], cmask[:, 0], box[:, 0],
                          centi[:, 0]], axis=1)
        param_specs = [
            pl.BlockSpec((FB, 4, M), lambda f, i, g: (f, 0, 0),
                         memory_space=pltpu.SMEM),    # wordent/mask/boxa/b
            pl.BlockSpec((FB, lb, L),
                         lambda f, i, g: (f, (i * G + g) // lb, 0),
                         memory_space=pltpu.SMEM),    # pruned index lists
        ]
        param_ops = (ptab, lists.reshape(F, NB * G, L))
    else:
        # Box corners are integral world coordinates (entity positions and
        # extents are ints): stored i32 in the merged table, converted
        # back per scalar load in the kernel — exact both ways.
        ptab = jnp.concatenate([cword, cmask, centi,
                                box.astype(jnp.int32)], axis=1)
        param_specs = [
            pl.BlockSpec((FB, 3 * Mq + M // 16, 128),
                         lambda f, i, g: (f, 0, 0),
                         memory_space=pltpu.SMEM),    # ids + box corners
            pl.BlockSpec((FB, 1, 1, L // 128, 128),
                         lambda f, i, g: (f, i, g, 0, 0),
                         memory_space=pltpu.SMEM),    # pruned index lists
        ]
        param_ops = (ptab, lists.reshape(F, NB, G, L // 128, 128))

    # SMEM operands are buffered per grid step: whole tables must not ride
    # scalar prefetch (F x their size would blow the budget), but *blocked*
    # SMEM specs only buffer their few-KB block — counts, bin ids, and the
    # per-tile pruned candidate list use that.  Lane groups ride the third
    # grid axis: every pixel operand is lane-blocked to the tile.
    if _ablate in ("notrow", "emptynotrow") and not member_expand:
        # Timing-only: shrink the t_row window to an 8-row dummy to bound
        # the membership-table DMA share of the stage.
        assert bitmap_ondemand or _ablate == "emptynotrow"
        trows = tuple(t[:, :, :8] for t in trows)
        SZN = 8
    else:
        SZN = SZ * n_words

    if member_expand:
        from .trace_pallas import lane_select_matrix

        KXP = member_small.shape[3]
        MT = member_small.shape[2]
        selm = lane_select_matrix(cfg, w_pad)
        selm = jnp.pad(selm, ((0, KXP - selm.shape[0]), (0, 0)))
        member_ops = (member_small, selm)
        member_specs = [
            pl.BlockSpec((FB, 1, MT, KXP),
                         lambda f, i, g: (f, i // bpr, 0, 0),
                         memory_space=pltpu.VMEM),     # small member table
            pl.BlockSpec((KXP, gw), lambda f, i, g: (0, g),
                         memory_space=pltpu.VMEM),     # lane selection
        ]
        member_scratch = [pltpu.VMEM(((SZ + 1) * n_words, gw), jnp.uint32)]
    else:
        member_ops, member_specs, member_scratch = (), [], []

    # Timing-only "empty*" ablations: the empty kernel body reads no
    # operand, so shrinking individual windows (same grid, same body)
    # isolates each window's per-step DMA/fill share of the stage floor.
    emptyv = _ablate is not None and _ablate.startswith("empty")
    if emptyv and _ablate in ("emptynoptab", "emptynosmem"):
        param_ops = (param_ops[0][:, :8],) + param_ops[1:]
        param_specs[0] = pl.BlockSpec(
            (FB, 8, param_ops[0].shape[-1]), lambda f, i, g: (f, 0, 0),
            memory_space=pltpu.SMEM)
    if emptyv and _ablate in ("emptynolists", "emptynosmem") \
            and not packed_params and not no_lists:
        param_ops = (param_ops[0], param_ops[1][:, :, :, :1, :])
        param_specs[1] = pl.BlockSpec(
            (FB, 1, 1, 1, 128), lambda f, i, g: (f, i, g, 0, 0),
            memory_space=pltpu.SMEM)
    if emptyv and _ablate == "emptynopix":
        pixels = tuple(a[:, :8, :] for a in pixels)

        def pix():  # noqa: F811 — timing-only 8-row pixel windows
            return pl.BlockSpec((FB, 8, gw),
                                lambda f, i, g: (f, 0, g),
                                memory_space=pltpu.VMEM)
    if _ablate == "inputs":
        # Timing-only: assemble and READ every kernel operand (each .sum
        # forces materialisation + a full pass over the bytes) but never
        # launch the kernel — bounds the XLA glue (stacks/pads/builds)
        # plus one read of the operand bytes.  empty - inputs = the pure
        # kernel grid/window floor.
        cs = (meta.sum((1, 2))
              + sum(op.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
                    for op in param_ops)
              + sum(t.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    for t in trows)
              + sum(t.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    for t in tbgs)
              + sum(t.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    for t in member_ops[:1])
              + sum(a.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    for a in pixels))
        return jnp.broadcast_to(cs[:, None, None], (F, H, w_pad)).astype(
            jnp.int32)
    trow_spec = pl.BlockSpec((FB, 1, SZN, gw),
                             lambda f, i, g: (f, i // bpr, 0, g),
                             memory_space=pltpu.VMEM)
    tbg_spec = pl.BlockSpec((FB, n_words, gw), lambda f, i, g: (f, 0, g),
                            memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(F // FB, NB, G),
        in_specs=[
            # The unit middle axis keeps the SMEM block's trailing dims
            # equal to the array's (the TPU lowering requires it).
            pl.BlockSpec((FB, 1, meta.shape[2]),
                         lambda f, i, g: (f, 0, 0),
                         memory_space=pltpu.SMEM),    # counts + sz ranges
                                                      # (+ light scalars)
            *param_specs,
            *([trow_spec] * len(trows)),              # t_row (per bin row)
            *([tbg_spec] * len(tbgs)),                # t_bg
            *member_specs,                            # small table + sel
            *([pix()] * (len(pixels) - n_smallpix)
              + ([smallpix()] * n_smallpix if n_smallpix else [])),
        ],
        out_specs=pl.BlockSpec((FB, R, gw), lambda f, i, g: (f, i, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=(
            member_scratch
            + ([] if bitmap_ondemand
               else [pltpu.VMEM((n_words + 1, R, gw), jnp.uint32)])
            + [pltpu.VMEM((R, gw), jnp.uint32)]),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, H, w_pad), jnp.int32),
        interpret=interpret,
    )(meta, *param_ops, *trows, *tbgs, *member_ops, *pixels)


def block_sz_ranges(szidx, bg, view_width: int, rows_per_block: int,
                    n_sz: int, needs=None) -> jax.Array:
    """Per-row-block [lo, hi) bounds of the non-background pixels' sz
    table rows — the kernel's bitmap build loops only this range (a block
    spans ~3-4 of the ~18 rows).  Returns (NB*2,) i32 interleaved
    [lo0, hi0, lo1, hi1, ...]; all-background blocks get an empty range.

    ``needs`` (optional, like ``tile_candidate_relevance``): restrict the
    bounds to pixels whose output depends on the shadow result — excluded
    pixels keep a zero bitmap, which cannot change any visible pixel.
    """
    H = szidx.shape[0]
    NB = H // rows_per_block
    s = szidx[:, :view_width].reshape(NB, -1)
    m = bg[:, :view_width].reshape(NB, -1) == 0
    if needs is not None:
        m = m & (needs[:, :view_width].reshape(NB, -1) > 0)
    lo = jnp.min(jnp.where(m, s, n_sz), axis=1)
    hi = jnp.max(jnp.where(m, s + 1, 0), axis=1)
    return jnp.stack([lo, hi], axis=1).reshape(-1).astype(jnp.int32)


def candidate_param_tables(cands: Candidates, n_words: int):
    """Kernel-layout candidate parameter tables from a Candidates pytree.

    Returns (cword (Mq, 128) i32 membership-word index, cmask (Mq, 128)
    i32 occupied-bin bits, boxp (M//16, 128) f32, cent (Mq, 128) i32)
    with Mq = M // 128; candidate c's six box corners sit at flat positions
    [c*8, c*8+6) of boxp (8 | 128, so one candidate never straddles a
    row — the kernel reads them with single-row scalar loads).  All tables
    are 128-minor so they ride SMEM without padding blow-up (an
    (M, 8)-shaped SMEM window allocates lane-padded, 16x the bytes).
    Invalid or padded candidates point at the always-zero bitmap word with
    a zero mask and an impossible entity id.  Vmappable over a frame axis.
    """
    M = cands.bin.shape[0]
    cword = jnp.where(cands.valid, cands.bin // 32, n_words)
    cword = cword.astype(jnp.int32)
    cmask = jnp.where(cands.valid, cands.mask, 0).astype(jnp.int32)
    box = jnp.zeros((M, 8), jnp.float32)
    box = box.at[:, 0:3].set(cands.pmin).at[:, 3:6].set(cands.pmax)
    cent = jnp.where(cands.valid, cands.ent, -(10 ** 9)).astype(jnp.int32)
    return (cword.reshape(M // 128, 128), cmask.reshape(M // 128, 128),
            box.reshape(M // 16, 128), cent.reshape(M // 128, 128))


def candidate_param_tables_packed(cands: Candidates, n_words: int):
    """Bit-packed flat-minor candidate parameter tables.

    Returns (wordent, cmask, boxa, boxb), each (M,) int32:
      wordent = word << 18 | ent  (invalid candidates point at the
                always-zero bitmap word ``n_words`` with mask 0 — their
                entity bits are irrelevant because member is 0);
      boxa/boxb = 10-bit packed (x|y<<10|z<<20) box corners, biased +512.
    Callers must prove the value ranges host-side (``box_pack_ok``:
    ent < 2^18, all corner coords in [-512, 511]); scenes outside them
    use :func:`candidate_param_tables`.  The flat layout keeps the
    kernel's per-candidate SMEM loads at 5 (vs 10) with single-op
    addressing — the kernel is fixed-cost bound per candidate visit.
    Vmappable over a frame axis.
    """
    word = jnp.where(cands.valid, cands.bin // 32, n_words)
    we = ((word << 18) | jnp.where(cands.valid, cands.ent, 0))
    cmask = jnp.where(cands.valid, cands.mask, 0).astype(jnp.int32)
    p = cands.pmin.astype(jnp.int32) + 512
    q = cands.pmax.astype(jnp.int32) + 512
    boxa = p[:, 0] | (p[:, 1] << 10) | (p[:, 2] << 20)
    boxb = q[:, 0] | (q[:, 1] << 10) | (q[:, 2] << 20)
    return (we.astype(jnp.int32), cmask, boxa.astype(jnp.int32),
            boxb.astype(jnp.int32))


def box_pack_ok(scene, config: RenderConfig) -> bool:
    """Host-side range proof for ``candidate_param_tables_packed``.

    Candidates are binned entities, so their coordinates obey the
    binner's frustum-cull inequalities (ops/binning.py, mirroring
    alternative.cpp:212-219):
      px in (-ex, view_width),           qx < view_width + ex
      pz in [-2*ez - bin_size, view_length + bin_size],
                                         qz <= view_length + bin_size + ez
      py >= -ey - ez - view_length - bin_size   (from y1 >= -z1)
      qy <  view_height + 2*bin_size + 2*ez + ey (from y0 < vh - z0 + bs)
    with per-scene maximum extents — covering per-frame dynamic positions
    too (a moved entity outside the frustum is culled, never a candidate).
    Also requires ent < 2^18 for the wordent pack.
    """
    cfg = config
    ext = np.asarray(scene.ext).astype(np.int64)
    ex = int(ext[:, 0].max())
    ey = int(ext[:, 1].max())
    ez = int(ext[:, 2].max())
    bs = cfg.bin_size
    lo = min(-ex, -2 * ez - bs, -ey - ez - cfg.view_length - bs)
    hi = max(cfg.view_width + ex, cfg.view_length + bs + ez,
             cfg.view_height + 2 * bs + 2 * ez + ey)
    return bool(scene.n_entities < (1 << 18) and lo >= -512 and hi <= 511)


def trace_light_pallas(member, szidx, bg, start_ent, oy, oz, ivx, ivy, ivz,
                       cands: Candidates, config: RenderConfig,
                       tables: ShadowTables, rows_per_block: int = 8,
                       row0=0, lane_groups: int = 1) -> jax.Array:
    """Single-frame kernel driver (the F=1 case of the batched launch).

    Pixel inputs are (h, w_pad)-shaped (szidx is the clamped sz table index,
    bg marks background pixels); ``h`` may be a row-sharded window whose
    absolute first screen row is ``row0``.  Returns lit (h, w_pad) int32
    (1 = reachable)."""
    cfg = config
    H = oy.shape[0]
    w_pad = oy.shape[1]
    R = rows_per_block
    G = fit_lane_groups(w_pad, lane_groups, cfg, tables, R,
                        member_expand=False)

    member_words = pack_member_words(member)
    n_words = member_words.shape[1]
    t_row, t_bg = lane_member_tables(member_words, cfg, tables, R, w_pad,
                                     row0=row0, n_rows=H)
    relc = tile_candidate_relevance(member_words, szidx, bg, cands, cfg,
                                    tables, R, row0=row0, lane_groups=G)
    lists, blk_counts = candidate_lists_from_relc(relc)

    M = cands.bin.shape[0]
    assert M % 8 == 0
    cword, cmask, box, centi = candidate_param_tables(cands, n_words)
    SZ = tables.sz_hi - tables.sz_lo
    szr = block_sz_ranges(szidx, bg, cfg.view_width, R, SZ)

    lit = shadow_call_batched(
        blk_counts.reshape(-1)[None], szr[None], cword[None], cmask[None],
        lists.reshape(H // R, -1, 128)[None], box[None], centi[None],
        t_row[None], t_bg[None],
        szidx[None], bg[None], start_ent[None],
        oy[None], oz[None], ivx[None], ivy[None], ivz[None],
        cfg, tables, rows_per_block=R, lane_groups=G)
    return lit[0]
