"""Fused trace+shadow kernel: one Pallas launch runs primary visibility
AND shadow occlusion for every (frame, row-block) tile.

Why fuse: the round-3/4 empty-kernel ablations put both kernels'
residual cost in per-grid-step window/grid fixed cost rather than
compute (docs/PERF.md) — and at R == TR with one lane group the two
kernels already share the (F, row_blocks) grid and the (R, w_pad)
block shape, while the shadow kernel's winner-input mode reads exactly
the trace kernel's two packed-pick outputs.  Fusing them into one
kernel deletes one full set of per-step window setups, the picks' HBM
round trip (the shadow phase reads the pick OUTPUT refs — a Pallas
output window lives in VMEM), and every trace->shadow XLA glue pass:

  - candidate relevance + list compaction: all-visits mode
    (``shadow_no_lists``) — exact by the pruning's own argument (a
    tile-irrelevant candidate's membership bits are zero for every
    pixel of the tile);
  - the per-block [sz_lo, sz_hi) start-row hull: two whole-tile
    reduces over the winner-decoded szidx per grid step
    (``sz_source="reduce"`` in the shadow body);
  - the inverse ray components: in-kernel rn_recip(rn_div_int) — the
    exact ops/shade.light_geometry(int_exact=True) chain; callers
    guard the L1 light-distance domain and reroute violating frames
    (models/batched.py).

The kernel body is literally the two existing frame bodies called in
sequence (trace_pallas._trace_frame_body, then
shadow_pallas._shadow_frame_body in kernel_geom mode) — parity with
the unfused pipeline is structural, not re-derived.

Requirements (the batched driver gates on them): masked packed picks
(``trace_packed``), member-expand small tables, a point light per
frame, ``shadow_guard == "fallback"`` (for the divkernel domain
reroute), no trace compaction/slot-capping, and R == TR dividing the
bin size.  Reference fused per-frame loop: alternative.cpp:690-760.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from . import shadow_pallas, trace_pallas


# Mosaic's scoped-vmem stack is 16 MB; leave headroom for the compiler's
# own temporaries (the direct-keys trace variant already OOM'd the stack
# once at ~full budget, trace_pallas.py).  Shapes whose estimate exceeds
# this must take the two-kernel path (which lane-tiles the trace kernel).
VMEM_BUDGET_BYTES = 12 * 2 ** 20


def fused_vmem_bytes(config: RenderConfig, tables, rows_per_block: int,
                     w_pad: int, field_pack: bool = True,
                     kernel_expand: bool = False,
                     pick2: bool = True) -> int:
    """Estimated per-grid-step VMEM residency of the fused kernel.

    Mirrors ``fused_call_batched``'s scratch_shapes plus the pipelined
    input/output windows (x2 for double buffering).  Conservative on the
    small terms; exact on the dominant keys scratch (R*NC, w_pad).
    """
    cfg = config
    R = rows_per_block
    NC = cfg.hash_length * cfg.bin_capacity
    n_f = 7 if field_pack else 12
    SZ = tables.sz_hi - tables.sz_lo
    n_words = -(-cfg.hash_volume // 32)
    MT = 2 * (SZ + 1) * n_words
    KXP = 128                                   # lane-padded small minors
    scratch = (cfg.hash_length * R * w_pad      # mkey
               + cfg.hash_length * w_pad        # empty
               + R * NC * w_pad                 # keys (dominant)
               + (SZ + 1) * n_words * w_pad     # mexp
               + R * w_pad) * 4                 # wcur
    n_picks = 2 if pick2 else 3
    outs = 2 * (n_picks + 1) * R * w_pad * 4
    tab_minor = KXP if kernel_expand else w_pad
    tab_win = 2 * n_f * NC * tab_minor * 4
    msmall_win = 2 * MT * KXP * 4
    selm_win = KXP * w_pad * 4 * (2 if kernel_expand else 1)
    return scratch + outs + tab_win + msmall_win + selm_win


def fused_fits(config: RenderConfig, tables, rows_per_block: int,
               w_pad: int, field_pack: bool = True,
               kernel_expand: bool = False, pick2: bool = True) -> bool:
    """Host-side gate: does the fused kernel fit the VMEM budget?

    Callers (models/batched.py) fall back to the two-kernel path when
    this is False instead of hitting a Mosaic scoped-vmem compile error
    (VERDICT r4 #7); the trace kernel lane-tiles wide frames, the fused
    kernel deliberately does not.
    """
    return fused_vmem_bytes(config, tables, rows_per_block, w_pad,
                            field_pack, kernel_expand,
                            pick2) <= VMEM_BUDGET_BYTES


def _fused_kernel(row0_ref, meta_ref, ptab_ref, tab_ref, selm_ref, *rest,
                  config, rows: int, n_cands: int, nc2: int, w_pad: int,
                  segments, packed_fields: bool, pick2: bool,
                  kernel_expand: bool, sel_shared: bool,
                  n_words: int, n_sz: int, meta_off: int, mq: int,
                  chunk: int, packed_params: bool, tab_sz_lo: int,
                  view_height: int, zmul: int, zshift: int,
                  depth_static, sprite_hw, sz_source: str):
    """One grid step: trace this (frame, row-block) tile, then shadow it.

    The trace phase writes the packed picks straight into their OUTPUT
    refs; the shadow phase reads the same refs back as its winner
    inputs (output windows are VMEM — no HBM hop between the phases).
    """
    if kernel_expand and not sel_shared:
        seltr_ref, *rest = rest
    else:
        seltr_ref = selm_ref if kernel_expand else None
    msmall_ref, *rest = rest
    if pick2:
        a_ref, b_ref, lit_ref = rest[:3]
        c_ref = None
        scratch = rest[3:]
        trace_outs = (a_ref, b_ref)
    else:
        a_ref, b_ref, c_ref, lit_ref = rest[:4]
        scratch = rest[4:]
        trace_outs = (a_ref, b_ref, c_ref)
    mkey_scr, empty_scr, keys_scr, mexp_scr, wcur_scr = scratch
    R = rows

    # -- phase 1: primary visibility (trace_pallas._trace_frame_body) --
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 1)
    cand_i = jax.lax.broadcasted_iota(jnp.int32, (n_cands, w_pad), 0)
    trace_pallas._trace_frame_body(
        0, lane_i, cand_i, row0_ref, tab_ref,
        trace_outs + (mkey_scr, empty_scr, keys_scr),
        config=config, rows_per_block=R, n_cands=n_cands, nc2=nc2,
        segments=segments, compact=False, packed_picks=True,
        packed_fields=packed_fields, sel_ref=seltr_ref, pick2=pick2)

    # -- phase 2: shadow occlusion (shadow_pallas._shadow_frame_body) --
    block = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, w_pad), 1)
    ox = lane.astype(jnp.float32)
    shadow_pallas._shadow_frame_body(
        0, block, 0, None, ox, lane,
        meta_ref, ptab_ref, None, (), (),
        msmall_ref, selm_ref, (a_ref, b_ref), lit_ref,
        (mexp_scr, wcur_scr),
        w_pad=w_pad, rows=R, n_words=n_words, n_sz=n_sz,
        meta_off=meta_off, mq=mq, lane_groups=1, chunk=chunk,
        saturate=False, packed_params=packed_params,
        bitmap_ondemand=True, winner_inputs=True,
        tab_sz_lo=tab_sz_lo, view_height=view_height,
        zmul=zmul, zshift=zshift, trow_halves=False,
        member_expand=True, shade=None, pick2=pick2,
        depth_static=depth_static, sprite_hw=sprite_hw,
        ray_bands=None, no_lists=True, kernel_geom=True,
        sz_source=sz_source)


def fused_call_batched(tab, segments, blk_counts, lights, cword, cmask,
                       box, centi, member_small, config: RenderConfig,
                       tables, rows_per_block: int = 40, chunk: int = 8,
                       packed_params: bool = False, pick2: bool = False,
                       depth_static=None, kernel_expand: bool = True,
                       sz_source: str = "reduce"):
    """Launch the fused kernel on a (F, row_blocks) grid.

    ``tab``: the trace expansion tables (F, n_fields, HH, NC, KP)
    (pre-expansion when ``kernel_expand``, lane-expanded otherwise).
    ``blk_counts`` (F, NB) i32: live candidate count per block
    (all-visits mode).  ``lights`` (F, 3) i32: per-frame point-light
    scalars for the in-kernel geometry.  ``cword``/``cmask``/``box``/
    ``centi``: candidate param tables (packed layout iff
    ``packed_params``).  ``member_small``: (F, n_sy, 2*(SZ+1)*nw, KXP)
    small membership tables (``member_row_tables_small``).

    Returns (picks, lit): picks = (A, B) masked packed trace winners
    (pick2) or (A, B, C), each (F, H, w_pad) i32 — identical to
    ``trace_keys_pallas``'s outputs; lit (F, H, w_pad) i32.
    """
    cfg = config
    F = tab.shape[0]
    n_f = tab.shape[1]
    NC = tab.shape[3]
    KP = tab.shape[4]
    packed_fields = n_f <= 8
    assert n_f not in (13, 8), "fused mode takes uncompacted trace tables"
    nc2 = 1
    while nc2 < NC:
        nc2 *= 2
    w_pad = -(-cfg.view_width // 128) * 128
    H = cfg.view_height
    R = rows_per_block
    bs = cfg.bin_size
    assert H % R == 0 and bs % R == 0 and R % 8 == 0
    NB = H // R
    SZ = tables.sz_hi - tables.sz_lo
    MT = member_small.shape[2]
    KXP = member_small.shape[3]
    n_words = MT // (2 * (SZ + 1))
    assert MT == 2 * (SZ + 1) * n_words
    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    zmul, zshift = shadow_pallas.trunc_div_magic(bs, (1 << 14) + 32)

    est = fused_vmem_bytes(cfg, tables, R, w_pad,
                           field_pack=packed_fields,
                           kernel_expand=kernel_expand, pick2=pick2)
    if est > VMEM_BUDGET_BYTES:
        raise ValueError(
            f"fused kernel VMEM estimate {est / 2**20:.1f} MB exceeds the "
            f"{VMEM_BUDGET_BYTES / 2**20:.0f} MB budget at R={R}, "
            f"w_pad={w_pad}; use the two-kernel path (fused_fits gates "
            f"this in models/batched.py)")

    # meta: per-block counts + (placeholder) sz-range slots + the light
    # scalars.  The sz slots keep meta_off indexing identical to the
    # unfused kernel; sz_source="reduce" derives the real hull in-kernel.
    szr0 = jnp.zeros((F, 2 * NB), jnp.int32)
    meta = jnp.concatenate([blk_counts.astype(jnp.int32), szr0,
                            lights.astype(jnp.int32)], axis=-1)[:, None, :]

    if packed_params:
        ptab = jnp.stack([cword[:, 0], cmask[:, 0], box[:, 0],
                          centi[:, 0]], axis=1)
        M = ptab.shape[2]
        Mq = M // 128
        ptab_spec = pl.BlockSpec((1, 4, M), lambda f, i, g, *_: (f, 0, 0),
                                 memory_space=pltpu.SMEM)
    else:
        Mq = cword.shape[1]
        M = Mq * 128
        ptab = jnp.concatenate([cword, cmask, centi,
                                box.astype(jnp.int32)], axis=1)
        ptab_spec = pl.BlockSpec((1, 3 * Mq + M // 16, 128),
                                 lambda f, i, g, *_: (f, 0, 0),
                                 memory_space=pltpu.SMEM)
    assert M % chunk == 0

    # One lane-selection matrix serves both in-kernel MXU expansions when
    # the two small tables share a minor padding (they both pad the same
    # lane_select_matrix to their table's minor dim).
    selm = trace_pallas.lane_select_matrix(cfg, w_pad)
    sel_shared = (not kernel_expand) or (KP == KXP)
    selm_sh = jnp.pad(selm, ((0, KXP - selm.shape[0]), (0, 0)))

    meta_spec = pl.BlockSpec((1, 1, meta.shape[2]),
                             lambda f, i, g, *_: (f, 0, 0),
                             memory_space=pltpu.SMEM)
    tab_spec = pl.BlockSpec(
        (1, n_f, 1, NC, KP if kernel_expand else w_pad),
        lambda f, i, g, row0_ref: (f, 0, (row0_ref[0] + i * R) // bs,
                                   0, 0),
        memory_space=pltpu.VMEM)
    selm_spec = pl.BlockSpec((KXP, w_pad), lambda f, i, g, *_: (0, 0),
                             memory_space=pltpu.VMEM)
    msmall_spec = pl.BlockSpec((1, 1, MT, KXP),
                               lambda f, i, g, row0_ref:
                               (f, (row0_ref[0] + i * R) // bs, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [meta_spec, ptab_spec, tab_spec, selm_spec]
    operands = [meta, ptab, tab, selm_sh]
    if kernel_expand and not sel_shared:
        seltr = jnp.pad(selm, ((0, KP - selm.shape[0]), (0, 0)))
        in_specs.append(pl.BlockSpec((KP, w_pad),
                                     lambda f, i, g, *_: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(seltr)
    in_specs.append(msmall_spec)
    operands.append(member_small)

    n_picks = 2 if pick2 else 3
    out_spec = pl.BlockSpec((1, R, w_pad), lambda f, i, g, *_: (f, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((F, H, w_pad), jnp.int32)

    kernel = functools.partial(
        _fused_kernel, config=cfg, rows=R, n_cands=NC, nc2=nc2,
        w_pad=w_pad, segments=segments, packed_fields=packed_fields,
        pick2=pick2, kernel_expand=kernel_expand, sel_shared=sel_shared,
        n_words=n_words, n_sz=SZ, meta_off=NB, mq=Mq, chunk=chunk,
        packed_params=packed_params, tab_sz_lo=tables.sz_lo,
        view_height=cfg.view_height, zmul=zmul, zshift=zshift,
        depth_static=depth_static,
        sprite_hw=(cfg.sprite_height, cfg.sprite_width),
        sz_source=sz_source)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # row0 (always 0: full frames)
        grid=(F, NB, 1),
        in_specs=in_specs,
        out_specs=(out_spec,) * (n_picks + 1),
        scratch_shapes=[
            pltpu.VMEM((cfg.hash_length * R, w_pad), jnp.int32),
            pltpu.VMEM((cfg.hash_length, w_pad), jnp.int32),
            pltpu.VMEM((R * NC, w_pad), jnp.int32),
            pltpu.VMEM(((SZ + 1) * n_words, w_pad), jnp.uint32),
            pltpu.VMEM((R, w_pad), jnp.uint32),
        ],
    )
    row0 = jnp.zeros(1, jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape,) * (n_picks + 1),
        interpret=interpret,
    )(row0, *operands)
    return outs[:n_picks], outs[n_picks]
