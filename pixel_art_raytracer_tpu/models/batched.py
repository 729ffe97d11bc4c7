"""Whole-batch renderer: every per-frame stage batched over the frame axis.

The scan-based animation loop (models/animation.py) runs each frame's
pipeline as a separate scan step: the Pallas kernels launch per frame and
the XLA prep stages (bin merge scatters, membership simulation, candidate
compaction sorts, table expansion) run as many small ops — which on TPU are
overhead-bound (a v5e profile put the prep at ~1.4 of the 1.9 ms/frame).

This module restructures the same pipeline as a *phase decomposition* over
the whole batch:

  1. bins      — vmapped StaticBins.merge: one batched scatter for F frames.
  2. trace     — ONE Pallas launch on a (F, row_blocks) grid.
  3. prep      — light geometry, membership words, candidate compaction,
                 per-block pruned lists: vmapped, so each is one big op
                 (sorts/scatters parallelise over F x rows).
  4. shadow    — ONE Pallas launch on a (F, row_blocks) grid.
  5. shade     — batched elementwise brightness + palette scale.

Every stage reuses the single-frame functions (under ``jax.vmap`` or via
the kernels' frame-grid axis), so pixel parity with the scan path is
structural.  The reference's per-frame loop is alternative.cpp:628-817.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..ops import cstyle
from ..ops import shade as shade_ops
from ..ops import shadow_fast, shadow_pallas, trace_pallas


def _padw(a, w_pad):
    return jnp.pad(a, ((0, 0), (0, 0), (0, w_pad - a.shape[-1])))


def render_states_batched(renderer, static_bins, dscene, players, lights,
                          shadow_rows: int = 8,
                          trace_compact: int | None = None,
                          lane_groups: int = 1,
                          trace_rows: int = 8,
                          shadow_chunk: int = 8,
                          trace_slot_cap: int | None = None,
                          directional: bool = False,
                          upto: str | None = None) -> jax.Array:
    """Render F frames as one batched device program.

    ``renderer``: a DeferredRenderer configured for the scene (Pallas trace
    path and Pallas shadow impl required — AnimationRenderer falls back to
    the scan path otherwise).  ``static_bins``: StaticBins cache (or None
    for a vmapped full rebuild).  players: (F, 3) int32.  lights: (F, 3)
    int32 — or (F, L, 3) for additive multi-light shading (the framework
    extension of the reference's light *vector*, alternative.cpp:624-626):
    stages 3-4 (shadow prep + kernel) run once per light on the same
    (F, row_blocks) grid, and the per-light diffuse factors accumulate over
    the shared ambient base exactly as ops.shade.shade_multi.
    ``shadow_rows``: screen rows per shadow-kernel block (must divide the
    bin size and the view height; bigger blocks amortise the per-candidate
    scalar loads).  Returns (F, H, W, 3) uint8, pixel-identical to the
    scan path.

    ``upto`` (profiling only): stop after a stage and return a small
    checksum array instead of frames — one of "bins", "trace", "prep"
    (everything up to the shadow-kernel launch), "shadow"; multi-light
    applies them to the first light only.
    """
    r = renderer
    cfg: RenderConfig = r.config
    H, W = cfg.view_height, cfg.view_width
    w_pad = -(-W // 128) * 128
    R = shadow_rows
    if cfg.bin_size % R or H % R or R % 8:
        R = 8                       # sublane tiling needs 8 | R
    F = players.shape[0]
    f32 = jnp.float32

    tables = r.shadow_tables or shadow_fast.default_tables(
        cfg, max_steps=r.shadow_max_steps)
    SZ = tables.sz_hi - tables.sz_lo

    # -- 1. per-frame bin tables (one batched scatter) ----------------------
    dyn_pos = players[:, None, :]                         # (F, 1, 3)
    if static_bins is not None:
        assert static_bins.n_dynamic == 1, \
            "batched path drives entity 0 (the player); rebuild the cache"
        dyn_ext = jnp.broadcast_to(dscene.ext[:1], (F, 1, 3))
        bins_ent, counts = jax.vmap(static_bins.merge)(dyn_pos, dyn_ext)
    else:
        from ..ops import binning

        bins_ent, counts = jax.vmap(
            lambda p: binning.build_bins(dscene.pos.at[0].set(p),
                                         dscene.ext, cfg, r.spans))(players)

    if upto == "bins":
        return counts.reshape(F, -1).sum(axis=1, dtype=jnp.int32)

    # -- 2. primary visibility: one kernel launch for the whole batch -------
    r._traced = True
    params = (None if dscene.depth_d0 is None
              else (dscene.depth_d0, dscene.depth_slope))
    # Column-compaction needs the runtime overflow reroute (a lax.cond),
    # which vmapped contexts can't afford — require the guard.
    ncc = trace_compact if r.shadow_guard == "fallback" else None
    kexp = bool(getattr(r, "trace_kernel_expand", False))
    if upto in ("texp", "tkeys"):
        d0, slope, segs = trace_pallas._resolve_depth_params(
            dscene.atlas_color, params, r.depth_segments)
        ef = trace_pallas.entity_field_table(
            dscene.pos, dscene.ext, dscene.sprite_id, d0, slope,
            field_pack=r.trace_field_pack)
        tab = jax.vmap(
            lambda be, cnt, dp: trace_pallas._expand_tables(
                dscene.pos, dscene.ext, dscene.sprite_id, d0, slope,
                be, cnt, cfg, w_pad, dyn_pos=dp,
                field_pack=r.trace_field_pack, ent_fields=ef,
                expand=not kexp)
        )(bins_ent, counts, dyn_pos)
        if upto == "texp":
            # Sum in the table dtype (the _texp_upto profiling cuts return
            # f32 — a dtype=int32 sum would sneak a whole-array cast into
            # the measurement), cast only the per-frame scalar.
            return tab.reshape(F, -1).sum(axis=1).astype(jnp.int32)
        winners = trace_pallas.trace_keys_pallas(
            tab, cfg, segments=segs, rows_per_block=trace_rows,
            packed_picks=r.trace_packed, kernel_expand=kexp)
        return sum(wi.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
                   for wi in winners)

    # Winner-direct shadow inputs: with masked packed picks the shadow
    # kernel derives every per-pixel input from the trace winners (A, B)
    # in VMEM — five HBM pixel buffers (szidx/bg/ent/oy/oz) and their
    # producing XLA passes disappear.  Requires the packed-pick bounds
    # (r.trace_packed) and the point-light fast path (directional mode
    # extends the start space beyond what B encodes).
    winner_mode = bool(r.trace_packed
                       and getattr(r, "shadow_winner_inputs", True)
                       and not directional)
    # Shade-in-kernel (winner mode only): the shadow kernel emits packed
    # RGB and the lit mask, the XLA color chains, and the factor math
    # never materialise — see shadow_pallas._shadow_frame_body's shade
    # epilogue.  Multi-light accumulation needs per-light lit masks, the
    # dithered style re-quantises, and the texel-gather color path has no
    # static rect decomposition — all keep the lit-mask output.
    pick2 = bool(winner_mode and getattr(r, "trace_pick2", False))
    shade_capable = bool(winner_mode
                         and lights.ndim == 2
                         and r.style == "reference"
                         and r.color_rects is not None
                         and upto is None)
    # Fused trace+shadow kernel (ops/fused_pallas): ONE launch runs both
    # phases per (frame, row-block) grid step — the shadow phase reads
    # the trace phase's pick output refs in VMEM, derives iv in-kernel
    # (divkernel), discovers candidates all-visits style (no_lists), and
    # folds its own sz hull.  Requires the winner/packed machinery, a
    # point light per frame, the guard (divkernel domain reroute), no
    # trace compaction, and matching R == TR block shapes.
    fused = bool(winner_mode
                 and getattr(r, "fuse_trace_shadow", False)
                 and lights.ndim == 2
                 and r.shadow_guard == "fallback"
                 and upto is None
                 and ncc is None
                 and (trace_slot_cap is None
                      or trace_slot_cap >= cfg.bin_capacity)
                 and trace_rows == R
                 and cfg.bin_size % R == 0 and H % R == 0 and R % 8 == 0
                 and getattr(r, "shadow_member_expand", True)
                 and not getattr(r, "shadow_shade_kernel", False))
    if fused:
        # VMEM budget gate (VERDICT r4 #7): wide lane-tiled frames blow
        # the fused kernel's one-launch scratch (keys + bitmap +
        # expansion); fall back to the two-kernel path (whose trace
        # kernel lane-tiles) instead of a Mosaic compile error.
        from ..ops import fused_pallas as _fp

        fused = _fp.fused_fits(cfg, tables, R, w_pad,
                               field_pack=r.trace_field_pack,
                               kernel_expand=kexp, pick2=pick2)
    # In-kernel ray-dot (shade + pick2 + two-band normals): the kernel
    # derives the Lambert dot itself via correctly-rounded divisions
    # (ops/divkernel), so shade-in-kernel costs NO extra pixel window —
    # the dot buffer the plain shade-kernel mode had to materialise for
    # its window (the measured reason it lost) never exists.
    ray_dot = bool(shade_capable and pick2 and not fused
                   and r.normal_bands is not None
                   and r.shadow_guard == "fallback"
                   and getattr(r, "shadow_ray_dot", True))
    # Integer-exact light geometry (divkernel primitives instead of the
    # f64 emulation): value-identical within the guarded L1-distance
    # domain, and the division chains fuse instead of materialising f64
    # pixel buffers.  Needs the guard (hostile lights reroute).
    int_geom = bool(not directional and r.shadow_guard == "fallback"
                    and getattr(r, "shadow_int_geom", True))
    shade_kernel = bool(shade_capable
                        and (ray_dot
                             or getattr(r, "shadow_shade_kernel", False)))
    if fused:
        # Fused mode defers primary visibility to the fused kernel launch
        # inside light_pass_fused; stage 2 only builds the trace
        # expansion tables (the same prep trace_pixels_pallas_batched
        # runs before its kernel).
        d0f, slopef, segs_f = trace_pallas._resolve_depth_params(
            dscene.atlas_color, params, r.depth_segments)
        ef_f = trace_pallas.entity_field_table(
            dscene.pos, dscene.ext, dscene.sprite_id, d0f, slopef,
            field_pack=r.trace_field_pack)
        tab_f = jax.vmap(
            lambda be, cnt, dp: trace_pallas._expand_tables(
                dscene.pos, dscene.ext, dscene.sprite_id, d0f, slopef,
                be, cnt, cfg, w_pad, dyn_pos=dp,
                field_pack=r.trace_field_pack, ent_fields=ef_f,
                expand=not kexp)
        )(bins_ent, counts, dyn_pos)
        gbuf = None
    else:
        gbuf = trace_pallas.trace_pixels_pallas_batched(
            dscene.pos, dscene.ext, dscene.sprite_id, dscene.atlas_color,
            dscene.atlas_normal, dscene.palette, bins_ent, counts, dyn_pos,
            cfg, params, r.normal_bands, r.color_rects, r.depth_segments,
            n_compact=ncc, rows_per_block=trace_rows,
            packed_picks=r.trace_packed,
            slot_cap=None if ncc is not None else trace_slot_cap,
            field_pack=r.trace_field_pack, wide=True,
            return_winners=winner_mode, kernel_expand=kexp,
            pick2=pick2, depth_static=r.depth_static if pick2 else None)
    if winner_mode and not fused:
        gbuf, wpicks = gbuf
        win_a, win_b = wpicks[0], wpicks[1]
        win_c = None if pick2 else wpicks[2]

    if upto == "trace":
        mix = (gbuf.entity_index + gbuf.y + gbuf.z
               + gbuf.color.sum(-1).astype(jnp.int32)
               + gbuf.normal.sum(-1).astype(jnp.int32))
        return mix.reshape(F, -1).sum(axis=1, dtype=jnp.int32)

    # -- 3+4. shadow prep + kernel, once per light --------------------------
    if directional:
        assert lights.ndim == 2, "directional mode takes (F, 3) directions"
    multi = (not directional) and lights.ndim == 3
    lights_l = lights if multi else lights[:, None, :]
    L = lights_l.shape[1]

    # Light-independent pixel inputs (origin/ray-bin come out of the
    # geometry call but don't depend on the light; XLA CSEs the repeats —
    # directional mode feeds a dummy light, using only origin/rb).
    # Fused mode derives all of them in-kernel from the trace picks.
    if not fused:
        geom_light = (jnp.zeros((F, 3), jnp.int32) if directional
                      else lights_l[:, 0])
        _, _, origin, rb, _ = jax.vmap(
            lambda g, l: shade_ops.light_geometry(g, l, cfg, int_geom)
        )(gbuf, geom_light)
        szidx = _padw(jnp.clip(rb[2] - tables.sz_lo, 0, SZ - 1), w_pad)
        # Background pixels (zero G-buffer y/z, quirk Q6) use the aliased
        # background start row; wy+wz == world_j >= 1 for hits.
        bg = _padw(((gbuf.y + gbuf.z) == 0).astype(jnp.int32), w_pad)
        if not winner_mode:
            ent_p = _padw(gbuf.entity_index, w_pad)
            oy_p, oz_p = _padw(origin[1], w_pad), _padw(origin[2], w_pad)
    G = shadow_pallas.fit_lane_groups(
        w_pad, lane_groups if w_pad % (lane_groups * 128) == 0 else 1,
        cfg, tables, R,
        member_expand=bool(getattr(r, "shadow_member_expand", True)))

    def light_pass(lights_f, upto=None):
        """Stages 3-4 for one (F, 3) light set -> (dot, lit) (or an
        ``upto`` checksum array).

        Returns the Lambert DOT (already computed for the shadow-needed
        mask) instead of ``tl``: the shade step derives its factor from it
        directly, so ``gbuf.normal`` — a (F, h, w_pad, 3) f32 buffer the
        old ``brightness_factor(normal, tl, ...)`` recomputation forced to
        materialise — fuses into the dot and never hits HBM.  Same float
        ops in the same order as ops.shade.brightness_factor."""
        tl, inv, _, rb_g, lb = jax.vmap(
            lambda g, l: shade_ops.light_geometry(g, l, cfg, int_geom)
        )(gbuf, lights_f)
        # Shadow-needed mask: a pixel with Lambert dot <= 0 shades to the
        # ambient factor whether lit or not (min(1, max(0, dot) + ambient)
        # == ambient, alternative.cpp:744-758), so it can be excluded from
        # start presence — fewer live candidates per tile, same pixels.
        # NaN dots (light exactly on the surface point) compare False and
        # are excluded; their brightness is ambient via the same max(0, ·).
        if (winner_mode and r.normal_bands is not None
                and getattr(r, "shadow_winner_dot", True)):
            # Dot straight from the packed picks (output-identical — see
            # trace_pallas.winner_dot): the (F, h, w_pad, 3) normal
            # buffer never materialises.
            wl = (win_a, win_b) if pick2 else (win_a, win_b, win_c)
            dot = jax.vmap(
                lambda w, t0, t1, t2: trace_pallas.winner_dot(
                    w, (t0, t1, t2), r.normal_bands, cfg)
            )(wl, tl[0], tl[1], tl[2])
        else:
            dot = (gbuf.normal[..., 0] * tl[0]
                   + gbuf.normal[..., 1] * tl[1]
                   + gbuf.normal[..., 2] * tl[2])
        needs = _padw((dot > 0).astype(jnp.int32), w_pad)
        szr = jax.vmap(
            lambda s, b, n: shadow_pallas.block_sz_ranges(s, b, W, R, SZ,
                                                          needs=n)
        )(szidx, bg, needs)
        words = jax.vmap(
            lambda lbf: shadow_fast.dda_membership_words(lbf, cfg, tables)
        )(lb)
        n_words = words.shape[-1]

        if upto == "geom":
            return (inv[0].reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    + tl[0].reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    + rb_g[2].reshape(F, -1).sum(axis=1)
                    + words.reshape(F, -1).sum(axis=1).astype(jnp.int32))

        # tested_any per frame from the word OR over starts (no dense
        # member).
        any_words = jax.lax.reduce(words, jnp.uint32(0), jax.lax.bitwise_or,
                                   (1,))                   # (F, n_words)
        tested_any = jax.vmap(
            lambda w: shadow_fast.unpack_member_words(w[None], cfg)[0]
        )(any_words)                                       # (F, V)

        cands = jax.vmap(
            lambda be, cnt, ta, dp: shadow_fast.build_candidates(
                dscene.pos, dscene.ext, be, cnt, None, cfg, tables,
                tested_any=ta, dyn_pos=dp)
        )(bins_ent, counts, tested_any, dyn_pos)

        if upto == "cands":
            return (cands.bin.reshape(F, -1).sum(axis=1)
                    + szidx.reshape(F, -1).sum(axis=1)
                    + bg.reshape(F, -1).sum(axis=1))

        no_lists = bool(getattr(r, "shadow_no_lists", False))
        if no_lists:
            # All-visits mode: skip relevance + list compaction entirely —
            # the kernel visits every live candidate in index order (the
            # member test zeroes tile-irrelevant candidates, so this is
            # exact by the same argument as the pruning itself; valid
            # candidates are compacted first by build_candidates' stable
            # argsort).  The (bin, slot) index order keeps word_c
            # nondecreasing for the kernel's word-change cache.
            relc = None
            lists = None
            n_live = cands.valid.sum(axis=-1, dtype=jnp.int32)   # (F,)
            blk_counts = jnp.broadcast_to(n_live[:, None],
                                          (F, (H // R) * G))
            if upto in ("rel", "lists"):
                return blk_counts.reshape(F, -1).sum(axis=1)
        elif getattr(r, "shadow_rel_range", False):
            # Range-hull relevance: the block's needs-gated [sz_lo,
            # sz_hi) start rows (already folded for the kernel's bitmap
            # loop) replace the exact per-pixel presence — a proved
            # superset, so pruning stays exact while the per-pixel
            # presence passes disappear (see range_candidate_relevance).
            relc = jax.vmap(
                lambda w, s, c: shadow_pallas.range_candidate_relevance(
                    w, s, c, cfg, tables, R, lane_groups=G)
            )(words, szr, cands)
        else:
            relc = jax.vmap(
                lambda w, s, b, c, n:
                shadow_pallas.tile_candidate_relevance(
                    w, s, b, c, cfg, tables, R, lane_groups=G, needs=n)
            )(words, szidx, bg, cands, needs)
        lcap = None
        if not no_lists:
            if upto == "rel":
                return relc.reshape(F, -1).sum(axis=1, dtype=jnp.int32)

            # Capped top-k list compaction (shadow_list_cap): the per-tile
            # pruned lists stop at ``lcap`` entries instead of carrying the
            # full M-wide argsort — exactness is guarded below (any tile
            # whose relevant count exceeds the cap reroutes the batch to
            # the exact dynamic march, the same pattern as the candidate
            # overflow guard).  Requires the guard, so vmapped contexts
            # (shadow_guard='none') keep the full argsort.
            lcap = getattr(r, "shadow_list_cap", None)
            if r.shadow_guard != "fallback":
                lcap = None
            # The cap was tuned on graybox (~48 relevant/tile); a dense
            # world whose merged-candidate count dwarfs it would trip
            # the reroute guard EVERY frame and run the exact march at
            # full scale (observed killing the remote worker at 2048² —
            # round-5 scale bisection).  Keep the full argsort instead
            # when per-tile counts plausibly exceed the cap.
            if lcap is not None and cands.bin.shape[-1] > 4 * lcap:
                lcap = None
            lists, blk_counts = jax.vmap(
                lambda rc: shadow_pallas.candidate_lists_from_relc(
                    rc, cap=lcap)
            )(relc)
            if upto == "lists":
                return (blk_counts.reshape(F, -1).sum(axis=1)
                        + lists.reshape(F, -1).sum(axis=1, dtype=jnp.int32))
        member_expand = bool(getattr(r, "shadow_member_expand", True))
        if member_expand:
            # SMALL membership tables: the kernel runs the lane-expansion
            # contraction itself per grid step (MXU, VMEM) — the two
            # largest HBM buffers of the round-3 cost census (the
            # half-expansion dot fusions, ~7 MB/frame written + read
            # back by the kernel's t_row windows) never materialise.
            msmall = jax.vmap(
                lambda w: shadow_pallas.member_row_tables_small(
                    w, cfg, tables)
            )(words)
            t_row = t_bg = None
            trow_cs = (msmall,)
        else:
            # Half-pair membership tables: the expansion matmuls emit the
            # u32 halves directly and the kernel ORs them at its
            # word-change row reads — the XLA combine pass (a full-table
            # write + two reads) disappears.
            msmall = None
            t_row, t_bg = jax.vmap(
                lambda w: shadow_pallas.lane_member_tables(
                    w, cfg, tables, R, w_pad, halves=True)
            )(words)
            trow_cs = t_row + t_bg
        if upto == "trow":
            lsum = (0 if no_lists
                    else lists.reshape(F, -1).sum(axis=1, dtype=jnp.int32))
            return (blk_counts.reshape(F, -1).sum(axis=1) + lsum
                    + sum(t.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                          for t in trow_cs))
        box_pack = getattr(r, "shadow_box_pack", False)
        if box_pack:
            cword, cmask, box, centi = jax.vmap(
                lambda c: shadow_pallas.candidate_param_tables_packed(
                    c, n_words)
            )(cands)
            cword, cmask, box, centi = (a[:, None, :] for a in
                                        (cword, cmask, box, centi))
        else:
            cword, cmask, box, centi = jax.vmap(
                lambda c: shadow_pallas.candidate_param_tables(c, n_words)
            )(cands)

        iv_p = tuple(_padw(a, w_pad) for a in inv)

        if upto == "prep":
            lsum = (0 if no_lists
                    else lists.reshape(F, -1).sum(axis=1, dtype=jnp.int32))
            return (blk_counts.reshape(F, -1).sum(axis=1) + lsum
                    + sum(t.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                          for t in trow_cs)
                    + cword.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
                    + cmask.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
                    + box.reshape(F, -1).sum(axis=1).astype(jnp.int32)
                    + iv_p[0].reshape(F, -1).sum(axis=1).astype(jnp.int32))

        shade_spec = None
        if shade_kernel:
            shade_spec = (dot, win_c, tuple(r.color_rects),
                          tuple(p[:3] for p in cfg.palette),
                          cfg.background[:3], cfg.ambient)

        def fast_lit():
            lists_k = (None if no_lists
                       else lists.reshape(F, H // R, -1, 128))
            if winner_mode:
                out_pad = shadow_pallas.shadow_call_batched(
                    blk_counts.reshape(F, -1), szr, cword, cmask,
                    lists_k,
                    box, centi, t_row, t_bg, None, None, None, None, None,
                    iv_p[0], iv_p[1], iv_p[2], cfg, tables,
                    rows_per_block=R, lane_groups=G, chunk=shadow_chunk,
                    packed_params=box_pack, winners=(win_a, win_b),
                    member_small=msmall, shade=shade_spec, pick2=pick2,
                    depth_static=r.depth_static if pick2 else None,
                    ray_bands=r.normal_bands if ray_dot else None,
                    lights=lights_f if ray_dot else None,
                    no_lists=no_lists)
                # Shade-in-kernel: the output is packed RGB, not a lit
                # mask — pass it through.
                return out_pad if shade_kernel else out_pad > 0
            else:
                lit_pad = shadow_pallas.shadow_call_batched(
                    blk_counts.reshape(F, -1), szr, cword, cmask,
                    lists_k,
                    box, centi, t_row, t_bg, szidx, bg, ent_p, oy_p, oz_p,
                    iv_p[0], iv_p[1], iv_p[2], cfg, tables,
                    rows_per_block=R, lane_groups=G, chunk=shadow_chunk,
                    packed_params=box_pack, member_small=msmall,
                    no_lists=no_lists)
            return lit_pad > 0

        if r.shadow_guard == "fallback":
            # Static-bound validation over the whole batch: any violating
            # frame reroutes the batch to the exact dynamically-bounded
            # march (shadow correctness is never silently lost; see
            # ops/shade.py).
            from ..ops.shadow import trace_light_dynamic

            steps = jax.vmap(shade_ops.max_needed_steps)(
                jax.tree.map(lambda x: x[..., :W], rb_g),
                jax.tree.map(lambda x: x[..., :W], lb))
            # Only pixels whose output depends on the shadow result need
            # in-range start rows (excluded pixels shade to ambient either
            # way).
            sz_in = ((rb_g[2][..., :W] >= tables.sz_lo)
                     & (rb_g[2][..., :W] < tables.sz_hi))
            sz_ok = jnp.all(sz_in | ~(dot[..., :W] > 0))
            ok = (~jnp.any(cands.overflow) & sz_ok
                  & (jnp.max(steps) <= tables.max_steps))
            if lcap is not None:
                # Capped lists are exact only while every tile's
                # relevant count fits the cap.
                ok = ok & (jnp.max(blk_counts) <= lcap)
            if ray_dot or int_geom:
                # divkernel division domain (|d| <= L < 2^13): L is the
                # per-pixel L1 light distance; frames with a farther
                # light reroute to the exact f64-emulation path.
                wxi = jnp.arange(w_pad, dtype=jnp.int32)[None, None, :]
                maxlen = jnp.max(
                    jnp.abs(lights_f[:, 0][:, None, None] - wxi)
                    + jnp.abs(lights_f[:, 1][:, None, None] - gbuf.y)
                    + jnp.abs(lights_f[:, 2][:, None, None] - gbuf.z))
                ok = ok & (maxlen < 8192)

            def slow_lit():
                # Cold-path reroute.  Every per-pixel input is recomputed
                # INSIDE the branch: a captured pixel buffer rides the
                # conditional's operand tuple even when the fast path
                # runs — the round-4 HLO census put the guard tuple (and
                # the copy-dones feeding it) among the largest HBM
                # writers (~10 MB/frame).  In winner mode the decoded
                # G-buffer re-derives from the trace picks (win_a/win_b
                # are materialised kernel outputs already, so capturing
                # them is free); recomputation cost lands only on frames
                # that actually violate the static bounds.
                #
                # The geometry ALWAYS recomputes with the exact (f64-
                # emulated) division chain: the fast path's tl/inv/dot
                # may come from the divkernel primitives, which are only
                # correct within the guarded L1 domain — a rerouted
                # far-light frame must not shade with (or march on) the
                # out-of-domain values (rn_div_int measured wrong from
                # L ~ 2^19 up; the 2^13 guard is conservative).
                if winner_mode and getattr(r, "shadow_guard_recompute",
                                           True):
                    from ..ops.trace_pallas import gbuffer_from_winners

                    wl = ((win_a, win_b) if pick2
                          else (win_a, win_b, win_c))
                    gb = jax.vmap(
                        lambda w: gbuffer_from_winners(
                            w, dscene.atlas_color, dscene.atlas_normal,
                            dscene.palette, cfg, r.normal_bands,
                            r.color_rects, width=w_pad,
                            depth_static=r.depth_static if pick2
                            else None)
                    )(wl)
                else:
                    gb = gbuf
                ents = gb.entity_index
                tl_s, inv_s, orig_s, rb_s, lb_s = jax.vmap(
                    lambda g, l: shade_ops.light_geometry(g, l, cfg)
                )(gb, lights_f)
                # In-branch shade inputs: the recomputed normal dot
                # replaces the fast path's (winner_dot is float-identical
                # to the normal-buffer dot — see its docstring).
                dot_b = (gb.normal[..., 0] * tl_s[0]
                         + gb.normal[..., 1] * tl_s[1]
                         + gb.normal[..., 2] * tl_s[2])
                color_b = gb.color

                def one(args):
                    p, g, rbf, lbf, of, invf = args
                    pos_f = dscene.pos.at[0].set(p)
                    if static_bins is not None:
                        be, cnt = static_bins.merge(pos_f[:1],
                                                    dscene.ext[:1])
                    else:
                        from ..ops import binning

                        be, cnt = binning.build_bins(pos_f, dscene.ext, cfg,
                                                     r.spans)
                    return trace_light_dynamic(pos_f, dscene.ext, be, cnt,
                                               rbf, lbf, g, of, invf, cfg)

                lit_s = jax.lax.map(
                    one, (players, ents, rb_s, lb_s, orig_s, inv_s))
                if not shade_kernel:
                    return dot_b, lit_s
                # Shade-in-kernel fast branch emits packed RGB: the exact
                # reroute packs the identical shade math (same dot, same
                # color chains, same truncation) so both cond branches
                # return the same structure and pixels.
                factor = shade_ops.factor_from_dot(dot_b, lit_s, cfg)
                ci = (color_b[..., :3].astype(f32)
                      * factor[..., None]).astype(jnp.int32)
                return ci[..., 0] | (ci[..., 1] << 8) | (ci[..., 2] << 16)

            if shade_kernel:
                lit = jax.lax.cond(ok, fast_lit, slow_lit)
            else:
                # The rerouted branch supplies its own exact dot (the
                # fast dot may be divkernel-computed, valid only within
                # the guarded domain).
                dot, lit = jax.lax.cond(
                    ok, lambda: (dot, fast_lit()), slow_lit)
        else:
            lit = fast_lit()

        if shade_kernel:
            return lit                       # packed RGB (F, H, w_pad)
        if upto == "shadow":
            return lit.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
        return dot, lit

    def light_pass_fused(lights_f):
        """Stages 2-4 in ONE kernel launch (ops/fused_pallas) for one
        (F, 3) point-light set -> (dot, lit, gbuf).

        The prep here is strictly light- or scene-derived (candidate
        build, small membership tables, param tables): everything
        trace-dependent — per-pixel geometry, the sz hull, candidate
        relevance — moves inside the kernel, so there is NO XLA pass
        between the trace and shadow phases at all.  The G-buffer
        decodes from the fused kernel's pick outputs afterwards for the
        shade epilogue (exactly what the unfused stage 2 does)."""
        bs = cfg.bin_size
        # Light bin coordinates without a G-buffer (the lb entries of
        # shade_ops.light_geometry depend only on the light scalars).
        lb_f = (cstyle.c_div(lights_f[:, 0], bs),
                cstyle.c_div(jnp.int32(cfg.view_height)
                             - lights_f[:, 1] - lights_f[:, 2], bs),
                cstyle.c_div(lights_f[:, 2], bs))
        words = jax.vmap(
            lambda lbf: shadow_fast.dda_membership_words(lbf, cfg, tables)
        )(lb_f)
        n_words = words.shape[-1]
        any_words = jax.lax.reduce(words, jnp.uint32(0),
                                   jax.lax.bitwise_or, (1,))
        tested_any = jax.vmap(
            lambda w: shadow_fast.unpack_member_words(w[None], cfg)[0]
        )(any_words)
        cands = jax.vmap(
            lambda be, cnt, ta, dp: shadow_fast.build_candidates(
                dscene.pos, dscene.ext, be, cnt, None, cfg, tables,
                tested_any=ta, dyn_pos=dp)
        )(bins_ent, counts, tested_any, dyn_pos)
        n_live = cands.valid.sum(axis=-1, dtype=jnp.int32)
        blk_counts = jnp.broadcast_to(n_live[:, None], (F, H // R))
        msmall = jax.vmap(
            lambda w: shadow_pallas.member_row_tables_small(w, cfg, tables)
        )(words)
        box_pack = getattr(r, "shadow_box_pack", False)
        if box_pack:
            cword, cmask, box, centi = jax.vmap(
                lambda c: shadow_pallas.candidate_param_tables_packed(
                    c, n_words)
            )(cands)
            cword, cmask, box, centi = (a[:, None, :] for a in
                                        (cword, cmask, box, centi))
        else:
            cword, cmask, box, centi = jax.vmap(
                lambda c: shadow_pallas.candidate_param_tables(c, n_words)
            )(cands)

        from ..ops import fused_pallas

        wpicks, lit_f = fused_pallas.fused_call_batched(
            tab_f, segs_f, blk_counts, lights_f, cword, cmask, box,
            centi, msmall, cfg, tables, rows_per_block=R,
            chunk=shadow_chunk, packed_params=box_pack, pick2=pick2,
            depth_static=r.depth_static if pick2 else None,
            kernel_expand=kexp)

        gb = jax.vmap(
            lambda w: trace_pallas.gbuffer_from_winners(
                w, dscene.atlas_color, dscene.atlas_normal,
                dscene.palette, cfg, r.normal_bands, r.color_rects,
                width=w_pad,
                depth_static=r.depth_static if pick2 else None)
        )(wpicks)
        tl, _, _, rb_g, lb_g = jax.vmap(
            lambda g, l: shade_ops.light_geometry(g, l, cfg, int_geom)
        )(gb, lights_f)
        if (r.normal_bands is not None
                and getattr(r, "shadow_winner_dot", True)):
            dot = jax.vmap(
                lambda w, t0, t1, t2: trace_pallas.winner_dot(
                    w, (t0, t1, t2), r.normal_bands, cfg)
            )(wpicks, tl[0], tl[1], tl[2])
        else:
            dot = (gb.normal[..., 0] * tl[0]
                   + gb.normal[..., 1] * tl[1]
                   + gb.normal[..., 2] * tl[2])

        # Static-bound validation, as in light_pass: the fused kernel's
        # in-kernel geometry (divkernel) and membership machinery share
        # the unfused fast path's envelopes; violating batches reroute
        # to the exact dynamic march with exact-chain geometry.  The
        # fused kernel's outputs are safe-but-possibly-wrong outside the
        # envelopes; the cond discards them.
        from ..ops.shadow import trace_light_dynamic

        steps = jax.vmap(shade_ops.max_needed_steps)(
            jax.tree.map(lambda x: x[..., :W], rb_g),
            jax.tree.map(lambda x: x[..., :W], lb_g))
        sz_in = ((rb_g[2][..., :W] >= tables.sz_lo)
                 & (rb_g[2][..., :W] < tables.sz_hi))
        sz_ok = jnp.all(sz_in | ~(dot[..., :W] > 0))
        wxi = jnp.arange(w_pad, dtype=jnp.int32)[None, None, :]
        maxlen = jnp.max(
            jnp.abs(lights_f[:, 0][:, None, None] - wxi)
            + jnp.abs(lights_f[:, 1][:, None, None] - gb.y)
            + jnp.abs(lights_f[:, 2][:, None, None] - gb.z))
        ok = (~jnp.any(cands.overflow) & sz_ok
              & (jnp.max(steps) <= tables.max_steps) & (maxlen < 8192))

        def slow_path():
            # Exact-chain geometry recomputed in-branch (the picks are
            # materialised kernel outputs; capturing them is free).
            tl_s, inv_s, orig_s, rb_s, lb_s = jax.vmap(
                lambda g, l: shade_ops.light_geometry(g, l, cfg)
            )(gb, lights_f)
            dot_b = (gb.normal[..., 0] * tl_s[0]
                     + gb.normal[..., 1] * tl_s[1]
                     + gb.normal[..., 2] * tl_s[2])

            def one(args):
                p, g, rbf, lbf, of, invf = args
                pos_f = dscene.pos.at[0].set(p)
                if static_bins is not None:
                    be, cnt = static_bins.merge(pos_f[:1], dscene.ext[:1])
                else:
                    from ..ops import binning

                    be, cnt = binning.build_bins(pos_f, dscene.ext, cfg,
                                                 r.spans)
                return trace_light_dynamic(pos_f, dscene.ext, be, cnt,
                                           rbf, lbf, g, of, invf, cfg)

            lit_s = jax.lax.map(
                one, (players, gb.entity_index, rb_s, lb_s, orig_s,
                      inv_s))
            return dot_b, lit_s

        dot, lit = jax.lax.cond(ok, lambda: (dot, lit_f > 0), slow_path)
        return dot, lit, gb

    def light_pass_dir(dirs_f):
        """Stages 3-4 for one (F, 3) float32 direction set -> (dot, lit).

        The directional extension of the fast path (ops/shadow_dir.py):
        the per-pixel virtual far-light bins fold into an extended start
        space — x variants ride a traced lane matrix, (y, z) variants the
        membership row axis — and the same Pallas kernel runs on the
        extended tables.  Pixel-identical to ops.shade.shade_directional
        (the scan extension) by construction; frames whose start-bin z
        leaves the table range (or overflow the candidate list) reroute
        to the exact scan march.
        """
        from ..ops import shadow_dir

        dtab = tables._replace(max_steps=shadow_dir.grid_max_steps(cfg))
        etab = shadow_dir.extended_tables(dtab)
        EZ = etab.sz_hi
        tl, inv, K = jax.vmap(
            lambda d: shadow_dir.direction_constants(d, cfg))(dirs_f)
        dot = (gbuf.normal[..., 0] * tl[0][:, None, None]
               + gbuf.normal[..., 1] * tl[1][:, None, None]
               + gbuf.normal[..., 2] * tl[2][:, None, None])
        needs = _padw((dot > 0).astype(jnp.int32), w_pad)
        ez, rbz = jax.vmap(
            lambda y, z, k0, k1, k2: shadow_dir.pixel_rows(
                y, z, (k0, k1, k2), cfg, dtab))(gbuf.y, gbuf.z, *K)
        ezp = _padw(ez, w_pad)
        ezbg = jax.vmap(
            lambda k0, k1, k2: shadow_dir.bg_row((k0, k1, k2), cfg, dtab)
        )(*K)
        lrows, lsel = jax.vmap(
            lambda k0: shadow_dir.lane_rows_and_matrix(k0, cfg, w_pad)
        )(K[0])
        szr = jax.vmap(
            lambda s, b, n: shadow_pallas.block_sz_ranges(s, b, W, R, EZ,
                                                          needs=n)
        )(ezp, bg, needs)
        words = jax.vmap(
            lambda k0, k1, k2: shadow_dir.membership_words_dir(
                (k0, k1, k2), cfg, dtab, dtab.max_steps))(*K)
        n_words = words.shape[-1]
        any_words = jax.lax.reduce(words, jnp.uint32(0),
                                   jax.lax.bitwise_or, (1,))
        tested_any = jax.vmap(
            lambda w: shadow_fast.unpack_member_words(w[None], cfg)[0]
        )(any_words)
        cands = jax.vmap(
            lambda be, cnt, ta, dp: shadow_fast.build_candidates(
                dscene.pos, dscene.ext, be, cnt, None, cfg, dtab,
                tested_any=ta, dyn_pos=dp)
        )(bins_ent, counts, tested_any, dyn_pos)
        n_sx = cfg.hash_width * shadow_dir.VX
        relc = jax.vmap(
            lambda w, s, b, c, n, lr, br:
            shadow_pallas.tile_candidate_relevance(
                w, s, b, c, cfg, etab, R, lane_groups=G, needs=n,
                n_sx=n_sx, lane_rows=lr, bg_row=br)
        )(words, ezp, bg, cands, needs, lrows, ezbg)
        lists, blk_counts = jax.vmap(
            shadow_pallas.candidate_lists_from_relc)(relc)
        t_row, t_bg = jax.vmap(
            lambda w, ls, br: shadow_pallas.lane_member_tables(
                w, cfg, etab, R, w_pad, n_sx=n_sx, lane_sel=ls,
                bg_row=br)
        )(words, lsel, ezbg)
        cword, cmask, box, centi = jax.vmap(
            lambda c: shadow_pallas.candidate_param_tables(c, n_words)
        )(cands)
        iv = tuple(jnp.broadcast_to(v[:, None, None], (F, H, w_pad))
                   for v in inv)

        def fast_lit():
            lit_pad = shadow_pallas.shadow_call_batched(
                blk_counts.reshape(F, -1), szr, cword, cmask,
                lists.reshape(F, H // R, -1, 128),
                box, centi, t_row, t_bg, ezp, bg, ent_p, oy_p, oz_p,
                iv[0], iv[1], iv[2], cfg, etab, rows_per_block=R,
                lane_groups=G, chunk=shadow_chunk)
            return lit_pad > 0

        if r.shadow_guard == "fallback":
            # Variant indices are in range by construction (shadow_dir
            # module docstring); only the real start-bin z range and the
            # candidate capacity need the runtime envelope.  No step
            # guard: the scan path truncates at the same static
            # max_steps, so truncation is parity-identical.
            sz_in = ((rbz[..., :W] >= dtab.sz_lo)
                     & (rbz[..., :W] < dtab.sz_hi))
            ok = (~jnp.any(cands.overflow)
                  & jnp.all(sz_in | ~(dot[..., :W] > 0)))

            def slow_lit():
                from ..ops.shadow import trace_light

                def one(args):
                    p, g_ent, y, z, k0, k1, k2, i0, i1, i2 = args
                    pos_f = dscene.pos.at[0].set(p)
                    if static_bins is not None:
                        be, cnt = static_bins.merge(pos_f[:1],
                                                    dscene.ext[:1])
                    else:
                        from ..ops import binning

                        be, cnt = binning.build_bins(pos_f, dscene.ext,
                                                     cfg, r.spans)
                    bs = cfg.bin_size
                    wx = jnp.broadcast_to(
                        jnp.arange(y.shape[-1], dtype=jnp.int32)[None, :],
                        y.shape)
                    rbf = (cstyle.c_div(wx, bs),
                           cstyle.c_div(jnp.int32(H) - y - z, bs),
                           cstyle.c_div(z, bs))
                    lbf = shadow_dir.pixel_light_bins(y, z, (k0, k1, k2),
                                                      cfg)
                    orig = (wx.astype(jnp.float32),
                            y.astype(jnp.float32), z.astype(jnp.float32))
                    return trace_light(pos_f, dscene.ext, be, cnt, rbf,
                                       lbf, g_ent, orig, (i0, i1, i2),
                                       cfg, dtab.max_steps)

                return jax.lax.map(
                    one, (players, gbuf.entity_index, gbuf.y, gbuf.z,
                          K[0], K[1], K[2], inv[0], inv[1], inv[2]))

            lit = jax.lax.cond(ok, fast_lit, slow_lit)
        else:
            lit = fast_lit()
        return dot, lit

    if upto in ("geom", "cands", "rel", "prep", "shadow"):
        if directional:
            if upto != "shadow":
                raise ValueError(
                    "directional mode supports upto='shadow' only")
            _, lit = light_pass_dir(lights_l[:, 0].astype(jnp.float32))
            return lit.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
        return light_pass(lights_l[:, 0], upto=upto)

    # -- 5. shade -------------------------------------------------------------
    if directional:
        # Reference-style shading with the constant towards-light dir
        # (mirrors ops.shade.shade_directional's default style).
        dot, lit = light_pass_dir(lights_l[:, 0].astype(jnp.float32))
        amb = f32(cfg.ambient)
        brightness = cstyle.c_min(f32(1.0),
                                  cstyle.c_max(f32(0.0), dot) + amb)
        factor = jnp.where(lit, brightness, amb)
    elif multi:
        # Additive multi-light (ops.shade.shade_multi semantics): each
        # light's shadowed diffuse accumulates over a shared ambient base.
        ambient = f32(cfg.ambient)
        diffuse = jnp.zeros(gbuf.y.shape, f32)
        for li in range(L):
            dot, lit = light_pass(lights_l[:, li])
            fl = shade_ops.factor_from_dot(dot, lit, cfg)
            diffuse = diffuse + jnp.maximum(fl - ambient, 0.0)
        factor = jnp.minimum(1.0, ambient + diffuse)
    elif shade_kernel:
        # Shade-in-kernel: the shadow kernel already emitted packed RGB —
        # the epilogue only unpacks (three shifts + a cast).
        packed = light_pass(lights_l[:, 0])
        rgb = jnp.stack([packed & 255, (packed >> 8) & 255,
                         (packed >> 16) & 255], axis=-1)
        return rgb[:, :, :W].astype(jnp.uint8)
    elif fused:
        dot, lit, gbuf = light_pass_fused(lights_l[:, 0])
        factor = shade_ops.factor_from_dot(dot, lit, cfg)
    else:
        dot, lit = light_pass(lights_l[:, 0])
        factor = shade_ops.factor_from_dot(dot, lit, cfg)
    if r.style == "dithered":
        from ..ops.dither import shade_dithered

        return jax.vmap(
            lambda c, fa: shade_dithered(c, fa, dscene.palette[:, :3])
        )(gbuf.color[:, :, :W], factor[:, :, :W])
    rgb = (gbuf.color[:, :, :W, :3].astype(f32)
           * factor[:, :, :W, None])
    return rgb.astype(jnp.uint8)
