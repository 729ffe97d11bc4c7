"""The flagship deferred renderer: rebin -> primary trace -> shadowed shade.

This is the device-side equivalent of the reference's per-frame pipeline
(alternative.cpp:628-817): rebuild the spatial hash, write the G-buffer,
then light it with marched shadow rays.  The whole frame is one jitted
function of (scene arrays, light, player position), so animation loops stay
on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..scene import Scene, Light
from ..ops import binning, trace, shade as shade_ops
from ..ops.trace import GBufferArrays


class DeviceScene(NamedTuple):
    """Scene frozen onto the device: a pytree of plain arrays.

    The atlas is stored once (entities carry ids) — the SoA fix for the
    reference's per-entity 16 KB sprite copies (quirk Q7).
    """

    pos: jax.Array           # (N, 3) int32
    ext: jax.Array           # (N, 3) int32
    sprite_id: jax.Array     # (N,) int32
    atlas_color: jax.Array   # (S, SH, SW) int32
    atlas_depth: jax.Array   # (S, SH, SW) int32
    atlas_normal: jax.Array  # (S, SH, SW, 3) float32
    palette: jax.Array       # (P, 4) uint8
    # Per-sprite ramp-depth parameters (d0, slope) when every sprite's depth
    # map is max(0, d0 - slope*row) — enables the gather-free Pallas tracer.
    depth_d0: jax.Array | None = None
    depth_slope: jax.Array | None = None

    @classmethod
    def from_scene(cls, scene: Scene,
                   config: RenderConfig = DEFAULT_CONFIG) -> "DeviceScene":
        from ..ops.trace_pallas import ramp_depth_params

        params = ramp_depth_params(np.asarray(scene.atlas.depth))
        return cls(
            pos=jnp.asarray(scene.pos, jnp.int32),
            ext=jnp.asarray(scene.ext, jnp.int32),
            sprite_id=jnp.asarray(scene.sprite_id, jnp.int32),
            atlas_color=jnp.asarray(scene.atlas.color, jnp.int32),
            atlas_depth=jnp.asarray(scene.atlas.depth, jnp.int32),
            atlas_normal=jnp.asarray(scene.atlas.normal, jnp.float32),
            palette=jnp.asarray(config.palette_array, jnp.uint8),
            depth_d0=None if params is None else jnp.asarray(params[0]),
            depth_slope=None if params is None else jnp.asarray(params[1]),
        )


class DeferredRenderer:
    """Jit-compiled full-frame renderer with reference-parity semantics.

    Usage:
        r = DeferredRenderer(config)
        dscene = DeviceScene.from_scene(scene, config)
        frame = r.render(dscene, light_xyz)          # (H, W, 3) uint8
        gbuf, frame = r.render_with_gbuffer(dscene, light_xyz)
    """

    def __init__(self, config: RenderConfig = DEFAULT_CONFIG,
                 spans: tuple[int, int, int] | None = None,
                 shadow_max_steps: int = 16, shadow_impl: str = "fast",
                 shadow_tables=None, trace_impl: str = "auto",
                 style: str = "reference", shadow_guard: str = "fallback"):
        self.config = config
        # Static per-entity bin-span bound; (2, 3, 2) covers any scene whose
        # extents stay within one bin (the reference world is all 20-cubes).
        self.spans = spans if spans is not None else (2, 3, 2)
        self.shadow_max_steps = shadow_max_steps
        self.shadow_impl = shadow_impl
        self.shadow_tables = shadow_tables
        # 'fallback': validate the shadow tables' static bounds per frame on
        # device and reroute to the exact dynamic march when exceeded;
        # 'none' for vmapped contexts (cond lowers to both-branches there).
        self.shadow_guard = shadow_guard
        # 'pallas': gather-free TPU kernel (requires a ramp-depth atlas);
        # 'jnp': candidate-scan tracer; 'auto': pallas when the scene allows.
        self.trace_impl = trace_impl
        # 'reference': continuous brightness scale (parity); 'dithered':
        # ordered-dither re-quantisation onto the palette (config-4 style).
        self.style = style
        # Host-side two-band normal decomposition and color-rect
        # decomposition for the Pallas epilogue's select-chain fast paths;
        # set via configure_for(scene).
        self.normal_bands = None
        self.color_rects = None
        # Piecewise-ramp depth segments (configure_for): lets the Pallas
        # tracer handle any column-constant depth atlas, not just ramps.
        self.depth_segments = None
        # Packed winner resolve (configure_for): the trace kernel emits 3
        # bit-packed attribute maxima instead of 6 when the scene's value
        # ranges fit (ent < 2^18, sid < 8, sdep < 32, |pz|/|rowbase|
        # < 2^14); False uses the unpacked kernel (any scene).
        self.trace_packed = False
        # Two-pick winner resolve (configure_for; needs trace_packed +
        # pick2_ok bounds + a static depth decomposition): sdep drops out
        # of A and posx packs in — one trace output fewer, no per-row
        # sdep resolve, no win_c shadow window.
        self.trace_pick2 = False
        self.depth_static = None
        # Packed candidate-field tables (configure_for): small fields ride
        # two int32 rows instead of seven when the scene's ranges fit
        # (trace_pallas.field_pack_ok) — ~45% less expansion-table traffic.
        self.trace_field_pack = False
        # Bit-packed shadow candidate param tables (configure_for):
        # shadow_pallas.box_pack_ok proves the coordinate/entity ranges.
        self.shadow_box_pack = False
        # Winner-direct shadow-kernel inputs (batched pipeline): with
        # masked packed picks (trace_packed) the shadow kernel derives
        # szidx/bg/ent/oy/oz from the trace winners in VMEM, deleting five
        # HBM pixel buffers and their producing XLA passes per frame.
        self.shadow_winner_inputs = True
        # Kernel-side trace-table lane expansion (batched pipeline): the
        # trace kernel reads the SMALL pre-expansion table and runs the
        # lane-selection matmul on the MXU in VMEM — the expanded table
        # (the compiled program's single largest HBM buffer, 7.3 MB/frame
        # write + read) never materialises.  Same contraction, same
        # HIGHEST precision, same < 2^24 value envelope as the XLA
        # expansion — exactness-equivalent wherever the Pallas tracer
        # runs at all.  Measured SPEED-NEUTRAL on graybox (interleaved
        # A/B at F=64: med 0.793 ms/f vs 0.790 off — within session
        # noise); the default is ON for the HBM-buffer deletion (smaller
        # program footprint), not a throughput win.
        self.trace_kernel_expand = True
        # Kernel-side membership-table lane expansion (batched pipeline):
        # the shadow kernel expands each block's bin-row start-space table
        # over lanes itself (one small MXU contraction per grid step) —
        # the lane-expanded tables, the round-3 cost census's two largest
        # HBM buffers (~7 MB/frame written by XLA + read back through the
        # kernel's t_row windows), never materialise.  Exactness: the
        # identical 0/1 selection contraction at HIGHEST precision.
        self.shadow_member_expand = True
        # Shade-in-kernel (batched pipeline, winner-direct + point light +
        # reference style + rect-decomposable color maps): the shadow
        # kernel derives the final packed RGB in VMEM — the lit mask, the
        # XLA color select chains, and the factor math never round-trip
        # HBM; the epilogue just unpacks.  Measured a LOSS on v5e graybox
        # (interleaved A/B at F=64: med 0.848 ms/f vs 0.810 with the
        # member-expand default, 1.005 vs 0.844 without — the two extra
        # pixel windows (dot f32 + posx) cost more per grid step than the
        # deleted XLA epilogue, which XLA had fused well).  Default OFF;
        # kept as a tested opt-in for hardware with cheaper windows.
        self.shadow_shade_kernel = False
        # In-kernel ray-dot shading (batched pipeline, winner-direct +
        # pick2 + two-band normals + guarded): the shadow kernel derives
        # the towards-light components itself with correctly-rounded
        # divisions (ops/divkernel — bit-equal to cstyle.exact_f32_div on
        # this operand class, exhaustively verified) and shades in VMEM.
        # Unlike shadow_shade_kernel's windowed dot (measured a loss
        # because the dot buffer had to materialise for its window), this
        # mode adds NO pixel window — the XLA color chains, factor math,
        # lit round trip, and the dot materialisation all disappear.
        # Frames whose L1 light distance exceeds the division domain
        # (2^13) reroute to the exact path via the shadow guard.
        # MEASURED NEUTRAL-TO-SLOWER on v5e graybox (interleaved A/B at
        # F=64 G=1 TR=40: med 0.766/0.799 ms/f on vs 0.759/0.753 off,
        # raydot_sweep.log): the in-kernel divisions + shade epilogue
        # cost about what the deleted XLA shade/color/lit work saved.
        # Default OFF; kept as a tested, parity-verified opt-in (it also
        # documents the division primitives' kernel viability for a
        # future fused-kernel design).
        self.shadow_ray_dot = False
        # Lambert dot straight from the packed picks (batched pipeline,
        # winner mode): trace_pallas.winner_dot evaluates the two-band
        # select-chain dot from the A/B picks — the (F, h, w_pad, 3) f32
        # normal buffer (a 2 MB/frame HBM materialisation in the round-4
        # census) never exists.  Output-identical (see winner_dot's
        # docstring); flag kept for interleaved A/B measurement.
        self.shadow_winner_dot = True
        # Guard cold-path recompute (batched pipeline): the slow reroute
        # re-derives its per-pixel inputs from the trace picks INSIDE the
        # lax.cond branch instead of capturing the fast path's buffers —
        # a captured pixel buffer rides the conditional's operand tuple
        # even when the fast path runs (the round-4 HLO census put that
        # tuple among the largest HBM writers, ~10 MB/frame).
        self.shadow_guard_recompute = True
        # Integer-exact light geometry (batched pipeline, guarded): the
        # six correctly-rounded per-pixel divisions (towards-light
        # components + reciprocals) run through ops/divkernel's
        # integer-class primitives instead of the float64 emulation —
        # value-identical within the guarded L1-distance domain
        # (< 2^13; hostile lights reroute via the shadow guard), and
        # the chains FUSE: the round-4 HLO census put the f64
        # emulation's materialised pixel buffers (~12 MB/frame of f64
        # temporaries, get-tuple-elements, and barrier-forced tl
        # buffers) among the program's largest HBM writers.  Interleaved
        # A/B at F=64: 0.831 vs 0.829 ms/f — speed-NEUTRAL (the deleted
        # buffer traffic overlaps something else); default ON for the
        # smaller program footprint (docs/PERF.md rule 15).
        self.shadow_int_geom = True
        # Range-hull tile relevance (batched pipeline): per-block
        # candidate relevance folds over the block's needs-gated
        # [sz_lo, sz_hi) start-row HULL (already computed for the
        # kernel) instead of exact per-pixel start presence — the
        # presence fold's full passes over the pixel buffers disappear.
        # A proved superset, so pruning stays exact; extra hull
        # candidates only add kernel visits (small where the per-block
        # sz spread is tight, as on the reference world).  Interleaved
        # A/B at F=64 G=1 TR=40: center 0.748 vs 0.755 ms/f, edge_x
        # 0.797 vs 0.795 — neutral-to-tiny-win with strictly less XLA
        # glue, so it defaults ON (docs/PERF.md rule 15).
        self.shadow_rel_range = True
        # Capped top-k candidate lists (batched pipeline, guarded): the
        # per-tile pruned lists carry at most this many entries instead
        # of the full M-wide argsort output; tiles that overflow the cap
        # reroute the batch to the exact dynamic march via the shadow
        # guard (so exactness never depends on the cap).  None keeps the
        # argsort.  256 covers graybox's densest tiles ~2x over.
        self.shadow_list_cap = 256
        # Fused trace+shadow kernel (batched pipeline, ops/fused_pallas):
        # ONE Pallas launch runs primary visibility AND shadow occlusion
        # per (frame, row-block) grid step — the shadow phase reads the
        # trace phase's pick output refs in VMEM (no HBM hop), derives
        # the inverse ray components in-kernel (divkernel; guarded L1
        # domain, hostile frames reroute), discovers candidates
        # all-visits style, and folds its own per-block sz hull.  One
        # grid's worth of per-step window fixed cost and every
        # trace->shadow XLA glue pass disappear.  Requires trace_packed
        # + winner inputs + member_expand + the fallback guard; the
        # batched driver falls back to the two-kernel pipeline when the
        # requirements don't hold.  Measured (r5, interleaved A/B,
        # docs/PERF.md): speed-NEUTRAL at F=64 and F=256, pixel-exact on
        # TPU (tools/verify_fused_tpu) — default OFF so the two-kernel
        # path keeps the wider config surface (lane groups, compaction,
        # multi/directional lights) as the one everyone runs.
        self.fuse_trace_shadow = False
        # All-visits shadow kernel (batched pipeline): skip relevance +
        # list compaction entirely — the kernel visits EVERY live merged
        # candidate in (bin, slot) index order (blk_counts = the live
        # count; padded slots route to the always-zero bitmap word).
        # Exact by the pruning's own argument: a tile-irrelevant
        # candidate's membership bits are zero for every pixel of the
        # tile, so its visits cannot set occlusion.  Trades ~20-40% more
        # kernel visits for deleting the rel fold, the top-k lists, the
        # lists HBM table, and one scalar load per visit (the list
        # indirection).  Measured (r5, interleaved A/B, docs/PERF.md):
        # 0.834 vs 0.825 ms/f at F=64, 0.629 vs 0.631 at F=256 —
        # neutral-to-slightly-slower, so pruned lists stay the default.
        self.shadow_no_lists = False
        # Set once the jitted pipeline has traced with this renderer as a
        # static argument; configure_for() refuses to mutate after that
        # (the compile cache would silently keep the stale parameters).
        self._traced = False

    def configure_for(self, scene: Scene) -> "DeferredRenderer":
        """Derive per-scene static parameters (bin spans, normal bands,
        color-map rectangle decomposition).

        Call BEFORE the first render: the jitted entry points key their
        trace cache on the renderer's identity, so attribute changes after
        a compile are not picked up for already-traced shapes.  Calling it
        after a render raises unless the derived parameters are unchanged."""
        from ..ops.trace_pallas import (normal_bands, color_rects,
                                        depth_segments, depth_rects)

        spans = self.spans_for(scene)
        bands = normal_bands(np.asarray(scene.atlas.normal))
        rects = color_rects(np.asarray(scene.atlas.color))
        # Depth decomposition ladder: column-constant row segments, then
        # arbitrary-map ramp rects (clip-exact per-texel semantics); maps
        # too fragmented for either fall back to the jnp tracer's gather.
        segs = depth_segments(np.asarray(scene.atlas.depth))
        if segs is None:
            segs = depth_rects(np.asarray(scene.atlas.depth))
        tables = self.shadow_tables
        if tables is None and self.shadow_impl in ("fast", "pallas"):
            # Content-derived shadow tables: smaller sz range and candidate
            # capacity than the scene-agnostic defaults (runtime guards keep
            # the bounds exact either way).
            from ..ops import shadow_fast

            tables = shadow_fast.derive_tables(
                self.config, scene, max_steps=self.shadow_max_steps)

        def same(a, b):
            if (a is None) != (b is None):
                return False
            flat_a, tree_a = jax.tree_util.tree_flatten((a is not None, a))
            flat_b, tree_b = jax.tree_util.tree_flatten((b is not None, b))
            return (tree_a == tree_b and len(flat_a) == len(flat_b)
                    and all(np.array_equal(x, y)
                            for x, y in zip(flat_a, flat_b)))

        if self._traced and not (spans == self.spans
                                 and segs == self.depth_segments
                                 and tables == self.shadow_tables
                                 and same(bands, self.normal_bands)
                                 and same(rects, self.color_rects)):
            raise RuntimeError(
                "configure_for() after a render would be silently ignored: "
                "the jitted pipeline already compiled with the old "
                "spans/normal_bands/color_rects. Create a fresh "
                "DeferredRenderer (or call configure_for before rendering).")
        self.spans = spans
        self.normal_bands = bands
        self.color_rects = rects
        self.depth_segments = segs
        self.trace_packed = self._packed_bounds_ok(scene)
        # Host-static depth decomposition for the two-pick winner resolve
        # (decoders re-derive sdep from sid + row instead of unpacking it
        # from A): ramp params as python ints when the atlas is a ramp,
        # else the segment/rect tuples.
        from ..ops.trace_pallas import ramp_depth_params, pick2_ok

        params = ramp_depth_params(np.asarray(scene.atlas.depth))
        if params is not None:
            self.depth_static = ("ramp",
                                 tuple(int(v) for v in params[0]),
                                 tuple(int(v) for v in params[1]))
        elif segs is not None:
            self.depth_static = ("segments", segs)
        else:
            self.depth_static = None
        self.trace_pick2 = bool(self.trace_packed
                                and self.depth_static is not None
                                and pick2_ok(scene, self.config))
        from ..ops.trace_pallas import field_pack_ok

        self.trace_field_pack = field_pack_ok(scene, self.config)
        # Bit-packed shadow candidate params (5 scalar loads per candidate
        # visit instead of 10) stay OPT-IN: an interleaved A/B on v5e
        # graybox measured them neutral-to-slightly-slower (the kernel's
        # per-visit cost is not SMEM-load bound; the unpack ALU offsets
        # the saved loads).  Enable with
        # `r.shadow_box_pack = shadow_pallas.box_pack_ok(scene, cfg)`.
        self.shadow_tables = tables
        return self

    def _packed_bounds_ok(self, scene: Scene) -> bool:
        """Host-side value-range proof for the packed winner resolve
        (``trace_pallas._trace_kernel`` packed_picks bounds).

        The pz/rowbase bounds are proved for any *binned* entity position,
        not just the scene's static layout: the frustum cull
        (alternative.cpp:212-219) bounds a binned entity's coordinates to
        ``pz in (-ext_z, view_length)`` and ``0 <= rowbase <
        view_height + bin_size + ext_y + ext_z``, so per-frame dynamic
        positions (the player, alternative.cpp:643-660) are covered too —
        a moving entity can never silently corrupt the packed attributes."""
        cfg = self.config
        ext = np.asarray(scene.ext).astype(np.int64)
        ey = int(ext[:, 1].max())
        ez = int(ext[:, 2].max())
        pz_bound = max(cfg.view_length - 1, ez)
        rowbase_bound = cfg.view_height + cfg.bin_size + ey + ez
        return bool(
            scene.n_entities < (1 << 18)
            and scene.atlas.color.shape[0] <= 8
            and int(np.asarray(scene.atlas.depth).max()) < 32
            and pz_bound < 16384
            and rowbase_bound < 16384)

    def spans_for(self, scene: Scene) -> tuple[int, int, int]:
        return binning.entity_span_bound(scene.ext.max(axis=0), self.config)

    # -- pipeline stages (all pure functions of arrays) --------------------

    def build_bins(self, dscene: DeviceScene):
        return binning.build_bins(dscene.pos, dscene.ext, self.config,
                                  self.spans)

    def trace(self, dscene: DeviceScene, bins_ent, counts, row0=None,
              n_rows: int | None = None) -> GBufferArrays:
        """Primary visibility.  ``row0``/``n_rows`` select a screen-row
        window (row-sharded shards render their own window; defaults cover
        the full frame)."""
        self._traced = True  # runs at jit-trace time; locks configure_for
        # The kernel processes 8-row blocks that must sit inside one bin row:
        # bin_size and view_height must divide by 8.
        kernel_ok = (self.config.bin_size % 8 == 0
                     and self.config.view_height % 8 == 0)
        depth_ok = (dscene.depth_d0 is not None
                    or self.depth_segments is not None)
        use_pallas = (self.trace_impl == "pallas"
                      or (self.trace_impl == "auto"
                          and depth_ok and kernel_ok))
        if use_pallas:
            from ..ops import trace_pallas

            assert depth_ok, ("pallas tracer needs a ramp-depth atlas or "
                              "depth segments (configure_for a "
                              "column-constant atlas)")
            params = (None if dscene.depth_d0 is None
                      else (dscene.depth_d0, dscene.depth_slope))
            return trace_pallas.trace_pixels_pallas(
                dscene.pos, dscene.ext, dscene.sprite_id, dscene.atlas_color,
                dscene.atlas_depth, dscene.atlas_normal, dscene.palette,
                bins_ent, counts, self.config,
                params, self.normal_bands,
                self.color_rects, self.depth_segments, row0, n_rows,
                packed_picks=self.trace_packed,
                field_pack=self.trace_field_pack,
                kernel_expand=self.trace_kernel_expand)
        assert row0 is None and n_rows is None, \
            "row windows are a Pallas-path feature (jnp shards via GSPMD)"
        return trace.trace_pixels(dscene.pos, dscene.ext, dscene.sprite_id,
                                  dscene.atlas_color, dscene.atlas_depth,
                                  dscene.atlas_normal, dscene.palette,
                                  bins_ent, counts, self.config)

    def shade(self, dscene: DeviceScene, gbuf: GBufferArrays, bins_ent,
              counts, light: jax.Array, row0=0) -> jax.Array:
        return shade_ops.shade(dscene.pos, dscene.ext, gbuf, bins_ent, counts,
                               light, self.config, self.shadow_max_steps,
                               self.shadow_impl, self.shadow_tables,
                               self.style, dscene.palette[:, :3],
                               self.shadow_guard, row0)

    # -- whole-frame entry points ------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def render_with_gbuffer(self, dscene: DeviceScene, light: jax.Array):
        bins_ent, counts = self.build_bins(dscene)
        gbuf = self.trace(dscene, bins_ent, counts)
        frame = self.shade(dscene, gbuf, bins_ent, counts, light)
        return gbuf, frame

    # Pixel count above which single frames reroute through the batched
    # pipeline (F=1): the per-frame convenience prep (dense membership
    # bitmaps, per-pixel gathers) collapses at supersampled scales — ~22
    # s/frame at 4096x4096 vs ~0.1 s through the batched phases.
    SINGLE_FRAME_BATCHED_PIXELS = 1 << 20

    def _batched_f1_capable(self, dscene: DeviceScene) -> bool:
        cfg = self.config
        kernel_ok = cfg.bin_size % 8 == 0 and cfg.view_height % 8 == 0
        depth_ok = (dscene.depth_d0 is not None
                    or self.depth_segments is not None)
        return (self.shadow_impl == "pallas"
                and self.trace_impl in ("auto", "pallas")
                and kernel_ok and depth_ok)

    @functools.partial(jax.jit, static_argnums=0)
    def _render_batched_f1(self, dscene: DeviceScene, light: jax.Array):
        from .batched import render_states_batched

        return render_states_batched(self, None, dscene,
                                     dscene.pos[:1], light[None])[0]

    def render(self, dscene: DeviceScene, light) -> jax.Array:
        light = jnp.asarray(light, jnp.int32)
        if (self.config.n_pixels >= self.SINGLE_FRAME_BATCHED_PIXELS
                and self._batched_f1_capable(dscene)):
            return self._render_batched_f1(dscene, light)
        _, frame = self.render_with_gbuffer(dscene, light)
        return frame

    # -- host conveniences -------------------------------------------------

    def render_numpy(self, scene: Scene, light: Light) -> np.ndarray:
        dscene = DeviceScene.from_scene(scene, self.config)
        return np.asarray(self.render(dscene, light.as_array()))
