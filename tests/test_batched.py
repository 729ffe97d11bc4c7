"""The whole-batch renderer (models/batched.py) must be pixel-identical to
the per-frame scan path: both Pallas kernels launch once on a
(frames, row_blocks) grid and every XLA prep stage is frame-batched, so any
divergence is a bug in the batching, not the semantics (which are the same
single-frame functions under vmap).  Reference per-frame loop:
alternative.cpp:628-817.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import demo_world, default_light
from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                     DeviceScene)
from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
from pixel_art_raytracer_tpu.ops import shadow_fast


def make_anim(scene, batched, static_bins=True, **kw):
    cfg = DEFAULT_CONFIG
    tables = kw.pop("shadow_tables",
                    shadow_fast.default_tables(cfg, max_candidates=1024))
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables, **kw)
    r.configure_for(scene)
    cache = (StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
             if static_bins else None)
    return AnimationRenderer(r, cfg, static_bins=cache, batched=batched)


def sweep(anim, scene, n):
    light = default_light()
    return anim.light_sweep_states(n, scene.pos[0],
                                   center=(light.x, light.y, light.z),
                                   radius=40)


class TestBatchedParity:
    def test_matches_scan_path(self):
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        assert a_bat._batched_capable(ds)
        players, lights = sweep(a_scan, scene, 3)
        # Move the player too: the batched bin merge and dynamic-entity
        # overrides must track per-frame positions.
        players = players.at[1, 0].add(25).at[2, 2].add(-15)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_raydot_kernel_matches_default(self):
        # In-kernel ray-dot shading (shadow_ray_dot: the shadow kernel
        # derives tl/dot via divkernel's correctly-rounded divisions and
        # emits packed RGB) is a tested opt-in — must stay
        # pixel-identical to the default lit-mask + XLA shade path.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_def = make_anim(scene, batched=True)
        a_ray = make_anim(scene, batched=True)
        a_ray.renderer.shadow_ray_dot = True
        assert a_ray.renderer.trace_pick2, "ray-dot needs pick2 bounds"
        players, lights = sweep(a_def, scene, 2)
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        f_ray = np.asarray(a_ray.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_ray, f_def)

    @pytest.mark.slow
    def test_multi_light_batched(self):
        # (F, L, 3) lights: the batched pipeline runs its shadow phases per
        # light and accumulates diffuse over the shared ambient base — must
        # match the per-frame shade_multi extension exactly
        # (the reference carries a light vector but shades lights[0] only,
        # alternative.cpp:624-626; this completes the generalisation).
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        a_bat = make_anim(scene, batched=True)
        a_scan = make_anim(scene, batched=False)
        players, lights = sweep(a_bat, scene, 2)
        lights2 = jnp.stack(
            [lights, lights[::-1] + jnp.asarray([0, 0, 30], jnp.int32)],
            axis=1)                                   # (F, 2, 3)
        f_bat = np.asarray(a_bat.render_states(ds, players, lights2))
        f_scan = np.asarray(a_scan.render_states(ds, players, lights2))
        np.testing.assert_array_equal(f_bat, f_scan)

    def test_directional_batched(self):
        # Directional lights (shade_directional semantics) through the
        # batched pipeline: the per-pixel virtual far-light bins fold into
        # an extended start space (ops/shadow_dir.py) and the same Pallas
        # kernel runs on the extended tables.  Must be pixel-identical to
        # the per-frame scan extension — with the guard DISABLED, so the
        # comparison exercises the kernel fast path, not the reroute.
        from pixel_art_raytracer_tpu.ops import shade as shade_ops
        from pixel_art_raytracer_tpu.models.animation import \
            scene_with_player

        cfg = DEFAULT_CONFIG
        scene = demo_world(10)
        tables = shadow_fast.derive_tables(cfg, scene)
        r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                             shadow_tables=tables, shadow_guard="none")
        r.configure_for(scene)
        ds = DeviceScene.from_scene(scene)
        cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
        a = AnimationRenderer(r, cfg, static_bins=cache, batched=True)
        assert a._directional_capable()
        F = 2
        players = jnp.broadcast_to(ds.pos[0], (F, 3)).astype(jnp.int32)
        players = players.at[1, 0].add(25)
        dirs = jnp.asarray([[0.3, 1.0, -0.2], [-1.0, 0.8, 0.5]],
                           jnp.float32)
        fb = np.asarray(a.render_states(ds, players, dirs,
                                        directional=True))

        def one(player, d):
            sf = scene_with_player(ds, player)
            be, cnt = cache.merge(sf.pos[:1], sf.ext[:1])
            g = r.trace(sf, be, cnt)
            return shade_ops.shade_directional(sf.pos, sf.ext, g, be, cnt,
                                               d, cfg)

        fs = np.stack([np.asarray(jax.jit(one)(players[i], dirs[i]))
                       for i in range(F)])
        np.testing.assert_array_equal(fb, fs)

    @pytest.mark.slow
    def test_wide_sz_tables_use_onehot_fallback(self):
        # SZ > 31 rows can't ride the int32 sz-bitmask row fold in
        # tile_candidate_relevance; the one-hot fallback must produce the
        # same pixels (a wider sz table is a semantic no-op — the extra
        # rows are just never selected).
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        wide = shadow_fast.default_tables(
            DEFAULT_CONFIG, max_candidates=1024)._replace(sz_lo=-22)
        assert wide.sz_hi - wide.sz_lo > 31
        a_def = make_anim(scene, batched=True)
        a_wide = make_anim(scene, batched=True, shadow_tables=wide)
        players, lights = sweep(a_def, scene, 2)
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        f_wide = np.asarray(a_wide.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_wide, f_def)

    def test_single_frame_f1_route(self):
        # DeferredRenderer.render reroutes big frames through the batched
        # pipeline with F=1 (the per-frame convenience prep collapses at
        # supersampled scales); the route must be pixel-identical.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        r = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="pallas",
                             trace_impl="auto")
        r.configure_for(scene)
        la = jnp.asarray(default_light().as_array())
        assert r._batched_f1_capable(ds)
        f1 = np.asarray(r._render_batched_f1(ds, la))
        f0 = np.asarray(r.render_with_gbuffer(ds, la)[1])
        np.testing.assert_array_equal(f1, f0)

    @pytest.mark.slow
    def test_matches_without_static_bins(self):
        scene = demo_world(6)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True, static_bins=False)
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_guard_reroutes_far_light_batch(self):
        # One frame's light is far outside the grid: the batch-level guard
        # must reroute to the exact dynamic march and still match the scan
        # path (whose per-frame guard does the same).
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        players, lights = sweep(a_scan, scene, 2)
        lights = lights.at[1].set(jnp.asarray([2000, 900, 80], jnp.int32))
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    def test_guard_far_light_reroute(self):
        # L1 light distance ~20k — past the 2^13 guard bound, so the
        # batched pipeline must reroute to the exact dynamic march and
        # still pixel-match the per-frame scan path.  The march length
        # scales with light distance, so this default-tier variant keeps
        # the light moderate; the slow-tier test below pushes it to
        # ~2^19 (beyond where rn_div_int actually breaks) to prove the
        # reroute recomputes the dot instead of keeping the fast one.
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        players, lights = sweep(a_scan, scene, 2)
        lights = lights.at[1].set(jnp.asarray([20000, 900, 80], jnp.int32))
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_guard_far_light_exact_dot(self):
        # A VERY far light (L1 distance ~2^19, beyond where rn_div_int
        # actually breaks — the 2^13 guard bound is conservative) must
        # reroute AND shade with the exact-geometry dot: the fast path's
        # divkernel-computed dot/inv are garbage at this distance, so
        # the reroute branch recomputes them (a reroute that fixed lit
        # but kept the fast dot would still corrupt the final factor).
        # Slow tier: the exact march walks ~15k hash cells per frame in
        # interpret mode (~25 min of the old 47-min default run).
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        players, lights = sweep(a_scan, scene, 2)
        lights = lights.at[1].set(jnp.asarray([600000, 900, 80], jnp.int32))
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_lane_groups_match_whole_width(self):
        # Per-lane-tile candidate pruning (shadow_lane_groups > 1) is an
        # exact optimization: a candidate dropped for a tile has a zero
        # membership bit for every start bin its pixels occupy.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a1 = make_anim(scene, batched=True)
        a4 = make_anim(scene, batched=True)
        a4.shadow_lane_groups = 4
        players, lights = sweep(a1, scene, 2)
        f1 = np.asarray(a1.render_states(ds, players, lights))
        f4 = np.asarray(a4.render_states(ds, players, lights))
        np.testing.assert_array_equal(f4, f1)

    @pytest.mark.slow
    def test_word_cache_exact_for_unsorted_lists(self, monkeypatch):
        # The shadow kernel caches the current membership word's bitmap
        # and refreshes it on a word change (exploiting that pruned lists
        # are ~word-sorted).  Exactness must NOT depend on that order:
        # reversing every tile's relevant prefix (word order descending —
        # the cache's worst case) must produce identical pixels.
        from pixel_art_raytracer_tpu.ops import shadow_pallas as sp

        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a = make_anim(scene, batched=True)
        players, lights = sweep(a, scene, 2)
        base = np.asarray(a.render_states(ds, players, lights))

        orig = sp.candidate_lists_from_relc

        def reversed_lists(relc, cap=None):
            # Signature must track the production call (the capped top-k
            # variant passes cap=); reverse only the in-list prefix —
            # with a cap, counts can exceed the list width (the guard
            # reroutes such batches, but the lists still build).
            lists, counts = orig(relc, cap=cap)
            idx = jnp.arange(lists.shape[-1], dtype=jnp.int32)
            n = jnp.minimum(counts, lists.shape[-1])[..., None]
            rev = jnp.take_along_axis(
                lists, (n - 1 - idx) % lists.shape[-1], axis=-1)
            return jnp.where(idx < n, rev, lists), counts

        monkeypatch.setattr(sp, "candidate_lists_from_relc",
                            reversed_lists)
        a2 = make_anim(scene, batched=True)
        flipped = np.asarray(a2.render_states(ds, players, lights))
        np.testing.assert_array_equal(flipped, base)

    @pytest.mark.slow
    def test_frames_per_block_match_single(self, monkeypatch):
        # Frame-blocked grid steps (FRAMES_PER_BLOCK > 1 batches several
        # frames' tiles into one kernel grid step to amortise the
        # per-step fixed cost) are a pure scheduling change: pixels must
        # be identical to one-frame-per-step.
        from pixel_art_raytracer_tpu.ops import shadow_pallas as sp

        from pixel_art_raytracer_tpu.ops import trace_pallas as tp

        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a = make_anim(scene, batched=True)
        players, lights = sweep(a, scene, 4)
        base = np.asarray(a.render_states(ds, players, lights))  # FB=1

        monkeypatch.setattr(sp, "FRAMES_PER_BLOCK", 4)
        monkeypatch.setattr(tp, "TRACE_FRAMES_PER_BLOCK", 4)
        a1 = make_anim(scene, batched=True)
        blocked = np.asarray(a1.render_states(ds, players, lights))
        np.testing.assert_array_equal(blocked, base)

    @pytest.mark.slow
    def test_kernel_variant_flags_match_defaults(self, monkeypatch):
        # Measured-neutral kernel variants stay behind module flags so the
        # profiling tools can re-A/B them on future hardware: the prebuilt
        # (non-lazy) shadow bitmap scratch and the incremental trace-key
        # carries must both produce identical pixels to the defaults.
        from pixel_art_raytracer_tpu.ops import shadow_pallas as sp
        from pixel_art_raytracer_tpu.ops import trace_pallas as tp

        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a = make_anim(scene, batched=True)
        players, lights = sweep(a, scene, 2)
        base = np.asarray(a.render_states(ds, players, lights))

        monkeypatch.setattr(sp, "BITMAP_ONDEMAND",
                            not sp.BITMAP_ONDEMAND)
        monkeypatch.setattr(tp, "INCREMENTAL_KEYS",
                            not tp.INCREMENTAL_KEYS)
        a2 = make_anim(scene, batched=True)
        flipped = np.asarray(a2.render_states(ds, players, lights))
        np.testing.assert_array_equal(flipped, base)

    @pytest.mark.slow
    def test_packed_params_match_unpacked(self):
        # Bit-packed candidate parameter tables (wordent + 10-bit box
        # fields, shadow_pallas.candidate_param_tables_packed) are a pure
        # layout change: the kernel must produce identical pixels with
        # packed and unpacked SMEM tables.
        from pixel_art_raytracer_tpu.ops.shadow_pallas import box_pack_ok

        scene = demo_world(10)
        assert box_pack_ok(scene, DEFAULT_CONFIG)
        ds = DeviceScene.from_scene(scene)
        a_pack = make_anim(scene, batched=True)
        a_flat = make_anim(scene, batched=True)
        a_pack.renderer.shadow_box_pack = True
        a_flat.renderer.shadow_box_pack = False
        players, lights = sweep(a_pack, scene, 2)
        f_pack = np.asarray(a_pack.render_states(ds, players, lights))
        f_flat = np.asarray(a_flat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_pack, f_flat)

    @pytest.mark.slow
    def test_no_lists_matches_default(self):
        # All-visits mode (shadow_no_lists): the kernel visits every live
        # merged candidate in (bin, slot) index order instead of the
        # pruned per-tile lists.  Exact by the pruning's own argument
        # (a tile-irrelevant candidate's membership bits are zero for
        # every pixel of the tile), so pixels must be identical.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_nl = make_anim(scene, batched=True)
        a_def = make_anim(scene, batched=True)
        a_nl.renderer.shadow_no_lists = True
        players, lights = sweep(a_nl, scene, 2)
        f_nl = np.asarray(a_nl.render_states(ds, players, lights))
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_nl, f_def)

    @pytest.mark.slow
    def test_slot_cap_reroute_matches(self):
        # A deliberately too-small slot cap must reroute (runtime
        # max(counts) guard) to the full-capacity kernel and still match;
        # the auto-derived cap is exercised by test_matches_scan_path.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        a_bat.trace_slot_cap = 1
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_dithered_style(self):
        scene = demo_world(6)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False, style="dithered")
        a_bat = make_anim(scene, batched=True, style="dithered")
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)


class TestMembershipWords:
    def test_words_equal_dense_membership(self):
        cfg = DEFAULT_CONFIG
        tables = shadow_fast.default_tables(cfg)
        for lb in [(12, 2, 2), (0, 8, 11), (-3, 0, 30)]:
            lbj = tuple(jnp.int32(v) for v in lb)
            dense = np.asarray(shadow_fast.dda_membership(lbj, cfg, tables))
            words = shadow_fast.dda_membership_words(lbj, cfg, tables)
            unpacked = np.asarray(
                shadow_fast.unpack_member_words(words, cfg))
            np.testing.assert_array_equal(unpacked, dense, err_msg=str(lb))

    def test_words_match_packed_dense(self):
        from pixel_art_raytracer_tpu.ops.shadow_pallas import (
            pack_member_words)

        cfg = DEFAULT_CONFIG
        tables = shadow_fast.default_tables(cfg)
        lb = tuple(jnp.int32(v) for v in (5, 3, 1))
        dense = shadow_fast.dda_membership(lb, cfg, tables)
        np.testing.assert_array_equal(
            np.asarray(shadow_fast.dda_membership_words(lb, cfg, tables)),
            np.asarray(pack_member_words(dense)))


class TestAlternateConfigBatched:
    @pytest.mark.slow
    def test_batched_matches_scan_on_alt_config(self):
        # Non-default view/bin geometry through the whole batched pipeline
        # (different hash dims, row-block counts, sz table range).
        import dataclasses

        from pixel_art_raytracer_tpu.scene import SceneBuilder

        cfg = dataclasses.replace(DEFAULT_CONFIG, view_width=256,
                                  view_height=160, view_length=256)
        b = SceneBuilder(config=cfg)
        b.insert((120, 36, 40), (20, 20, 20))
        for i in range(5):
            for j in range(3):
                b.insert((i * 40, 0, j * 36), (20, 20, 20))
        scene = b.build()
        ds = DeviceScene.from_scene(scene, cfg)
        tables = shadow_fast.default_tables(cfg, max_candidates=256)

        def anim_for(batched):
            r = DeferredRenderer(cfg, shadow_impl="pallas",
                                 trace_impl="auto", shadow_tables=tables)
            r.configure_for(scene)
            from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
            cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
            return AnimationRenderer(r, cfg, static_bins=cache,
                                     batched=batched)

        a_scan, a_bat = anim_for(False), anim_for(True)
        assert a_bat._batched_capable(ds)
        light = (128, 80, 40)
        players, lights = a_scan.light_sweep_states(
            2, scene.pos[0], center=light, radius=30)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)


class TestTraceLaneTiling:
    def test_lane_tiled_kernel_matches_full_width(self):
        # Wide frames split the trace kernel over a lane-tile grid axis;
        # every phase is per-lane independent, so a forced 128-lane tiling
        # of the standard 512-lane frame must be bit-identical.
        from pixel_art_raytracer_tpu.ops import trace_pallas as tp

        cfg = DEFAULT_CONFIG
        scene = demo_world(10)
        r = make_anim(scene, batched=False).renderer
        ds = DeviceScene.from_scene(scene)
        be, cnt = jax.jit(r.build_bins)(ds)
        w_pad = -(-cfg.view_width // 128) * 128
        d0, slope, segs = tp._resolve_depth_params(
            ds.atlas_color, (ds.depth_d0, ds.depth_slope), None)
        tables = tp._expand_tables(ds.pos, ds.ext, ds.sprite_id, d0, slope,
                                   be, cnt, cfg, w_pad)
        full = tp.trace_keys_pallas(tables, cfg)
        tiled = tp.trace_keys_pallas(tables, cfg, max_lane_tile=128)
        for a, b in zip(full, tiled):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestPackedPickBounds:
    @pytest.mark.slow
    def test_out_of_bounds_atlas_uses_unpacked_kernel(self):
        # A sprite depth >= 32 exceeds the packed-pick sdep field, so
        # trace_packed must gate off and the unpacked kernel still renders
        # exactly.  (Coordinate bounds are proved over REACHABLE — binned —
        # positions, so a far-out-of-frustum entity no longer gates: the
        # cull guarantees it can never become a winner.)
        import dataclasses as dc

        from pixel_art_raytracer_tpu.assets import SpriteAtlas
        from pixel_art_raytracer_tpu.scene import SceneBuilder

        cfg = DEFAULT_CONFIG
        base = SceneBuilder(config=cfg).atlas
        deep = SpriteAtlas(color=base.color,
                           depth=np.full_like(base.depth, 35),
                           normal=base.normal)
        b = SceneBuilder(atlas=deep, config=cfg)
        b.insert((120, 36, 80), (20, 20, 20))
        for i in range(6):
            b.insert((i * 30, 0, 40), (20, 20, 20))
        scene = b.build()
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        assert a_bat.renderer.trace_packed is False
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    def test_field_pack_parity(self):
        # Packed candidate-field tables (two int32 rows for the small
        # fields) must trace pixel-identically to the unpacked layout.
        from pixel_art_raytracer_tpu.ops import trace_pallas

        scene = demo_world(10)
        assert trace_pallas.field_pack_ok(scene, DEFAULT_CONFIG)
        ds = DeviceScene.from_scene(scene)
        la = jnp.asarray(default_light().as_array())
        rp = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="pallas",
                              trace_impl="auto").configure_for(scene)
        ru = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="pallas",
                              trace_impl="auto").configure_for(scene)
        ru.trace_field_pack = False
        assert rp.trace_field_pack
        f_packed = np.asarray(rp.render_with_gbuffer(ds, la)[1])
        f_plain = np.asarray(ru.render_with_gbuffer(ds, la)[1])
        np.testing.assert_array_equal(f_packed, f_plain)

    def test_reachable_bounds_gate(self):
        from pixel_art_raytracer_tpu.scene import SceneBuilder, graybox_world
        from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer

        r = DeferredRenderer(DEFAULT_CONFIG)
        assert r._packed_bounds_ok(graybox_world()) is True
        # A culled far entity does NOT gate packing off (unreachable)...
        b = SceneBuilder(config=DEFAULT_CONFIG)
        b.insert((120, 36, 80), (20, 20, 20))
        b.insert((40, 20, 20000), (20, 20, 20))
        assert r._packed_bounds_ok(b.build()) is True
        # ...but a frustum deep enough to REACH pz >= 2^14 does: a dynamic
        # entity could move there (ADVICE r2: dynamic positions must be
        # covered by the proof, not just the static layout).
        import dataclasses as dc

        deep_cfg = dc.replace(DEFAULT_CONFIG, view_length=20000)
        r2 = DeferredRenderer(deep_cfg)
        assert r2._packed_bounds_ok(b.build()) is False


class TestTileRelevance:
    def test_packed_matches_dense(self):
        # tile_candidate_relevance (packed-word OR-fold + one-hot matmul)
        # must equal the dense-bitmap relevance indexed per candidate.
        from pixel_art_raytracer_tpu.ops import shadow_pallas as sp
        from pixel_art_raytracer_tpu.ops import shade as shade_ops

        cfg = DEFAULT_CONFIG
        scene = demo_world(8)
        tables = shadow_fast.default_tables(cfg, max_candidates=1024)
        r = make_anim(scene, batched=False).renderer
        ds = DeviceScene.from_scene(scene)
        be, cnt = jax.jit(r.build_bins)(ds)
        gbuf = r.trace(ds, be, cnt)
        la = jnp.asarray(default_light().as_array())
        tl, inv, origin, rb, lb = shade_ops.light_geometry(gbuf, la, cfg)
        words = shadow_fast.dda_membership_words(lb, cfg, tables)
        member = shadow_fast.unpack_member_words(words, cfg)
        cands = shadow_fast.build_candidates(
            ds.pos, ds.ext, be, cnt, None, cfg, tables,
            tested_any=member.any(axis=0))

        SZ = tables.sz_hi - tables.sz_lo
        W = cfg.view_width
        w_pad = -(-W // 128) * 128

        def padw(a):
            return jnp.pad(a, ((0, 0), (0, w_pad - a.shape[-1])))

        szidx = padw(jnp.clip(rb[2] - tables.sz_lo, 0, SZ - 1))
        bg = padw(((gbuf.y + gbuf.z) == 0).astype(jnp.int32))
        R = 40
        for G in (1, 2, 4):
            rel = sp.used_block_relevance(member, szidx, bg, cfg, tables,
                                          R, lane_groups=G)
            # Mask-aware dense reference: a merged candidate is relevant
            # iff ANY of its occupied bins is relevant.
            lead = rel.shape[:-1]
            relw = sp.pack_member_words(
                rel.reshape(-1, rel.shape[-1])).reshape(lead + (-1,))
            wsel = relw[..., cands.bin // 32]
            dense = np.asarray(cands.valid
                               & ((wsel & cands.mask.astype(jnp.uint32))
                                  != 0))
            packed = np.asarray(sp.tile_candidate_relevance(
                words, szidx, bg, cands, cfg, tables, R, lane_groups=G))
            np.testing.assert_array_equal(packed, dense, err_msg=f"G={G}")

    def test_range_hull_is_superset(self):
        # range_candidate_relevance (block [sz_lo, sz_hi) hull) must keep
        # every exactly-relevant candidate: hull relc >= exact relc
        # elementwise (its exactness argument is superset + pruning
        # monotonicity; end-to-end pixel equality is covered by the
        # golden tier).
        from pixel_art_raytracer_tpu.ops import shadow_pallas as sp
        from pixel_art_raytracer_tpu.ops import shade as shade_ops

        cfg = DEFAULT_CONFIG
        scene = demo_world(8)
        tables = shadow_fast.default_tables(cfg, max_candidates=1024)
        r = make_anim(scene, batched=False).renderer
        ds = DeviceScene.from_scene(scene)
        be, cnt = jax.jit(r.build_bins)(ds)
        gbuf = r.trace(ds, be, cnt)
        la = jnp.asarray(default_light().as_array())
        tl, inv, origin, rb, lb = shade_ops.light_geometry(gbuf, la, cfg)
        words = shadow_fast.dda_membership_words(lb, cfg, tables)
        member = shadow_fast.unpack_member_words(words, cfg)
        cands = shadow_fast.build_candidates(
            ds.pos, ds.ext, be, cnt, None, cfg, tables,
            tested_any=member.any(axis=0))
        SZ = tables.sz_hi - tables.sz_lo
        W = cfg.view_width
        w_pad = -(-W // 128) * 128

        def padw(a):
            return jnp.pad(a, ((0, 0), (0, w_pad - a.shape[-1])))

        szidx = padw(jnp.clip(rb[2] - tables.sz_lo, 0, SZ - 1))
        bg = padw(((gbuf.y + gbuf.z) == 0).astype(jnp.int32))
        dot = (gbuf.normal[..., 0] * tl[0] + gbuf.normal[..., 1] * tl[1]
               + gbuf.normal[..., 2] * tl[2])
        needs = padw((dot > 0).astype(jnp.int32))
        R = 40
        for G in (1, 2):
            exact = np.asarray(sp.tile_candidate_relevance(
                words, szidx, bg, cands, cfg, tables, R, lane_groups=G,
                needs=needs))
            szr = sp.block_sz_ranges(szidx, bg, W, R, SZ, needs=needs)
            hull = np.asarray(sp.range_candidate_relevance(
                words, szr, cands, cfg, tables, R, lane_groups=G))
            assert (hull | ~exact).all(), f"hull dropped candidates, G={G}"


class TestTraceCompaction:
    @pytest.mark.slow
    def test_slot_compaction_opt_in_parity(self):
        # Slot compaction defaults OFF since round 3 (measured slower
        # than full capacity with whole-bin-row trace blocks); the
        # opt-in must still derive a real bound and stay pixel-exact.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_def = make_anim(scene, batched=True)
        assert a_def.trace_slot_cap is None
        a_bat = make_anim(scene, batched=True).enable_slot_compaction()
        if a_bat.trace_slot_cap is None:
            pytest.skip("demo scene fills every slot; no bound to derive")
        players, lights = sweep(a_def, scene, 2)
        base = np.asarray(a_def.render_states(ds, players, lights))
        capped = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(capped, base)

    @pytest.mark.slow
    def test_compact_bound_derived_and_parity(self):
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_bat = make_anim(scene, batched=True).enable_trace_compaction()
        assert a_bat.trace_compact is not None
        assert a_bat.trace_compact % 8 == 0
        a_scan = make_anim(scene, batched=False)
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)

    @pytest.mark.slow
    def test_overflow_reroutes_to_uncompacted(self):
        # A deliberately too-small bound must reroute (lax.cond) to the
        # uncompacted kernel and still match the scan path exactly.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True).enable_trace_compaction()
        a_bat.trace_compact = 8            # demo columns exceed this
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)


class TestNonRampAtlasBatched:
    @pytest.mark.slow
    def test_matches_scan_path_on_rect_depth(self):
        # Non-column-constant depth maps ride the kernel's ramp-rect
        # select chain (trace_pallas.depth_rects); the packed winner picks
        # carry the rect-resolved sdep into the winner-direct shadow
        # kernel — must stay pixel-identical to the scan path.
        from pixel_art_raytracer_tpu.assets import SpriteAtlas, make_tile_floor

        tile = make_tile_floor()
        h, w = tile.depth.shape[-2:]
        r_ = np.arange(h)[:, None]
        c_ = np.arange(w)[None, :]
        depth1 = (np.maximum(0, 19 - r_) + (c_ % 7)).astype(np.int32)
        atlas = SpriteAtlas(
            color=np.stack([tile.color[0], tile.color[0]]),
            depth=np.stack([tile.depth[0], depth1]),
            normal=np.stack([tile.normal[0], tile.normal[0]]))
        from pixel_art_raytracer_tpu.scene import SceneBuilder

        b = SceneBuilder(atlas=atlas)
        b.insert((100, 20, 60), (20, 20, 20), sprite_id=1)   # player
        for i in range(5):
            b.insert((40 + i * 30, 0, 50 + (i % 3) * 24), (20, 20, 20),
                     sprite_id=i % 2)
        scene = b.build()
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_bat = make_anim(scene, batched=True)
        assert a_bat._batched_capable(ds)
        assert len(a_bat.renderer.depth_segments[0]) == 7
        players, lights = sweep(a_scan, scene, 2)
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_bat = np.asarray(a_bat.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_bat, f_scan)


class TestFusedKernel:
    """Fused trace+shadow kernel (ops/fused_pallas): one launch runs
    primary visibility AND shadow occlusion per (frame, row-block) tile.
    Must be pixel-identical to the two-kernel default (VERDICT r4 #2)."""

    def test_fused_matches_default(self):
        # demo_world has start-bin z spread over several bins, so the
        # in-kernel sz hull (sz_source="reduce") does real per-block
        # reduction work here, not a degenerate single-sz fold.
        scene = demo_world(10)
        ds = DeviceScene.from_scene(scene)
        a_def = make_anim(scene, batched=True)
        a_fus = make_anim(scene, batched=True)
        a_fus.renderer.fuse_trace_shadow = True
        players, lights = sweep(a_def, scene, 2)
        f_fus = np.asarray(a_fus.render_states(ds, players, lights))
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_fus, f_def)

    @pytest.mark.slow
    def test_fused_guard_reroutes_far_light(self):
        # One frame's light is far outside the grid: the fused path's
        # batch-level guard must discard the kernel outputs, reroute to
        # the exact dynamic march with exact-chain geometry, and still
        # match the per-frame scan path.
        scene = demo_world(8)
        ds = DeviceScene.from_scene(scene)
        a_scan = make_anim(scene, batched=False)
        a_fus = make_anim(scene, batched=True)
        a_fus.renderer.fuse_trace_shadow = True
        players, lights = sweep(a_scan, scene, 2)
        lights = lights.at[1].set(jnp.asarray([2000, 900, 80], jnp.int32))
        f_scan = np.asarray(a_scan.render_states(ds, players, lights))
        f_fus = np.asarray(a_fus.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_fus, f_scan)

    @pytest.mark.slow
    def test_fused_depth_spread_scene(self):
        # Boxes spread across the full z range with mixed heights: every
        # row block sees a multi-bin [sz_lo, sz_hi) hull and the winner
        # rows mix many szidx values — the sz_source="reduce" stress
        # shape.  Player moved per frame so dynamic overrides ride along.
        from pixel_art_raytracer_tpu.scene import SceneBuilder

        cfg = DEFAULT_CONFIG
        b = SceneBuilder(config=cfg)
        b.insert((cfg.view_width // 2, 36, cfg.view_length // 4),
                 (20, 20, 20))
        for i in range(12):
            for j in range(14):
                y = (i * 5 + j * 11) % 3 * 20
                b.insert((i * 40, y, j * 22), (20, 20, 20))
        scene = b.build()
        ds = DeviceScene.from_scene(scene)
        a_def = make_anim(scene, batched=True)
        a_fus = make_anim(scene, batched=True)
        a_fus.renderer.fuse_trace_shadow = True
        players, lights = sweep(a_def, scene, 2)
        players = players.at[1, 0].add(25)
        f_fus = np.asarray(a_fus.render_states(ds, players, lights))
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_fus, f_def)

    def test_fused_vmem_gate_falls_back(self, monkeypatch):
        # Oversized shapes must take the two-kernel path (and still
        # render identically) instead of hitting a Mosaic scoped-vmem
        # compile error.  Shrinking the budget simulates the hostile
        # shape cheaply (the real 4096-wide case is exercised by
        # fused_vmem_bytes below).
        from pixel_art_raytracer_tpu.ops import fused_pallas

        def boom(*a, **k):
            raise AssertionError("fused kernel launched past the gate")

        monkeypatch.setattr(fused_pallas, "VMEM_BUDGET_BYTES", 1)
        monkeypatch.setattr(fused_pallas, "fused_call_batched", boom)
        scene = demo_world(6)
        ds = DeviceScene.from_scene(scene)
        a_def = make_anim(scene, batched=True)
        a_fus = make_anim(scene, batched=True)
        a_fus.renderer.fuse_trace_shadow = True
        players, lights = sweep(a_def, scene, 1)
        f_fus = np.asarray(a_fus.render_states(ds, players, lights))
        f_def = np.asarray(a_def.render_states(ds, players, lights))
        np.testing.assert_array_equal(f_fus, f_def)

    def test_fused_vmem_bytes_shapes(self):
        # Default graybox shape fits; a 4096-wide lane-tiled frame does
        # not (the keys scratch alone is R*NC*w_pad*4 = 42 MB).
        from pixel_art_raytracer_tpu.ops import fused_pallas

        cfg = DEFAULT_CONFIG
        tables = shadow_fast.default_tables(cfg)
        assert fused_pallas.fused_fits(cfg, tables, 40, 512)
        assert not fused_pallas.fused_fits(cfg, tables, 40, 4096)
        with pytest.raises(ValueError, match="VMEM estimate"):
            import dataclasses
            F, n_f, HH, NC, KP = 1, 7, cfg.hash_height, 64, 4096
            fused_pallas.fused_call_batched(
                jnp.zeros((F, n_f, HH, NC, KP), jnp.float32), None,
                jnp.zeros((F, 8), jnp.int32),
                jnp.zeros((F, 3), jnp.int32),
                jnp.zeros((F, 2, 128), jnp.int32),
                jnp.zeros((F, 2, 128), jnp.int32),
                jnp.zeros((F, 16, 128), jnp.int32),
                jnp.zeros((F, 2, 128), jnp.int32),
                jnp.zeros((F, 8, 2 * (tables.sz_hi - tables.sz_lo + 1)
                           * 24, 128), jnp.int32),
                dataclasses.replace(cfg, view_width=4096), tables)
