"""Parity of the optimised implementations against the direct transcriptions:
the table-driven shadow pass and the Pallas primary tracer (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import demo_world, default_light, Light, SceneBuilder
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.ops import binning
from pixel_art_raytracer_tpu.ops.trace_pallas import ramp_depth_params


def setup(scene, **kw):
    r = DeferredRenderer(DEFAULT_CONFIG, **kw)
    r.spans = r.spans_for(scene)
    ds = DeviceScene.from_scene(scene)
    be, cnt = jax.jit(r.build_bins)(ds)
    return r, ds, be, cnt


class TestFastShadow:
    def test_matches_scan(self):
        scene = demo_world(10)
        rs, ds, be, cnt = setup(scene, shadow_impl="scan")
        rf, *_ = setup(scene, shadow_impl="fast")
        rk, *_ = setup(scene, shadow_impl="pallas")
        gbuf = jax.jit(rs.trace)(ds, be, cnt)
        sh_scan = jax.jit(rs.shade)
        sh_fast = jax.jit(rf.shade)
        sh_kern = jax.jit(rk.shade)
        for light in [Light(480, 160, 80), Light(250, 50, 150)]:
            la = jnp.asarray(light.as_array())
            f_scan = np.asarray(sh_scan(ds, gbuf, be, cnt, la))
            f_fast = np.asarray(sh_fast(ds, gbuf, be, cnt, la))
            np.testing.assert_array_equal(f_fast, f_scan, err_msg=str(light))
            f_kern = np.asarray(sh_kern(ds, gbuf, be, cnt, la))
            np.testing.assert_array_equal(f_kern, f_scan, err_msg=str(light))

    def test_derived_tables_content_bounds(self):
        # Content-derived tables: the sz range follows the scene's actual z
        # content (+ the dynamic player's frustum reach) and the candidate
        # capacity follows the static bin occupancy — both strictly tighter
        # than the scene-agnostic defaults on the demo world.
        from pixel_art_raytracer_tpu.ops import shadow_fast

        scene = demo_world(10)
        t = shadow_fast.derive_tables(DEFAULT_CONFIG, scene)
        d = shadow_fast.default_tables(DEFAULT_CONFIG)
        assert t.sz_lo <= 0 < t.sz_hi
        assert (t.sz_hi - t.sz_lo) < (d.sz_hi - d.sz_lo)
        assert t.max_candidates < d.max_candidates
        assert t.max_candidates % 128 == 0

    def test_derived_tables_pixel_parity(self):
        # Derived tables must render pixel-identically to the defaults
        # (the table bounds only size capacity/pruning structures).
        scene = demo_world(10)
        rd, ds, be, cnt = setup(scene, shadow_impl="fast")
        rder = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="fast")
        rder.configure_for(scene)
        assert rder.shadow_tables is not None   # auto-derived
        gbuf = jax.jit(rd.trace)(ds, be, cnt)
        la = jnp.asarray(default_light().as_array())
        f_def = np.asarray(jax.jit(rd.shade)(ds, gbuf, be, cnt, la))
        f_der = np.asarray(jax.jit(rder.shade)(ds, gbuf, be, cnt, la))
        np.testing.assert_array_equal(f_der, f_def)

    def test_no_candidate_overflow_on_demo(self):
        from pixel_art_raytracer_tpu.ops import shadow_fast

        scene = demo_world(10)
        _, ds, be, cnt = setup(scene)
        t = shadow_fast.default_tables(DEFAULT_CONFIG)
        member = shadow_fast.dda_membership(
            (jnp.int32(12), jnp.int32(2), jnp.int32(2)), DEFAULT_CONFIG, t)
        cands = shadow_fast.build_candidates(ds.pos, ds.ext, be, cnt, member,
                                             DEFAULT_CONFIG, t)
        assert not bool(cands.overflow)


class TestPallasTrace:
    def test_ramp_fit(self):
        from pixel_art_raytracer_tpu.assets import make_tile_floor

        params = ramp_depth_params(np.asarray(make_tile_floor().depth))
        assert params is not None
        d0, slope = params
        assert d0[0] == 19 and slope[0] == 1

    def test_ramp_fit_rejects_arbitrary(self):
        depth = np.zeros((1, 40, 20), np.int32)
        depth[0, 5, 7] = 3
        assert ramp_depth_params(depth) is None

    def test_matches_jnp_tracer(self):
        scene = demo_world(10)
        rj, ds, be, cnt = setup(scene, trace_impl="jnp")
        rp, *_ = setup(scene, trace_impl="pallas")
        gb_j = jax.jit(rj.trace)(ds, be, cnt)
        gb_p = jax.jit(rp.trace)(ds, be, cnt)
        for f in gb_j._fields:
            np.testing.assert_array_equal(np.asarray(getattr(gb_p, f)),
                                          np.asarray(getattr(gb_j, f)),
                                          err_msg=f)

    def test_early_exit_respected(self):
        # The early-exit scene from test_trace must also cull under pallas.
        from tests.test_trace import TestEarlyExit

        scene = TestEarlyExit().build_scene()
        # constant-depth sprites (150, 61) are ramps with slope 0 -> pallas ok
        rj, ds, be, cnt = setup(scene, trace_impl="jnp")
        rp, *_ = setup(scene, trace_impl="pallas")
        assert ds.depth_d0 is not None
        gb_j = jax.jit(rj.trace)(ds, be, cnt)
        gb_p = jax.jit(rp.trace)(ds, be, cnt)
        np.testing.assert_array_equal(np.asarray(gb_p.entity_index),
                                      np.asarray(gb_j.entity_index))
        assert (np.asarray(gb_p.entity_index)[300, 80:100] == 1).all()


def _two_sprite_atlas():
    """Floor tile plus a sprite whose depth is column-constant but NOT a
    single ramp (constant 7 for rows 0-9, ramp 19-r for rows 10-19, 0
    below) — exercises the piecewise-segment tracer path."""
    from pixel_art_raytracer_tpu.assets import (SpriteAtlas, concat_atlases,
                                                make_tile_floor)

    base = make_tile_floor()
    depth = np.zeros((1, 40, 20), np.int32)
    depth[0, :10] = 7
    rows = np.arange(10, 20)
    depth[0, 10:20] = (19 - rows)[:, None]
    color = np.asarray(base.color).copy()
    color[0, :5] = 1
    normal = np.asarray(base.normal).copy()
    return concat_atlases(base, SpriteAtlas(color=color, depth=depth,
                                            normal=normal))


class TestDepthSegments:
    def test_fit_tile(self):
        from pixel_art_raytracer_tpu.assets import make_tile_floor
        from pixel_art_raytracer_tpu.ops.trace_pallas import depth_segments

        segs = depth_segments(np.asarray(make_tile_floor().depth))
        assert segs == ((0, 0, 20, 19, 1), (0, 20, 40, 0, 0))

    def test_fit_rejects_column_varying(self):
        from pixel_art_raytracer_tpu.ops.trace_pallas import depth_segments

        depth = np.zeros((1, 40, 20), np.int32)
        depth[0, 5, 7] = 3
        assert depth_segments(depth) is None

    def test_fit_reconstructs(self):
        from pixel_art_raytracer_tpu.ops.trace_pallas import depth_segments

        atlas = _two_sprite_atlas()
        segs = depth_segments(np.asarray(atlas.depth))
        assert segs is not None
        recon = np.zeros_like(np.asarray(atlas.depth))
        for (s, r0, r1, d0, slope) in segs:
            rows = np.arange(r0, r1)
            recon[s, r0:r1] = (d0 - slope * (rows - r0))[:, None]
        np.testing.assert_array_equal(recon, np.asarray(atlas.depth))

    def test_segment_tracer_matches_jnp(self):
        """Non-ramp 2-sprite atlas through trace_impl='pallas' (VERDICT
        round-1 item 7): pixel-exact against the jnp tracer."""
        atlas = _two_sprite_atlas()
        b = SceneBuilder(atlas=atlas, config=DEFAULT_CONFIG)
        b.insert((240, 36, 80), (20, 20, 20), sprite_id=1)
        for i in range(6):
            for j in range(6):
                b.insert((i * 20, 0, j * 20), (20, 20, 20),
                         sprite_id=(i + j) % 2)
        scene = b.build()
        ds = DeviceScene.from_scene(scene)
        assert ds.depth_d0 is None          # not a single ramp
        rj = DeferredRenderer(DEFAULT_CONFIG,
                              trace_impl="jnp").configure_for(scene)
        rp = DeferredRenderer(DEFAULT_CONFIG,
                              trace_impl="pallas").configure_for(scene)
        assert rp.depth_segments is not None
        be, cnt = jax.jit(rj.build_bins)(ds)
        gb_j = jax.jit(rj.trace)(ds, be, cnt)
        gb_p = jax.jit(rp.trace)(ds, be, cnt)
        for f in gb_j._fields:
            np.testing.assert_array_equal(np.asarray(getattr(gb_p, f)),
                                          np.asarray(getattr(gb_j, f)),
                                          err_msg=f)
        # Full shaded frame too (select-chain epilogues on a 2-sprite atlas).
        light = default_light()
        f_j = np.asarray(jax.jit(rj.shade)(
            ds, gb_j, be, cnt, jnp.asarray(light.as_array())))
        f_p = np.asarray(jax.jit(rp.shade)(
            ds, gb_p, be, cnt, jnp.asarray(light.as_array())))
        np.testing.assert_array_equal(f_p, f_j)


class TestFullFastPipeline:
    def test_end_to_end_matches_oracle(self):
        from pixel_art_raytracer_tpu import oracle

        scene = demo_world(10)
        light = default_light()
        r = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="fast",
                             trace_impl="auto")
        r.spans = r.spans_for(scene)
        ds = DeviceScene.from_scene(scene)
        frame = np.asarray(r.render(ds, light.as_array()))
        img_p, _ = oracle.render_frame(scene, light)
        np.testing.assert_array_equal(frame, img_p)


class TestBenchPath:
    def test_static_bins_plus_kernels_match_oracle(self):
        """The exact configuration bench.py runs (static-bin cache + Pallas
        trace + Pallas shadow) must match the oracle frame-for-frame."""
        import jax.numpy as jnp

        from pixel_art_raytracer_tpu import oracle
        from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
        from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
        from pixel_art_raytracer_tpu.scene import Light

        scene = demo_world(5)
        r = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="pallas",
                             trace_impl="auto")
        r.configure_for(scene)
        cache = StaticBins(scene.pos, scene.ext, 1, DEFAULT_CONFIG, r.spans)
        anim = AnimationRenderer(r, DEFAULT_CONFIG, static_bins=cache)
        ds = DeviceScene.from_scene(scene)
        players = np.stack([scene.pos[0], scene.pos[0] + (5, 0, 0)]).astype(np.int32)
        lights = np.asarray([[480, 160, 80], [250, 50, 150]], np.int32)
        frames = np.asarray(anim.render_states(ds, jnp.asarray(players),
                                               jnp.asarray(lights)))
        for k in range(2):
            import dataclasses
            sc = dataclasses.replace(scene, pos=scene.pos.copy())
            sc.pos[0] = players[k]
            img_p, _ = oracle.render_frame(sc, Light(*map(int, lights[k])))
            np.testing.assert_array_equal(frames[k], img_p, err_msg=f"frame {k}")


class TestLaneFit:
    """VMEM-aware shadow lane-group selection (round-5 scale regression:
    the kernel's membership state scales with the HASH VOLUME —
    (SZ+1)*n_words*gw words per lane tile — so big worlds OOM'd Mosaic's
    16 MB scoped-vmem stack at the graybox-optimal 512-lane tile)."""

    def test_graybox_keeps_single_512_tile(self):
        from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas

        cfg = DEFAULT_CONFIG
        tables = shadow_fast.default_tables(cfg)
        w_pad = -(-cfg.view_width // 128) * 128
        assert shadow_pallas.fit_lane_groups(w_pad, 1, cfg, tables,
                                             40) == 1

    def test_big_world_splits_lanes(self):
        # The 10k-box 2048^2 scale shape (bin 80, hash 26x26x8 ->
        # n_words=169) needed a 17.73 MB stack at gw=512 (observed
        # compile OOM); the fit must choose gw <= 256.
        from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas

        cfg = RenderConfig(view_width=2048, view_height=2048,
                           view_length=640, bin_size=80)
        tables = shadow_fast.default_tables(cfg)
        w_pad = -(-cfg.view_width // 128) * 128
        g = shadow_pallas.fit_lane_groups(w_pad, 1, cfg, tables, 40)
        assert w_pad // g <= 256, (g, w_pad // g)

    def test_requested_groups_still_honoured(self):
        from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas

        cfg = DEFAULT_CONFIG
        tables = shadow_fast.default_tables(cfg)
        w_pad = -(-cfg.view_width // 128) * 128
        assert shadow_pallas.fit_lane_groups(w_pad, 2, cfg, tables,
                                             40) == 2
