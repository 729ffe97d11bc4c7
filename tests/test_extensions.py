"""Extensions beyond reference parity: dithered shading, supersampling,
directional lights (BASELINE configs 3-5 features)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import SceneBuilder, demo_world, Light
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.models.supersample import (SupersampledRenderer,
                                                        scale_atlas)
from pixel_art_raytracer_tpu.ops import dither, shade as shade_ops

SMALL = RenderConfig(view_width=80, view_height=80, view_length=80)


def small_scene(config=SMALL):
    b = SceneBuilder(config=config)
    b.insert((30, 20, 20), (20, 20, 20))
    for i in range(3):
        for j in range(3):
            b.insert((i * 24, 0, j * 24), (16, 16, 16))
    return b.build()


class TestDither:
    def test_bayer_properties(self):
        m = dither.bayer_matrix(4)
        assert m.shape == (4, 4)
        # all 16 thresholds distinct, in (0, 1)
        assert len(np.unique(m)) == 16
        assert m.min() > 0 and m.max() < 1

    def test_dither_endpoints(self):
        luma = jnp.asarray([0.0, 0.5, 1.0])
        # brightness 1.0 on the brightest color stays at the top index
        idx = dither.dither_to_palette(jnp.full((8, 8), 1.0), luma)
        assert (np.asarray(idx) == 2).all()
        idx0 = dither.dither_to_palette(jnp.full((8, 8), 0.0), luma)
        assert (np.asarray(idx0) == 0).all()

    def test_dither_mixes_between_levels(self):
        luma = jnp.asarray([0.0, 0.5, 1.0])
        idx = dither.dither_to_palette(jnp.full((16, 16), 0.75), luma)
        vals, counts = np.unique(np.asarray(idx), return_counts=True)
        assert set(vals) == {1, 2}
        # ~half each
        assert abs(counts[0] - counts[1]) <= 16

    def test_dithered_render_uses_palette_only(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8, style="dithered")
        r.spans = r.spans_for(scene)
        ds = DeviceScene.from_scene(scene, SMALL)
        frame = np.asarray(r.render(ds, np.array([60, 60, 20])))
        pal = set(map(tuple, SMALL.palette_array[:, :3]))
        got = set(map(tuple, frame.reshape(-1, 3)))
        assert got <= pal


class TestSupersample:
    def test_scale_atlas_ramp(self):
        from pixel_art_raytracer_tpu.assets import make_tile_floor

        a2 = scale_atlas(make_tile_floor(), 2)
        assert a2.color.shape == (1, 80, 40)
        d = a2.depth[0, :, 0]
        assert d[0] == 39 and d[1] == 38 and d[39] == 0 and (d[40:] == 0).all()

    def test_downsampled_shape_and_content(self):
        scene = small_scene()
        ss = SupersampledRenderer(SMALL, factor=2, shadow_impl="fast")
        frame = ss.render_numpy(scene, Light(60, 60, 20))
        assert frame.shape == (80, 80, 3)
        base = DeferredRenderer(SMALL, shadow_max_steps=8)
        base.spans = base.spans_for(scene)
        f0 = np.asarray(base.render(DeviceScene.from_scene(scene, SMALL),
                                    np.array([60, 60, 20])))
        # Same scene structure: images correlate strongly but are not equal.
        diff = np.abs(frame.astype(int) - f0.astype(int)).mean()
        assert diff < 20
        assert frame.std() > 5


class TestDirectionalLight:
    def test_directional_shading(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        ds = DeviceScene.from_scene(scene, SMALL)
        be, cnt = jax.jit(r.build_bins)(ds)
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        frame = np.asarray(jax.jit(
            lambda g, b, c: shade_ops.shade_directional(
                ds.pos, ds.ext, g, b, c, jnp.asarray([0.3, 1.0, -0.2]),
                SMALL, max_steps=8))(gbuf, be, cnt))
        assert frame.shape == (80, 80, 3)
        # top faces (normal +y) with light from above are lit above ambient
        top = np.asarray(gbuf.normal)[..., 1] == 1.0
        assert (frame[top][:, 0] > 31).any()

    def test_vertical_direction_fully_lights_tops(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        ds = DeviceScene.from_scene(scene, SMALL)
        be, cnt = jax.jit(r.build_bins)(ds)
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        frame = np.asarray(shade_ops.shade_directional(
            ds.pos, ds.ext, gbuf, be, cnt, jnp.asarray([0.0, 1.0, 0.0]),
            SMALL, max_steps=8))
        top = np.asarray(gbuf.normal)[..., 1] == 1.0
        colors = np.asarray(gbuf.color)[..., 0]
        # dot == 1 -> brightness 1 -> full palette color on unshadowed tops
        lit_frac = (frame[..., 0][top] == colors[top]).mean()
        assert lit_frac > 0.5


class TestDirectionalIntervals:
    """Unit-level validation of the extended-start-space interval argument
    (ops/shadow_dir.py module docstring): within one start bin each
    light-bin axis takes at most VX/VY/VZ consecutive values, and the
    variant decomposition reconstructs every pixel's exact light bin."""

    def test_variant_decomposition_reconstructs_light_bins(self):
        from pixel_art_raytracer_tpu.ops import shadow_dir
        from pixel_art_raytracer_tpu.ops import shadow_fast
        from pixel_art_raytracer_tpu.ops.cstyle import c_div

        cfg = SMALL
        bs = cfg.bin_size
        tables = shadow_fast.default_tables(cfg)
        rng = np.random.default_rng(7)
        dirs = np.concatenate([
            np.eye(3, dtype=np.float32),
            -np.eye(3, dtype=np.float32),
            rng.uniform(-1, 1, (24, 3)).astype(np.float32),
        ])
        dirs = dirs[np.abs(dirs).sum(axis=1) > 1e-3]

        # Dense (wy, wz) sweep over values a hit G-buffer can carry: the
        # oblique invariant wy + wz == screen_j bounds the sum to the
        # screen row range (background pixels carry wy == wz == 0 and
        # route through t_bg, not pixel_rows); wz may be negative
        # (sz_lo < 0).
        H = cfg.view_height
        wys = np.arange(0, H + 1, dtype=np.int32)
        wzs = np.arange(-bs, cfg.view_length + bs, dtype=np.int32)
        y_g, z_g = (a.reshape(-1) for a in np.meshgrid(wys, wzs))
        hit = (y_g + z_g >= 1) & (y_g + z_g < H)
        y_g, z_g = y_g[hit], z_g[hit]
        y_j = jnp.asarray(y_g)[:, None]
        z_j = jnp.asarray(z_g)[:, None]

        for d in dirs:
            tl, inv, K = shadow_dir.direction_constants(jnp.asarray(d), cfg)
            K_np = tuple(int(k) for k in K)
            mx, my, mz = (np.asarray(a) for a in
                          shadow_dir.axis_bases(K, cfg, tables))

            # Per-pixel y/z variants: the clip in pixel_rows must never
            # bind for in-range starts, and base + variant must equal the
            # true per-pixel light bin (what the scan path marches toward).
            ez, rbz = (np.asarray(a)[:, 0] for a in shadow_dir.pixel_rows(
                y_j, z_j, K, cfg, tables))
            lbx_t, lby_t, lbz_t = (np.asarray(a)[:, 0] for a in
                                   shadow_dir.pixel_light_bins(
                                       y_j, z_j, K, cfg))
            jp = cfg.view_height - y_g - z_g
            sy = np.trunc(jp / bs).astype(np.int64)
            szi = rbz - tables.sz_lo
            in_range = (szi >= 0) & (szi < tables.sz_hi - tables.sz_lo)
            sy_ok = (sy >= 0) & (sy <= cfg.hash_height)
            sel = in_range & sy_ok
            vz = ez % shadow_dir.VZ
            vy = (ez // shadow_dir.VZ) - szi * shadow_dir.VY
            assert ((vy >= 0) & (vy < shadow_dir.VY))[sel].all()
            assert ((vz >= 0) & (vz < shadow_dir.VZ))[sel].all()
            np.testing.assert_array_equal((my[sy] + vy)[sel], lby_t[sel])
            np.testing.assert_array_equal((mz[szi] + vz)[sel], lbz_t[sel])

            # Per-lane x variants.
            w_pad = 128
            rows, sel_m = shadow_dir.lane_rows_and_matrix(K[0], cfg, w_pad)
            rows = np.asarray(rows)
            lanes = np.arange(cfg.view_width)
            sx = np.minimum(lanes // bs, cfg.hash_width - 1)
            vx = rows[lanes] - sx * shadow_dir.VX
            assert ((vx >= 0) & (vx < shadow_dir.VX)).all()
            lbx_true = np.asarray(c_div(jnp.asarray(lanes, jnp.int32)
                                        + K_np[0], bs))
            np.testing.assert_array_equal(mx[sx] + vx, lbx_true)
            # The selection matrix is one-hot exactly on view lanes.
            sel_np = np.asarray(sel_m)
            assert (sel_np[:, :cfg.view_width].sum(axis=0) == 1).all()
            assert (sel_np[:, cfg.view_width:] == 0).all()
