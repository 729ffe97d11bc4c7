"""Primary-visibility parity and quirk coverage."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import SceneBuilder, demo_world
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.runtime import native


def gbuffers_equal(a, b):
    return (np.array_equal(np.asarray(a.normal), b.normal)
            and np.array_equal(np.asarray(a.color), b.color)
            and np.array_equal(np.asarray(a.y), b.y)
            and np.array_equal(np.asarray(a.z), b.z)
            and np.array_equal(np.asarray(a.entity_index), b.entity_index))


def jax_gbuffer(scene, config=DEFAULT_CONFIG):
    r = DeferredRenderer(config)
    r.spans = r.spans_for(scene)
    ds = DeviceScene.from_scene(scene, config)
    be, cnt = jax.jit(r.build_bins)(ds)
    gbuf = jax.jit(r.trace)(ds, be, cnt)
    return gbuf


class TestPrimaryParity:
    def test_demo_world(self):
        scene = demo_world(10)
        be, cnt = oracle.build_bins(scene)
        gb_p = oracle.trace_pixels(scene, be, cnt)
        gb_j = jax_gbuffer(scene)
        assert gbuffers_equal(gb_j, gb_p)

    def test_background_pixel_fields(self):
        # Quirk Q6: misses carry bg color, zero normal/y/z and entity 0.
        b = SceneBuilder()
        b.insert((0, 0, 0), (20, 20, 20))
        scene = b.build()
        be, cnt = oracle.build_bins(scene)
        gb = oracle.trace_pixels(scene, be, cnt)
        assert tuple(gb.color[0, 400]) == DEFAULT_CONFIG.background
        assert (gb.normal[0, 400] == 0).all()
        assert gb.entity_index[0, 400] == 0
        gb_j = jax_gbuffer(scene)
        assert gbuffers_equal(gb_j, gb)

    def test_tie_keeps_first_writer(self):
        # Two identical overlapping boxes: strictly-greater depth compare
        # keeps the earlier entity (alternative.cpp:344-346).
        b = SceneBuilder()
        b.insert((100, 0, 100), (20, 20, 20))
        b.insert((100, 0, 100), (20, 20, 20))
        scene = b.build()
        be, cnt = oracle.build_bins(scene)
        gb = oracle.trace_pixels(scene, be, cnt)
        hit = gb.entity_index[gb.y != 0]
        assert (hit == 0).all()
        gb_j = jax_gbuffer(scene)
        assert gbuffers_equal(gb_j, gb)


class TestEarlyExit:
    """Quirk Q5: rays stop after hits in two bins without an intervening
    empty bin — observable culling, not just an optimisation.

    For the shipped floor tile the depth-key geometry makes skipped bins
    lose anyway, so observability needs sprites with larger depth offsets
    (the reference's ``Sprite::depth`` is a plain int map, so these are
    legal assets for its code path too).
    """

    def build_scene(self):
        from pixel_art_raytracer_tpu.assets import (SpriteAtlas,
                                                    make_tile_floor,
                                                    concat_atlases)
        tile = make_tile_floor()

        def const_depth(d):
            return SpriteAtlas(color=tile.color,
                               depth=np.full_like(tile.depth, d),
                               normal=tile.normal)

        atlas = concat_atlases(tile, const_depth(150), const_depth(61))
        b = SceneBuilder(atlas=atlas)
        # Entity 0: deep-offset box hit in bin z=0 (and spanning bin 1).
        b.insert((80, -59, 39), (20, 20, 20), sprite_id=1)
        # Entity 1: improves on it in bin z=1 -> two adjacent hit bins.
        b.insert((80, -60, 40), (20, 20, 20), sprite_id=2)
        # Entity 2: bin z=2 floor-tile box whose depth key (-160) beats
        # entity 1's (-161) — visible only when the ray keeps marching.
        b.insert((80, -80, 80), (20, 20, 20), sprite_id=0)
        return b.build()

    def test_observable(self):
        scene = self.build_scene()
        cfg_on = DEFAULT_CONFIG
        cfg_off = dataclasses.replace(DEFAULT_CONFIG, early_exit=False)
        be, cnt = oracle.build_bins(scene, cfg_on)
        gb_on = oracle.trace_pixels(scene, be, cnt, cfg_on)
        gb_off = oracle.trace_pixels(scene, be, cnt, cfg_off)
        # On the contested row (world_j == 20 -> j == 300) the far box wins
        # only when the ray keeps marching past the two hit bins.
        contested = (slice(300, 301), slice(80, 100))
        assert (gb_off.entity_index[contested] == 2).all()
        assert (gb_on.entity_index[contested] == 1).all()
        assert not np.array_equal(gb_on.entity_index, gb_off.entity_index)

    @pytest.mark.parametrize("early_exit", [True, False])
    def test_jax_matches_oracle(self, early_exit):
        cfg = dataclasses.replace(DEFAULT_CONFIG, early_exit=early_exit)
        scene = self.build_scene()
        be, cnt = oracle.build_bins(scene, cfg)
        gb_p = oracle.trace_pixels(scene, be, cnt, cfg)
        gb_j = jax_gbuffer(scene, cfg)
        assert gbuffers_equal(gb_j, gb_p)


@pytest.mark.skipif(not native.native_available(),
                    reason="native toolchain unavailable")
class TestCppOracleParity:
    def test_demo_world(self):
        scene = demo_world(8)
        be, cnt = oracle.build_bins(scene)
        gb_p = oracle.trace_pixels(scene, be, cnt)
        gb_c = native.cpp_trace_pixels(scene, be, cnt)
        assert gbuffers_equal(gb_c, gb_p)


class TestDepthRects:
    """Arbitrary (non-column-constant) depth maps on the Pallas kernel path
    via 2D ramp-rect decomposition (VERDICT r3 #4).  Reference per-texel
    depth fetch: alternative.cpp:336-341."""

    @staticmethod
    def pyramid_depth(tile_depth):
        """A depth map that is NOT column-constant: a row ramp offset by a
        per-column cycle (decomposes into ~40 ramp rects)."""
        h, w = tile_depth.shape[-2:]
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        return (np.maximum(0, 19 - r) + (c % 7)).astype(np.int32)

    def test_decomposition_reconstructs_map(self):
        from pixel_art_raytracer_tpu.ops.trace_pallas import (depth_rects,
                                                              depth_segments)
        from pixel_art_raytracer_tpu.assets import make_tile_floor

        tile = make_tile_floor()
        depth = self.pyramid_depth(tile.depth)[None]
        assert depth_segments(depth) is None      # not column-constant
        rects = depth_rects(depth)
        assert rects is not None
        recon = np.zeros_like(depth)
        covered = np.zeros_like(depth)
        for (s, r0, r1, c0, c1, d0, slope) in rects:
            rows = np.arange(r0, r1)
            recon[s, r0:r1, c0:c1] = (d0 - slope * (rows - r0))[:, None]
            covered[s, r0:r1, c0:c1] += 1
        np.testing.assert_array_equal(covered, 1)  # exact partition
        np.testing.assert_array_equal(recon, depth)

    def test_kernel_path_matches_oracle_on_nonramp_atlas(self):
        from pixel_art_raytracer_tpu.assets import SpriteAtlas, make_tile_floor
        from pixel_art_raytracer_tpu.scene import Light

        tile = make_tile_floor()
        depth1 = self.pyramid_depth(tile.depth)
        atlas = SpriteAtlas(
            color=np.stack([tile.color[0], tile.color[0]]),
            depth=np.stack([tile.depth[0], depth1]),
            normal=np.stack([tile.normal[0], tile.normal[0]]))
        b = SceneBuilder(atlas=atlas)
        b.insert((120, 36, 80), (20, 20, 20), sprite_id=1)   # player
        for i in range(6):
            for j in range(4):
                b.insert((60 + i * 24, 0, 40 + j * 28), (20, 20, 20),
                         sprite_id=(i + j) % 2)
        scene = b.build()
        r = DeferredRenderer(DEFAULT_CONFIG, trace_impl="pallas",
                             shadow_impl="fast")
        r.configure_for(scene)
        # The non-ramp atlas must land on the rect path, not the jnp
        # fallback: 7-tuple segments drive the kernel's clip-exact chain.
        assert r.depth_segments and len(r.depth_segments[0]) == 7
        ds = DeviceScene.from_scene(scene, DEFAULT_CONFIG)
        assert ds.depth_d0 is None                # single ramp impossible
        light = Light(170, 150, 100)
        img_k = np.asarray(r.render(ds, light.as_array()))
        img_p, _ = oracle.render_frame(scene, light)
        np.testing.assert_array_equal(img_k, img_p)
