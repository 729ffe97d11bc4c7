"""Spatial-hash binning: unit semantics + three-way implementation parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import SceneBuilder, demo_world, Scene
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.ops import binning
from pixel_art_raytracer_tpu.runtime import native


def jax_bins(scene, config=DEFAULT_CONFIG):
    spans = binning.entity_span_bound(scene.ext.max(axis=0), config)
    be, cnt = jax.jit(
        lambda p, e: binning.build_bins(p, e, config, spans)
    )(jnp.asarray(scene.pos), jnp.asarray(scene.ext))
    return np.asarray(be), np.asarray(cnt)


def stack_scene(n, bx=2, by=1, bz=3, config=DEFAULT_CONFIG):
    """n disjoint-in-y 4-unit boxes all landing in the same bin."""
    b = SceneBuilder(config=config)
    bs = config.bin_size
    for k in range(n):
        # All inside bin (bx, by, bz): world x in [bx*bs, ...), and the
        # y range must satisfy the screen-y binning with the z shear.
        x = bx * bs + 4
        z = bz * bs + 4
        # screen row band: vh - y - z in [by*bs, (by+1)*bs)
        y = config.view_height - (by * bs + 8 + k) - z - 8
        b.insert((x, y, z), (4, 4, 4))
    return b.build()


class TestWrapSemantics:
    """Occupancy wraps with & (cap-1), silently overwriting oldest entries
    (alternative.cpp:259-264, quirk Q3)."""

    def test_under_capacity(self):
        scene = stack_scene(3)
        be, cnt = oracle.build_bins(scene)
        occupied = np.nonzero(cnt)[0]
        assert len(occupied) >= 1
        f = occupied[0]
        assert cnt[f] == 3
        np.testing.assert_array_equal(be[f, :3], [0, 1, 2])

    def test_exactly_capacity_reads_as_empty(self):
        # 8 entities in one bin -> visible count is 8 & 7 == 0.
        scene = stack_scene(8)
        be, cnt = oracle.build_bins(scene)
        # all slots written, but count wrapped to zero
        rows = np.nonzero((be >= 0).any(axis=1))[0]
        assert len(rows) >= 1
        f = rows[0]
        assert cnt[f] == 0
        np.testing.assert_array_equal(sorted(be[f]), range(8))

    def test_overflow_overwrites_oldest(self):
        scene = stack_scene(10)
        be, cnt = oracle.build_bins(scene)
        rows = np.nonzero((be >= 0).any(axis=1))[0]
        f = rows[0]
        assert cnt[f] == 2
        # slots 0,1 hold the 9th and 10th entities (ranks 8, 9)
        np.testing.assert_array_equal(be[f, :2], [8, 9])
        # slots 2..7 hold ranks 2..7
        np.testing.assert_array_equal(be[f, 2:], [2, 3, 4, 5, 6, 7])

    @pytest.mark.parametrize("n", [1, 7, 8, 9, 16, 20])
    def test_jax_matches_oracle(self, n):
        scene = stack_scene(n)
        be_p, cnt_p = oracle.build_bins(scene)
        be_j, cnt_j = jax_bins(scene)
        np.testing.assert_array_equal(be_j, be_p)
        np.testing.assert_array_equal(cnt_j, cnt_p)


class TestCulling:
    def test_far_entities_never_binned(self):
        b = SceneBuilder()
        b.insert((10000, 0, 0), (20, 20, 20))     # off to the right
        b.insert((-10000, 0, 0), (20, 20, 20))    # off to the left
        b.insert((0, 0, 10000), (20, 20, 20))     # far beyond view length
        scene = b.build()
        be, cnt = oracle.build_bins(scene)
        assert (cnt == 0).all() and (be == -1).all()
        be_j, cnt_j = jax_bins(scene)
        np.testing.assert_array_equal(be_j, be)
        np.testing.assert_array_equal(cnt_j, cnt)

    def test_negative_z_shear(self):
        # Entities with negative z can still land in view (y shear).
        b = SceneBuilder()
        b.insert((100, 100, -30), (20, 20, 20))
        scene = b.build()
        be_p, cnt_p = oracle.build_bins(scene)
        be_j, cnt_j = jax_bins(scene)
        np.testing.assert_array_equal(be_j, be_p)
        np.testing.assert_array_equal(cnt_j, cnt_p)


class TestThreeWayParity:
    def test_demo_world(self):
        scene = demo_world(12)
        be_p, cnt_p = oracle.build_bins(scene)
        be_j, cnt_j = jax_bins(scene)
        np.testing.assert_array_equal(be_j, be_p)
        np.testing.assert_array_equal(cnt_j, cnt_p)
        if native.native_available():
            be_c, cnt_c = native.cpp_build_bins(scene)
            np.testing.assert_array_equal(be_c, be_p)
            np.testing.assert_array_equal(cnt_c, cnt_p)

    def test_span_bound(self):
        spans = binning.entity_span_bound(np.array([20, 20, 20]),
                                          DEFAULT_CONFIG)
        assert spans == (2, 3, 2)
