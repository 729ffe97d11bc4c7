"""Sprite atlas tests (reference asset: src/sprites.hpp:67-364)."""

import numpy as np
import pytest

from pixel_art_raytracer_tpu.assets import make_tile_floor, concat_atlases
from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG


class TestTileFloor:
    def setup_method(self):
        self.atlas = make_tile_floor()

    def test_shape(self):
        assert self.atlas.color.shape == (1, 40, 20)
        assert self.atlas.depth.shape == (1, 40, 20)
        assert self.atlas.normal.shape == (1, 40, 20, 3)

    def test_depth_profile(self):
        # Top-face rows r in 0..19 have depth 19-r; front face rows are 0.
        d = self.atlas.depth[0]
        for r in range(20):
            assert (d[r] == 19 - r).all()
        assert (d[20:] == 0).all()

    def test_normals(self):
        n = self.atlas.normal[0]
        assert (n[:20] == np.array([0, 1, 0], np.float32)).all()
        assert (n[20:] == np.array([0, 0, -1], np.float32)).all()

    def test_color_checkerboard(self):
        c = self.atlas.color[0]
        # Border of the top face is palette 0.
        assert (c[:4] == 0).all() and (c[16:20] == 0).all()
        assert (c[4:16, :4] == 0).all() and (c[4:16, 16:] == 0).all()
        # Quadrants alternate 2/3.
        assert (c[4:10, 4:10] == 2).all() and (c[4:10, 10:16] == 3).all()
        assert (c[10:16, 4:10] == 3).all() and (c[10:16, 10:16] == 2).all()
        # Front face: dark edges, gray middle, dark feet.
        assert (c[20:38, 2:18] == 2).all()
        assert (c[20:38, :2] == 1).all() and (c[20:38, 18:] == 1).all()
        assert (c[38:] == 1).all()

    def test_row_only_depth_detected(self):
        assert self.atlas.depth_is_row_only
        rd = self.atlas.row_depth()
        assert rd.shape == (1, 40)
        assert rd[0, 0] == 19 and rd[0, 19] == 0

    def test_palette(self):
        p = DEFAULT_CONFIG.palette_array
        assert p.shape == (4, 4)
        np.testing.assert_array_equal(p[:, 0], [100, 140, 200, 240])

    def test_size_guard(self):
        with pytest.raises(ValueError):
            make_tile_floor(width=16)


class TestConcat:
    def test_concat(self):
        a = make_tile_floor()
        both = concat_atlases(a, a)
        assert both.n_sprites == 2
        assert np.array_equal(both.depth[0], both.depth[1])
