"""Unit tests for C-semantics numeric helpers (SURVEY.md §7 'hard parts')."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.ops import cstyle


NAN = float("nan")
INF = float("inf")


class TestCMinMax:
    def test_basic(self):
        assert cstyle.c_min(np.float32(1.0), np.float32(2.0)) == 1.0
        assert cstyle.c_max(np.float32(1.0), np.float32(2.0)) == 2.0

    def test_nan_second_arg_keeps_first(self):
        # std::min(a, nan) == a; std::max(a, nan) == a
        a = np.float32(3.0)
        b = np.float32(NAN)
        assert cstyle.c_min(a, b) == 3.0
        assert cstyle.c_max(a, b) == 3.0

    def test_nan_first_arg_keeps_first(self):
        # std::min(nan, b) == nan (comparison false -> returns a)
        a = np.float32(NAN)
        b = np.float32(3.0)
        assert np.isnan(cstyle.c_min(a, b))
        assert np.isnan(cstyle.c_max(a, b))

    def test_jax_matches_numpy_on_nan(self):
        a = jnp.float32(0.0)
        b = jnp.float32(NAN)
        assert float(cstyle.c_max(a, b)) == 0.0

    def test_inf(self):
        assert cstyle.c_min(np.float32(INF), np.float32(1.0)) == 1.0
        assert cstyle.c_max(np.float32(-INF), np.float32(1.0)) == 1.0


class TestCDiv:
    @pytest.mark.parametrize("a,b,expect", [
        (7, 2, 3), (-7, 2, -3), (7, -2, -3), (-7, -2, 3),
        (-20, 40, 0), (-40, 40, -1), (-41, 40, -1), (-79, 40, -1),
        (-80, 40, -2), (39, 40, 0), (40, 40, 1),
    ])
    def test_trunc_toward_zero(self, a, b, expect):
        assert int(cstyle.c_div(np.int32(a), np.int32(b))) == expect
        assert int(cstyle.c_div(jnp.int32(a), jnp.int32(b))) == expect

    def test_array(self):
        a = np.array([-79, -1, 0, 79], np.int32)
        out = cstyle.c_div(a, np.int32(40))
        np.testing.assert_array_equal(out, [-1, 0, 0, 1])
        out_j = cstyle.c_div(jnp.asarray(a), jnp.int32(40))
        np.testing.assert_array_equal(np.asarray(out_j), [-1, 0, 0, 1])


class TestColorScale:
    def test_truncates(self):
        c = np.array([100, 140, 255], np.uint8)
        out = cstyle.scale_color_u8(c, np.float32(0.25))
        np.testing.assert_array_equal(out, [25, 35, 63])  # 63.75 -> 63

    def test_identity(self):
        c = np.array([240, 0, 7], np.uint8)
        out = cstyle.scale_color_u8(c, np.float32(1.0))
        np.testing.assert_array_equal(out, c)


class TestL1Normalize:
    def test_manhattan_not_euclidean(self):
        x, y, z = cstyle.l1_normalize(np.float32(3.0), np.float32(4.0),
                                      np.float32(0.0))
        # L1 length is 7, not 5.
        assert abs(x - 3.0 / 7.0) < 1e-7
        assert abs(y - 4.0 / 7.0) < 1e-7

    def test_axis_aligned(self):
        x, y, z = cstyle.l1_normalize(np.float32(0.0), np.float32(-5.0),
                                      np.float32(0.0))
        assert (x, y, z) == (0.0, -1.0, 0.0)

    def test_zero_length_inf_nan(self):
        with np.errstate(invalid="ignore"):
            x, _, _ = cstyle.l1_normalize(np.float32(0.0), np.float32(0.0),
                                          np.float32(0.0))
        assert np.isnan(x)


class TestTruncToInt:
    def test_trunc(self):
        vals = np.array([-1.9, -0.1, 0.9, 1.9], np.float32)
        np.testing.assert_array_equal(cstyle.trunc_to_int(vals), [-1, 0, 0, 1])
        np.testing.assert_array_equal(
            np.asarray(cstyle.trunc_to_int(jnp.asarray(vals))), [-1, 0, 0, 1])
