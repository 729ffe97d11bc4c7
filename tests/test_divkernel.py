"""Correctly-rounded Mosaic division primitives (ops/divkernel.py).

The quick tier runs randomized + boundary coverage of both operand
classes against numpy's IEEE float32 divide (CPU divides are correctly
rounded); the slow tier runs the EXHAUSTIVE sweeps — every (n, L) pair
with 0 <= n <= L < 2^13 for :func:`rn_div_int` (2^25 pairs, both signs)
and every mantissa at every renderer-class exponent for
:func:`rn_recip`.  All comparisons are bit-exact (int32 views), so signed
zeros, infinities, and NaNs are covered too.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.ops.divkernel import rn_div_int, rn_recip


def _bits(a):
    return np.asarray(a, np.float32).view(np.int32)


class TestDivInt:
    def test_boundaries_and_specials(self):
        # In-domain pairs only (the contract is |d| <= L < 2^13).
        n = np.array([0, 0, 1, 1, 4095, 4096, 8191, 8190, 3, 5, 7],
                     np.int32)
        L = np.array([0, 7, 1, 8191, 8191, 8191, 8191, 8191, 7, 7, 7],
                     np.int32)
        for sgn in (1, -1):
            q = np.asarray(jax.jit(rn_div_int)(jnp.asarray(sgn * n),
                                               jnp.asarray(L)))
            with np.errstate(divide="ignore", invalid="ignore"):
                ref = (sgn * n).astype(np.float32) / L.astype(np.float32)
            both_nan = np.isnan(q) & np.isnan(ref)
            assert np.all(both_nan | (_bits(q) == _bits(ref)))
        # 0/0 is NaN, 0/L keeps +0.
        q = np.asarray(rn_div_int(jnp.zeros(2, jnp.int32),
                                  jnp.asarray([0, 5], jnp.int32)))
        assert np.isnan(q[0]) and _bits(q[1]) == 0

    def test_random_pairs(self):
        rng = np.random.default_rng(7)
        L = rng.integers(1, 1 << 13, 200_000).astype(np.int32)
        n = (rng.integers(0, 1 << 13, 200_000) % (L.astype(np.int64) + 1)
             ).astype(np.int32)
        s = rng.choice([1, -1], n.shape).astype(np.int32)
        q = np.asarray(jax.jit(rn_div_int)(jnp.asarray(s * n),
                                           jnp.asarray(L)))
        ref = (s * n).astype(np.float32) / L.astype(np.float32)
        assert np.array_equal(_bits(q), _bits(ref))

    @pytest.mark.slow
    def test_exhaustive(self):
        div = jax.jit(rn_div_int)
        for Llo in range(0, 1 << 13, 512):
            L = np.arange(Llo, Llo + 512, dtype=np.int64)
            n = np.arange(0, 1 << 13, dtype=np.int64)
            LL, NN = np.meshgrid(L, n, indexing="ij")
            mask = NN <= LL
            for sgn in (1, -1):
                q = np.asarray(div(jnp.asarray(sgn * NN, jnp.int32),
                                   jnp.asarray(LL, jnp.int32)))
                with np.errstate(divide="ignore", invalid="ignore"):
                    ref = ((sgn * NN).astype(np.float32)
                           / LL.astype(np.float32))
                ok = (~mask | (np.isnan(q) & np.isnan(ref))
                      | (q.view(np.int32) == ref.view(np.int32)))
                assert ok.all(), (Llo, sgn)


class TestRecip:
    def test_specials(self):
        x = np.array([0.0, -0.0, np.nan, 1.0, -1.0, 0.5], np.float32)
        q = np.asarray(jax.jit(rn_recip)(jnp.asarray(x)))
        assert q[0] == np.inf and q[1] == -np.inf and np.isnan(q[2])
        assert q[3] == 1.0 and q[4] == -1.0 and q[5] == 2.0

    def test_random(self):
        rng = np.random.default_rng(11)
        x = rng.uniform(-1, 1, 500_000).astype(np.float32)
        x = x[np.abs(x) >= 2.0 ** -13]
        q = np.asarray(jax.jit(rn_recip)(jnp.asarray(x)))
        with np.errstate(divide="ignore"):
            ref = np.float32(1.0) / x
        assert np.array_equal(_bits(q), _bits(ref))

    def test_all_mantissas_one_exponent(self):
        # Full mantissa coverage at one exponent stays in the quick tier
        # (the rounding logic is exponent-independent; the slow tier
        # sweeps the renderer's whole exponent class).
        man = np.arange(1 << 23, dtype=np.int64)
        bits = ((-1 + 127) << 23) | man
        x = bits.astype(np.uint32).view(np.float32)
        q = np.asarray(jax.jit(rn_recip)(jnp.asarray(x)))
        ref = np.float32(1.0) / x
        assert np.array_equal(_bits(q), _bits(ref))

    @pytest.mark.slow
    def test_exhaustive_renderer_class(self):
        rec = jax.jit(rn_recip)
        man = np.arange(1 << 23, dtype=np.int64)
        for e in range(-14, 2):
            for sign in (1.0, -1.0):
                bits = ((e + 127) << 23) | man
                x = (bits.astype(np.uint32).view(np.float32)
                     * np.float32(sign))
                q = np.asarray(rec(jnp.asarray(x)))
                with np.errstate(divide="ignore"):
                    ref = np.float32(1.0) / x
                assert np.array_equal(q.view(np.int32),
                                      ref.view(np.int32)), (e, sign)
