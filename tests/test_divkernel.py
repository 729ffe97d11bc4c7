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

    # The 12 mantissas whose true reciprocal sits just above an f32 tie
    # point — measured on real TPU as the exact set where the f64-emulated
    # exact_f32_div rounds 1 ulp BELOW IEEE (tools/verify_divkernel_tpu.py,
    # adjudicated against host IEEE).  rn_recip must get every one right
    # at every exponent of its domain.
    TIE_MANTISSAS = [0x224cf7, 0x2d1367, 0x384a93, 0x543d43, 0x61368b,
                     0x625473, 0x6c7ec7, 0x702a3b, 0x70ff0f, 0x7c3237,
                     0x7e01ff, 0x7fffff]

    def test_tie_adjacent_mantissas_all_exponents(self):
        man = np.asarray(self.TIE_MANTISSAS, np.int64)
        rec = jax.jit(rn_recip)
        for e in range(-126, 126):
            for sign_bit in (0, 1 << 31):
                bits = (((e + 127) << 23) | man) | sign_bit
                x = bits.astype(np.uint32).view(np.float32)
                q = np.asarray(rec(jnp.asarray(x)))
                ref = np.float32(1.0) / x
                assert np.array_equal(_bits(q), _bits(ref)), (e, sign_bit)

    def test_wide_exponents(self):
        # e in [103, 125]: reciprocals below 2^-103 exercise _assemble's
        # wide two-step scale (single _pow2 cannot encode k < -126).
        rng = np.random.default_rng(3)
        man = np.concatenate([
            np.asarray([0, 1, (1 << 23) - 1] + self.TIE_MANTISSAS,
                       np.int64),
            rng.integers(0, 1 << 23, 4096)]).astype(np.int64)
        rec = jax.jit(rn_recip)
        for e in list(range(103, 126)) + [-126, -125, 102]:
            for sign_bit in (0, 1 << 31):
                bits = (((e + 127) << 23) | man) | sign_bit
                x = bits.astype(np.uint32).view(np.float32)
                q = np.asarray(rec(jnp.asarray(x)))
                ref = np.float32(1.0) / x
                assert np.array_equal(_bits(q), _bits(ref)), (e, sign_bit)

    def test_recip_tpu_impl_matches_ieee(self):
        # The dispatcher cstyle.exact_f32_recip routes to on TPU, checked
        # bit-for-bit ON CPU (the jnp ops are backend-agnostic) over its
        # contract: hostile tie mantissas and random mantissas at every
        # normal-in/normal-out exponent, plus zero/inf/NaN edges.
        from pixel_art_raytracer_tpu.ops.cstyle import _recip_tpu_impl

        rng = np.random.default_rng(5)
        man = rng.integers(0, 1 << 23, 2048).astype(np.int64)
        parts = [(((e + 127) << 23)
                  | np.asarray(self.TIE_MANTISSAS + [0, 1], np.int64))
                 for e in range(-126, 126)]
        parts.append(((0 + 127) << 23) | man)
        parts.append(np.asarray([0, 0xff << 23], np.int64))  # +0, +inf
        bits = np.concatenate(parts)
        bits = np.concatenate([bits, bits | (1 << 31)])
        x = bits.astype(np.uint32).view(np.float32)
        q = np.asarray(jax.jit(_recip_tpu_impl)(jnp.asarray(x)))
        with np.errstate(divide="ignore"):
            ref = np.float32(1.0) / x
        assert np.array_equal(_bits(q), _bits(ref))
        qn = np.asarray(jax.jit(_recip_tpu_impl)(
            jnp.asarray([np.nan], jnp.float32)))
        assert np.isnan(qn[0])

    def test_recip_tpu_impl_extremes_flush(self):
        # Outside the contract — subnormal x (DAZ -> treated as signed
        # zero) and e >= 126 (reciprocal FTZ) — the impl must still be
        # deterministic and sign-correct: either the IEEE value or the
        # platform's flushed counterpart (zero treated-as / zero result).
        from pixel_art_raytracer_tpu.ops.cstyle import _recip_tpu_impl

        bits = np.asarray([1, 0x7fffff,                 # subnormals
                           (253 << 23) | 5, (254 << 23) | 5], np.int64)
        bits = np.concatenate([bits, bits | (1 << 31)])
        x = bits.astype(np.uint32).view(np.float32)
        q = np.asarray(jax.jit(_recip_tpu_impl)(jnp.asarray(x)))
        with np.errstate(divide="ignore"):
            ieee = np.float32(1.0) / x
        ok = (q.view(np.int32) == ieee.view(np.int32))
        # flushed alternative: same sign as x, magnitude inf (subnormal in)
        # or 0 (huge in)
        alt_mag = np.where(np.abs(x) < np.float32(2.0) ** -126,
                           np.inf, 0.0).astype(np.float32)
        alt = np.where(x.view(np.int32) < 0, -alt_mag, alt_mag)
        ok |= (q.view(np.int32) == alt.view(np.int32))
        assert ok.all(), (x[~ok], q[~ok])

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
