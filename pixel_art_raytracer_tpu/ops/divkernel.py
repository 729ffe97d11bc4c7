"""Correctly-rounded float32 division primitives for Mosaic kernels.

The renderer's shadow-ray geometry needs two parity-critical divisions per
pixel axis (ops/shade.light_geometry, mirroring alternative.cpp:707-732):

  tl  = RN(d / length)     d, length small integers (L1 light delta)
  inv = RN(1 / tl)         reciprocal of that quotient

XLA:TPU's native f32 divide is ~1 ulp off for a third of operands, so the
XLA path routes them through ``ops.cstyle.exact_f32_div`` — an (emulated)
float64 round trip.  Pallas/Mosaic has no float64 at all, so deriving the
shadow-ray inputs inside the kernel (deleting three HBM pixel windows and
the f64-emulated XLA geometry pass) needs a correctly-rounded division
built from Mosaic-supported vector ops: int32 arithmetic, shifts, selects,
f32 multiply/divide, and f32<->i32 bitcasts.

Both entry points compute the EXACT integer mantissa of the quotient by
normalized long division in small chunks — each chunk quotient is
estimated with the (inexact) hardware f32 divide and then corrected with
exact int32 residual arithmetic, so the estimate's error only costs fixup
selects, never correctness:

* :func:`rn_div_int` — RN(d / L) for int32 ``d, L`` with |d| <= L < 2^13
  (the renderer's L1-normalisation class: length = |dx|+|dy|+|dz| bounds
  every component).  Callers guard the range at runtime (the batched
  pipeline reroutes to the exact XLA path when max length >= 2^13).
* :func:`rn_recip` — RN(1 / x) for finite nonzero f32 ``x`` (any normal
  exponent; the renderer's reciprocals satisfy |x| <= 1 so the result
  never overflows — callers outside that envelope must handle inf).

Exhaustive host-side verification lives in tests/test_divkernel.py: every
(n, L) pair of the div class (2^25 pairs) and every mantissa of the recip
class (2^23) against numpy's IEEE float32 divide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_I32 = jnp.int32
_F32 = jnp.float32


def _pow2(k):
    """2**k as f32 for int32 ``k`` in [-126, 127] (normal range), built by
    assembling the exponent field directly — exact, no table."""
    return jax.lax.bitcast_convert_type(
        ((k + 127) << 23).astype(_I32), _F32)


def _floor_log2(n):
    """floor(log2(n)) for int32 n in [1, 2^24): the f32 exponent field of
    the (exact) conversion.  Values below 2^24 convert exactly, so the
    exponent can never be biased upward by mantissa rounding."""
    bits = jax.lax.bitcast_convert_type(n.astype(_F32), _I32)
    return (bits >> 23) - 127


def _divstep(N, L, Lf, n_fix: int = 3):
    """(floor(N / L), N mod L) for int32 N >= 0, L >= 1 with N/L < 2^14
    and N < 2^31.

    The quotient is estimated with the hardware f32 divide (error
    <= N/L * 2^-21 + 1 after truncation, so under 2 for N/L < 2^14 even
    with a ~2-ulp divide) and corrected by ``n_fix`` exact residual
    selects in each direction.  ``Lf`` is f32(L) (hoisted by callers —
    L is loop-invariant)."""
    q = (N.astype(_F32) / Lf).astype(_I32)
    r = N - q * L
    for _ in range(n_fix):
        under = r < 0
        q = jnp.where(under, q - 1, q)
        r = jnp.where(under, r + L, r)
    for _ in range(n_fix):
        over = r >= L
        q = jnp.where(over, q + 1, q)
        r = jnp.where(over, r - L, r)
    return q, r


def _assemble(m, k, neg, wide: bool = False):
    """(-1)^neg * m * 2^k for an int32 mantissa m in [2^23, 2^24] and a
    normal final value.  f32(m) is exact (m <= 2^24) and the power-of-two
    scale is exact, so no rounding happens here.

    ``wide``: allow k down to -149 (final value still normal, i.e.
    m * 2^k >= 2^-126) by splitting the scale in two exact steps —
    _pow2 alone cannot encode k < -126.  Off by default: rn_div_int's k
    never leaves [-62, 13] and the extra select+multiply would ride its
    Mosaic hot path."""
    if wide:
        lo = k < -126
        k1 = jnp.where(lo, jnp.int32(-126), k)
        k2 = jnp.where(lo, k + 126, jnp.int32(0))
        # m * 2^-126 is exact (>= 2^-103, normal); the second scale lands
        # on the final value, representable by the normal-result domain.
        mag = m.astype(_F32) * _pow2(k1) * _pow2(k2)
    else:
        mag = m.astype(_F32) * _pow2(k)
    return jnp.where(neg, -mag, mag)


def rn_div_int(d, L):
    """Correctly-rounded f32 quotient of int32 ``d`` by int32 ``L``.

    Domain: |d| <= L < 2^13 (callers prove or guard it).  Edge cases match
    IEEE f32 division of the exact operands: d == 0, L > 0 -> +0.0;
    L == 0 (which forces d == 0 in-domain) -> NaN.

    Method: with n = |d| and t = 25 - floor(log2 n) + floor(log2 L), the
    scaled quotient M = floor(n * 2^t / L) lands in [2^24, 2^26) and its
    remainder supplies the sticky bit — 25-26 exact quotient bits, enough
    to round the 24-bit f32 mantissa.  M is produced by three chunked
    long-division steps (shifts of t-24 <= 13, then 12, then 12 bits keep
    every intermediate below 2^26).
    """
    d = d.astype(_I32)
    L = jnp.broadcast_to(jnp.asarray(L, _I32), d.shape)
    neg = d < 0
    n = jnp.abs(d)

    safe_n = jnp.maximum(n, 1)
    safe_L = jnp.maximum(L, 1)
    Lf = safe_L.astype(_F32)
    en = _floor_log2(safe_n)
    eL = _floor_log2(safe_L)
    # t = 25 - en + eL, split c1 = t - 24 in [1, 13], then 12, then 12.
    # n << c1 rides a power-of-two f32 scale instead of a
    # variable-amount vector shift (n has <= 13 significand bits, so the
    # scaled value is exact at any magnitude and the i32 cast recovers it).
    c1 = 1 + eL - en
    N1 = (safe_n.astype(_F32) * _pow2(c1)).astype(_I32)
    q1, r1 = _divstep(N1, safe_L, Lf)
    q2, r2 = _divstep(r1 << 12, safe_L, Lf)
    q3, r3 = _divstep(r2 << 12, safe_L, Lf)
    M = ((q1 << 12) | q2) << 12 | q3            # floor(n*2^t / L), < 2^26
    sticky0 = r3 != 0

    # Round to nearest even at 24 mantissa bits.  M in [2^24, 2^26):
    # one or two guard bits depending on the leading-one position.
    wide = M >= (1 << 25)
    sh = jnp.where(wide, 2, 1)
    m = M >> sh
    g = (M >> (sh - 1)) & 1
    sticky = sticky0 | (wide & ((M & 1) != 0))
    up = (g != 0) & (sticky | ((m & 1) != 0))
    m = m + up.astype(_I32)
    k = en - eL - 25 + sh

    q = _assemble(m, k, neg)
    q = jnp.where(n == 0, _F32(0.0), q)
    return jnp.where(L == 0, _F32(jnp.nan), q)


def rn_recip(x):
    """Correctly-rounded f32 reciprocal of f32 ``x``.

    Domain: any finite normal ``x`` whose reciprocal stays in the normal
    range — exponents e in [-126, 125]; the renderer's |x| <= 1 class
    trivially qualifies — plus the edge cases the geometry produces:
    x == +/-0 -> +/-inf, NaN -> NaN.  (Subnormal ``x``, and e >= 126
    where 1/x can go subnormal, are OUTSIDE the domain — callers such as
    cstyle.exact_f32_recip route those to the f64 emulation.)

    Method: decompose x = s * m * 2^(e-23) with a 24-bit integer mantissa
    m; M = floor(2^48 / m) in [2^24, 2^25] plus its remainder-sticky give
    25 exact quotient bits.  M comes from seven chunked long-division
    steps (one 6-bit then six 7-bit shifts — remainders stay below 2^24,
    so every intermediate fits int32).
    """
    x = x.astype(_F32)
    bits = jax.lax.bitcast_convert_type(x, _I32)
    neg = bits < 0
    m = (bits & 0x7fffff) | (1 << 23)
    e = ((bits >> 23) & 0xff) - 127
    mf = m.astype(_F32)

    M = jnp.zeros_like(m)
    r = jnp.ones_like(m)
    for c in (6, 7, 7, 7, 7, 7, 7):            # 48 numerator bits total
        q, r = _divstep(r << c, m, mf)
        M = (M << c) | q
    sticky0 = r != 0

    # M in [2^24, 2^25]: exactly 2^25 only for m = 2^23 (exact power of
    # two), whose guard/sticky are zero — the assemble path still lands on
    # the exact reciprocal because f32(2^24) * 2^k is exact.
    m24 = M >> 1
    g = M & 1
    up = (g != 0) & (sticky0 | ((m24 & 1) != 0))
    m24 = m24 + up.astype(_I32)
    # value = (M + frac) * 2^(-48) / 2^(e - 23) = m24 * 2^(-24 - e).
    # wide: e up to 125 (normal-reciprocal domain) puts k as low as -149.
    q = _assemble(m24, -24 - e, neg, wide=True)

    is_zero = (bits & 0x7fffffff) == 0
    is_nan = jnp.isnan(x)
    # +/-inf bit patterns (0xff800000 as int32 is -8388608).
    inf = jax.lax.bitcast_convert_type(
        jnp.where(neg, jnp.int32(-8388608), jnp.int32(0x7f800000)), _F32)
    q = jnp.where(is_zero, inf, q)
    return jnp.where(is_nan, _F32(jnp.nan), q)
