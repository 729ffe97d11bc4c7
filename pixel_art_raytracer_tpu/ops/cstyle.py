"""C-semantics numeric helpers shared by the oracle and the JAX pipeline.

The reference leans on several C/C++ numeric behaviours that differ from
numpy/jax defaults, and pixel-exact parity requires reproducing them:

* ``std::min(a, b)`` is ``b < a ? b : a`` and ``std::max(a, b)`` is
  ``a < b ? b : a`` — NaN-asymmetric, unlike ``jnp.minimum`` which propagates
  NaN.  The shadow slab test (alternative.cpp:40-83) divides by ray direction
  components that can be zero, producing inf/NaN operands, so the exact
  comparison form is observable.
* C integer division truncates toward zero; Python's ``//`` floors.  Bin-range
  and bin-coordinate computations (alternative.cpp:222-240, 724-732) divide
  possibly-negative ints.
* ``static_cast<unsigned char>(float)`` truncates toward zero
  (sprites.hpp:9-15); ``astype(uint8)`` happens to match for in-range
  non-negative values, which is the case here (color * factor, factor >= 0).

All helpers are array-module agnostic: pass numpy arrays / scalars and they
stay in numpy; pass jax arrays and they trace.
"""

from __future__ import annotations

import numpy as np


def _xp(*args):
    """Pick jax.numpy if any argument is a jax tracer/array, else numpy."""
    for a in args:
        if type(a).__module__.startswith("jax") or hasattr(a, "aval"):
            import jax.numpy as jnp

            return jnp
    return np


def c_min(a, b):
    """``std::min(a, b)`` == ``b < a ? b : a`` (keeps ``a`` when unordered)."""
    xp = _xp(a, b)
    return xp.where(b < a, b, a)


def c_max(a, b):
    """``std::max(a, b)`` == ``a < b ? b : a`` (keeps ``a`` when unordered)."""
    xp = _xp(a, b)
    return xp.where(a < b, b, a)


def c_div(a, b):
    """C integer division: truncate toward zero.  Operands int32 arrays/ints."""
    xp = _xp(a, b)
    if xp is np:
        # np.floor_divide floors; emulate truncation.
        q = np.floor_divide(a, b)
        r = a - q * b
        # If remainder nonzero and signs of a,b differ, floor went one too low.
        adjust = (r != 0) & ((np.asarray(a) < 0) != (np.asarray(b) < 0))
        return (q + adjust).astype(np.int32) if hasattr(q, "astype") else int(q + adjust)
    import jax.lax as lax
    import jax.numpy as jnp

    # lax.div on signed ints is C-style (rounds toward zero).
    return lax.div(jnp.asarray(a, jnp.int32), jnp.asarray(b, jnp.int32))


def trunc_to_int(x):
    """``static_cast<int>(float)`` — truncation toward zero."""
    xp = _xp(x)
    if xp is np:
        return np.asarray(x).astype(np.int32)
    import jax.numpy as jnp

    return x.astype(jnp.int32)


def scale_color_u8(color, factor):
    """``Color::operator*(float)`` (sprites.hpp:8-16).

    Per-channel ``u8(float(channel) * factor)`` with C truncation.  ``color``
    is a uint8 array whose trailing dim is RGB(A); alpha is left untouched by
    the reference, but all callers here pass RGB-only arrays.
    ``factor`` broadcasts (e.g. per-pixel brightness map).
    """
    xp = _xp(color, factor)
    scaled = color.astype(xp.float32) * factor
    return scaled.astype(xp.uint8)


def exact_f32_div(a, b):
    """Correctly-rounded float32 division on every backend.

    XLA:TPU lowers f32 division to a reciprocal refinement that is ~1 ulp off
    for a third of operands (measured), which flips truncation-boundary
    pixels vs the C++ reference.  On TPU the quotient runs in (emulated)
    float64 and rounds back — exact for the renderer's small-integer ratio
    class (|n| <= L < 2^13: verified exhaustively on device against
    ops/divkernel.rn_div_int, 2^26 pairs, 0 mismatches —
    tools/verify_divkernel_tpu.py).

    NOT exact for arbitrary reciprocals: TPU's emulated f64 divide is not
    correctly rounded in its last bits, and for 12 of 2^23 mantissas the
    true reciprocal sits within that error just above an f32 tie point —
    the emulation rounds-to-even DOWN where IEEE rounds up (measured on
    device, adjudicated against host IEEE; same 12 mantissas at every
    exponent).  Reciprocals must use :func:`exact_f32_recip` instead.

    On CPU, plain division is already IEEE — no overhead.
    """
    import jax

    if jax.default_backend() == "cpu":
        return a / b
    import jax.numpy as jnp

    _allow_explicit_x64()
    q = a.astype(jnp.float64) / b.astype(jnp.float64)
    assert q.dtype == jnp.float64, "explicit float64 unavailable"
    return q.astype(jnp.float32)


def _recip_tpu_impl(x):
    """The TPU lowering of :func:`exact_f32_recip`: divkernel's verified
    long-division reciprocal wherever both input and output are normal
    f32 (plus the zero/NaN edge cases it handles natively), the float64
    emulation only at the exotic extremes outside divkernel's domain
    (subnormal input, or |x| large enough that 1/x leaves the normal
    range).  Backend-agnostic jnp code so the CPU test suite can verify
    it bit-for-bit against IEEE (tests/test_divkernel.py)."""
    import jax
    import jax.numpy as jnp

    from .divkernel import rn_recip

    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    efield = (bits >> 23) & 0xff
    # Normal input whose reciprocal is also normal: e in [-126, 125]
    # (efield in [1, 252]) guarantees |1/x| in (2^-126, 2^127) — rn_recip's
    # verified domain; zero (-> signed inf) and NaN are handled exactly by
    # rn_recip itself.  Subnormal x and e >= 126 (reciprocal can go
    # subnormal) keep the f64 emulation.
    mag_zero = (bits & 0x7fffffff) == 0
    in_domain = ((efield >= 1) & (efield <= 252)) | mag_zero | jnp.isnan(x)
    emu = exact_f32_div(jnp.ones_like(x), x)
    return jnp.where(in_domain, rn_recip(x), emu)


def exact_f32_recip(x):
    """Correctly-rounded float32 reciprocal on every backend.

    On TPU this CANNOT be ``exact_f32_div(1, x)``: the emulated-f64 route
    is 1 ulp below IEEE for 12 of 2^23 mantissas (reciprocal just above an
    f32 tie — see exact_f32_div's docstring).  Those mantissas are
    unreachable for quotients RN(d/L) of the guarded integer class
    (|d| <= L < 2^13, checked exhaustively on host), which is why every
    parity certificate predating this function remains valid — but the
    directional-light paths take arbitrary float directions where they ARE
    reachable.  Uses ops/divkernel.rn_recip (exhaustively verified against
    IEEE on CPU and on the real TPU) for all normal-range inputs.

    Contract: IEEE-exact for every normal ``x`` whose reciprocal is also
    normal (exponents in [-126, 125] — all L1-normalized directions
    qualify), plus +/-0 -> +/-inf, +/-inf -> +/-0, NaN -> NaN.  Subnormal
    ``x`` and |x| >= 2^126 follow the platform's flush-to-zero semantics
    (TPU and XLA:CPU both DAZ/FTZ there), not IEEE.

    On CPU, plain division is already IEEE — no overhead.
    """
    import jax

    if jax.default_backend() == "cpu":
        import jax.numpy as jnp

        return jnp.ones_like(x) / x
    return _recip_tpu_impl(x)


_X64_READY = False


def _allow_explicit_x64():
    """Permit explicit float64 arrays without flipping jax's 32-bit defaults."""
    global _X64_READY
    if _X64_READY:
        return
    import jax

    try:
        from jax._src.config import ExplicitX64Mode

        jax.config.update("jax_explicit_x64_dtypes", ExplicitX64Mode.ALLOW)
    except Exception:
        jax.config.update("jax_enable_x64", True)
    _X64_READY = True


def normal_to_debug_color(nx, ny, nz):
    """``Vector::operator Color`` (sprites.hpp:37-51): the reference's debug
    visualisation of a normal as an RGB color.

    Shifts components positive by the L1 length, renormalises by the shifted
    sum, scales by 255 with C truncation.  Returns (r, g, b) uint8 arrays.
    """
    xp = _xp(nx, ny, nz)
    length = xp.abs(nx) + xp.abs(ny) + xp.abs(nz)
    px, py, pz = nx + length, ny + length, nz + length
    total = px + py + pz
    out = []
    for comp in (px, py, pz):
        val = (comp / total).astype(xp.float32) * xp.float32(255)
        out.append(val.astype(xp.uint8))
    return tuple(out)


def l1_normalize(x, y, z):
    """L1 ("Manhattan") normalisation — ``Vector::normalize`` (sprites.hpp:28-35).

    Note this is *not* Euclidean; the reference uses the sum of absolute
    components as the length.  Division by a zero length yields inf/NaN, same
    as the reference.
    """
    xp = _xp(x, y, z)
    length = xp.abs(x) + xp.abs(y) + xp.abs(z)
    return x / length, y / length, z / length
