"""On-device exhaustive verification of ops/divkernel against the f64 route.

The CPU tests (tests/test_divkernel.py) prove the primitives equal IEEE
float32 division bit-for-bit.  This tool proves the same ON THE REAL TPU,
where two lowering details differ from CPU and matter:

* ``_divstep``'s chunk-quotient estimate uses the hardware f32 divide,
  which on XLA:TPU is ~1-2 ulp off — the int32 fixups must absorb the
  actual on-device error, not CPU's exact divide.
* The on-device comparison reference is ``cstyle.exact_f32_div`` (the
  float64 emulation).  For the integer-ratio class it is provably IEEE,
  so any disagreement is a divkernel bug.  For reciprocals it is NOT:
  TPU's emulated f64 divide is off in its last bits, and 12 of 2^23
  mantissas have their true reciprocal within that error just above an
  f32 tie — the emulation rounds DOWN where IEEE rounds up (first found
  by this tool in round 4; adjudicated against host numpy).  Each
  reciprocal disagreement is therefore fetched and adjudicated against
  host IEEE: the run passes iff rn_recip matches IEEE everywhere, and
  the emulation's own error count is reported as informational.

Coverage: every (n, L) pair with 0 <= n <= L < 2^13, both signs, for
``rn_div_int`` (2^26 comparisons); every mantissa at every renderer-class
exponent (e in [-14, 1], both signs) for ``rn_recip`` (2^28 comparisons).
Mismatch counts (plus a bounded sample of disagreeing reciprocal bit
patterns) are reduced on device; only scalars/small vectors cross the
tunnel.

Usage: python tools/verify_divkernel_tpu.py   (default env, real TPU)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    from pixel_art_raytracer_tpu.utils.device import require_device

    print(f"# device platform: {require_device()}", file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from pixel_art_raytracer_tpu.ops.cstyle import exact_f32_div
    from pixel_art_raytracer_tpu.ops.divkernel import rn_div_int, rn_recip

    B = 13

    @jax.jit
    def check_div_chunk(L0):
        # All n in [0, 2^13) x 512 consecutive L values; mask n <= L.
        n = jnp.arange(1 << B, dtype=jnp.int32)[None, :]
        L = (L0 + jnp.arange(512, dtype=jnp.int32))[:, None]
        mask = (n <= L) & (L > 0)
        bad = jnp.int32(0)
        for sgn in (1, -1):
            nn = jnp.broadcast_to(sgn * n, (512, 1 << B))
            q = rn_div_int(nn, jnp.broadcast_to(L, (512, 1 << B)))
            ref = exact_f32_div(nn.astype(jnp.float32),
                                L.astype(jnp.float32))
            qb = jax.lax.bitcast_convert_type(q, jnp.int32)
            rb = jax.lax.bitcast_convert_type(ref, jnp.int32)
            bad += jnp.sum(jnp.where(mask & (qb != rb), 1, 0),
                           dtype=jnp.int32)
        return bad

    total = 0
    for L0 in range(0, 1 << B, 512):
        total += int(np.asarray(check_div_chunk(jnp.int32(L0))))
    print(f"rn_div_int vs exact_f32_div on TPU: {total} mismatches "
          f"over 2 * {1 << (2 * B)} masked pairs")

    K = 32  # disagreement samples fetched per chunk for adjudication

    @jax.jit
    def check_recip_chunk(e, man0, sgn_bit):
        man = man0 + jnp.arange(1 << 20, dtype=jnp.int32)
        bits = (((e + 127) << 23) | man) | sgn_bit
        x = jax.lax.bitcast_convert_type(bits, jnp.float32)
        q = rn_recip(x)
        ref = exact_f32_div(jnp.ones_like(x), x)
        qb = jax.lax.bitcast_convert_type(q, jnp.int32)
        rb = jax.lax.bitcast_convert_type(ref, jnp.int32)
        bad = qb != rb
        n_bad = jnp.sum(bad.astype(jnp.int32))
        _, idx = jax.lax.top_k(bad.astype(jnp.int32) * 2 - 1, K)
        return n_bad, bits[idx], qb[idx], bad[idx]

    disagree = 0          # rn_recip vs the f64 emulation (informational)
    rn_wrong = 0          # rn_recip vs host IEEE (the pass criterion)
    emu_wrong = 0         # the emulation vs host IEEE
    unsampled = 0
    # Renderer-class exponents.  Disagreements with the emulation are
    # expected and sparse (the emulation is a ~49-bit double-double: 12 of
    # 2^23 mantissas round 1 ulp low); each sampled disagreement is
    # adjudicated against host IEEE and rn_recip must win every one.
    for e in range(-14, 2):
        for man0 in range(0, 1 << 23, 1 << 20):
            for sgn in (0, -(2 ** 31)):
                n_bad, b, qb, isbad = jax.tree.map(np.asarray, (
                    check_recip_chunk(jnp.int32(e), jnp.int32(man0),
                                      jnp.int32(sgn))))
                n_bad = int(n_bad)
                disagree += n_bad
                if n_bad > K:
                    unsampled += n_bad - K
                for i in range(min(K, n_bad)):
                    if not isbad[i]:
                        continue
                    x = np.int32(b[i]).view(np.float32)
                    ieee = (np.float32(1.0) / x).view(np.int32)
                    if int(qb[i]) != int(ieee):
                        rn_wrong += 1
                        print(f"rn_recip WRONG: x=0x{int(b[i]) & 0xffffffff:08x}"
                              f" got=0x{int(qb[i]) & 0xffffffff:08x}"
                              f" ieee=0x{int(ieee) & 0xffffffff:08x}")
                    else:
                        emu_wrong += 1
    print(f"rn_recip vs f64-emulation on TPU: {disagree} disagreements "
          f"over 2 * 16 * {1 << 23} values "
          f"({unsampled} beyond the per-chunk sample cap)")
    print(f"adjudicated vs host IEEE: rn_recip wrong {rn_wrong}, "
          f"f64-emulation wrong {emu_wrong}")

    # Wide exponents (reciprocals down to just above 2^-126) exercise
    # _assemble's two-step scale.  The emulation is useless as a reference
    # there (its double-double tail flushes: ~61% of last bits wrong), so
    # verify by exact power-of-two scaling instead: rn_recip(x * 2^k) must
    # have the SAME mantissa bits as rn_recip(x) at the verified anchor
    # exponent (scaling by 2^k is exact and rounding is mantissa-only).
    @jax.jit
    def check_wide_chunk(e, man0, sgn_bit):
        man = man0 + jnp.arange(1 << 20, dtype=jnp.int32)
        bits_w = (((e + 127) << 23) | man) | sgn_bit
        bits_a = (((0 + 127) << 23) | man) | sgn_bit      # anchor e = 0
        qw = jax.lax.bitcast_convert_type(
            rn_recip(jax.lax.bitcast_convert_type(bits_w, jnp.float32)),
            jnp.int32)
        qa = jax.lax.bitcast_convert_type(
            rn_recip(jax.lax.bitcast_convert_type(bits_a, jnp.float32)),
            jnp.int32)
        # Same sign and mantissa; exponent differs by exactly e.
        man_ok = (qw & jnp.int32(-2139095041)) == (qa & jnp.int32(-2139095041))
        e_ok = (((qw >> 23) & 0xff) - ((qa >> 23) & 0xff)) == -e
        return jnp.sum(jnp.where(man_ok & e_ok, 0, 1), dtype=jnp.int32)

    wide_bad = 0
    for e in (102, 103, 115, 125):
        for man0 in range(0, 1 << 23, 1 << 20):
            for sgn in (0, -(2 ** 31)):
                wide_bad += int(np.asarray(check_wide_chunk(
                    jnp.int32(e), jnp.int32(man0), jnp.int32(sgn))))
    print(f"rn_recip wide-exponent scaling consistency: {wide_bad} "
          f"mismatches over 2 * 4 * {1 << 23} values")

    ok = (total == 0 and rn_wrong == 0 and unsampled == 0
          and wide_bad == 0)
    print("DIVKERNEL TPU:", "EXACT" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
