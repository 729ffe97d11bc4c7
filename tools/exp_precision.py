"""TPU experiment: is Precision.HIGH (bf16x3, 3 passes) bit-exact for the
pipeline's 0/1-matmul expansions, and is it faster than HIGHEST (6 passes)?

Theory: bf16x3 splits each f32 operand into three bf16 terms a1+a2+a3.  When
one operand is exactly bf16-representable (a 0/1 selection matrix: b1 = b,
b2 = b3 = 0), every dropped cross term (a_i * b_j, j > 1) is zero, so the
3-pass product equals the exact f32 product.  This script validates that on
the real hardware for the three production contractions:

  1. candidate-field lane expansion (values up to the entity count,
     trace_pallas._expand_tables),
  2. membership-word lane expansion (16-bit halves,
     shadow_pallas.lane_member_tables),
  3. candidate word select (one-hot over the word axis,
     shadow_pallas.tile_candidate_relevance).

Run on the default (axon) env.  CPU dots are true f32, so only a TPU run
means anything (CLAUDE.md: TPU float semantics).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main() -> None:
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dn = (((1,), (0,)), ((), ()))

    cases = {
        # (values, 0/1 matrix) shaped like the production contractions.
        "field-expand (ids<2^18, K=12)": (
            rng.integers(0, 162_308, (13 * 8 * 64, 12)).astype(np.float32),
            (rng.integers(0, 2, (12, 512))).astype(np.float32)),
        "word-expand (halves<2^16, K=12)": (
            rng.integers(0, 1 << 16, (9 * 24, 12)).astype(np.float32),
            (rng.integers(0, 2, (12, 512))).astype(np.float32)),
        "word-select (one-hot K=24)": (
            rng.integers(0, 1 << 16, (8 * 2, 24)).astype(np.float32),
            np.eye(24, dtype=np.float32)[rng.integers(0, 24, 24)].T),
    }

    @jax.jit
    def both(a, b):
        hi = jax.lax.dot_general(a, b, dn,
                                 precision=jax.lax.Precision.HIGHEST,
                                 preferred_element_type=f32)
        h = jax.lax.dot_general(a, b, dn,
                                precision=jax.lax.Precision.HIGH,
                                preferred_element_type=f32)
        return hi, h

    for name, (a, b) in cases.items():
        hi, h = both(jnp.asarray(a), jnp.asarray(b))
        hi, h = np.asarray(hi), np.asarray(h)
        exact = np.array_equal(hi, h)
        print(f"{name:36s} HIGH==HIGHEST: {exact}"
              + ("" if exact else
                 f"  max|diff|={np.abs(hi - h).max()}"))

    # Timing: the real lane-expansion shape, batched like F=64.
    a = jnp.asarray(rng.integers(0, 162_308,
                                 (64 * 13 * 8 * 64, 12)).astype(np.float32))
    sel = jnp.asarray((rng.integers(0, 2, (12, 512))).astype(np.float32))

    for prec in [jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                 jax.lax.Precision.DEFAULT]:
        @jax.jit
        def run(a, sel, p=prec):
            out = jax.lax.dot_general(a, sel, dn, precision=p,
                                      preferred_element_type=f32)
            return out.astype(jnp.int32).sum(axis=0, dtype=jnp.int32)

        _ = np.asarray(run(a, sel))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(run(a, sel))
            best = min(best, time.perf_counter() - t0)
        print(f"expand F=64 {str(prec):20s} {best * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
