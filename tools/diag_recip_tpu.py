"""Locate rn_recip's TPU mismatches: scan the full verified domain and
report the mismatching input bit patterns plus both outputs.

Usage: python tools/diag_recip_tpu.py   (default env, real TPU)
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
    from pixel_art_raytracer_tpu.ops.divkernel import rn_recip

    K = 8  # mismatches reported per chunk

    @jax.jit
    def chunk(e, man0, sgn_bit):
        man = man0 + jnp.arange(1 << 20, dtype=jnp.int32)
        bits = (((e + 127) << 23) | man) | sgn_bit
        x = jax.lax.bitcast_convert_type(bits, jnp.float32)
        q = rn_recip(x)
        ref = exact_f32_div(jnp.ones_like(x), x)
        qb = jax.lax.bitcast_convert_type(q, jnp.int32)
        rb = jax.lax.bitcast_convert_type(ref, jnp.int32)
        bad = qb != rb
        n_bad = jnp.sum(bad.astype(jnp.int32))
        # Top-K mismatch indices by badness (stable enough for diagnosis).
        score = bad.astype(jnp.int32) * 2 - 1
        _, idx = jax.lax.top_k(score, K)
        return n_bad, bits[idx], qb[idx], rb[idx], bad[idx]

    total = 0
    rows = []
    for e in range(-14, 2):
        for man0 in range(0, 1 << 23, 1 << 20):
            for sgn in (0, -(2 ** 31)):
                n_bad, b, qb, rb, isbad = jax.tree.map(
                    np.asarray,
                    chunk(jnp.int32(e), jnp.int32(man0), jnp.int32(sgn)))
                total += int(n_bad)
                if int(n_bad):
                    for i in range(min(K, int(n_bad))):
                        if isbad[i]:
                            rows.append((int(b[i]) & 0xffffffff,
                                         int(qb[i]) & 0xffffffff,
                                         int(rb[i]) & 0xffffffff))
                    print(f"e={e} man0={man0>>20}M sgn={'-' if sgn else '+'}"
                          f" bad={int(n_bad)}", flush=True)
    print(f"TOTAL {total}")
    for b, qb, rb in rows[:64]:
        x = np.int32(np.uint32(b)).view(np.float32)
        print(f"x=0x{b:08x} ({x!r})  rn_recip=0x{qb:08x} "
              f"ref=0x{rb:08x}")


if __name__ == "__main__":
    main()
