"""Marginal per-operand-window cost of a Pallas TPU kernel grid step.

Round-5 negative result (kept as the repro): a trivial kernel on the
production grid shape (64 frames x 8 row blocks, (40, 512) f32 blocks)
costs the SAME ~25-26 ms end-to-end with 1, 5, 9, or 13 operand
windows — 12 extra full-block DMAs per grid step are completely hidden.
Window COUNT is free on this hardware/stack; the residue that the
empty-body kernel ablations attributed to "per-grid-step window floors"
is really the XLA prep that produces the windows' operands.  Operand
merging is therefore a dead end (measured, do not rebuild).

Each extra window is consumed via a scalar read (acc + e[0, 0]) so
Mosaic cannot DCE the DMA while adding ~no vector work.

Usage: python tools/prof_wincost.py   (default env, real TPU)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

F, NB, R, W = 64, 8, 40, 512


def make_fn(n_extra):
    def kernel(*refs):
        in0 = refs[0]
        extras = refs[1:1 + n_extra]
        out = refs[1 + n_extra]
        acc = in0[...]
        for e in extras:
            acc = acc + e[0, 0]
        out[...] = acc

    spec = pl.BlockSpec((1, 1, R, W), lambda f, b: (f, b, 0, 0))

    @jax.jit
    def run(x, extras):
        return pl.pallas_call(
            kernel,
            grid=(F, NB),
            in_specs=[spec] * (1 + n_extra),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((F, NB, R, W), jnp.float32),
        )(x, *extras)[:, :, 0, 0]

    return run


def main() -> None:
    x = jnp.ones((F, NB, R, W), jnp.float32)
    configs = {}
    for n in (0, 4, 8, 12):
        extras = [jnp.full((F, NB, R, W), 1e-9, jnp.float32)
                  for _ in range(n)]
        fn = make_fn(n)
        _ = np.asarray(fn(x, extras))          # compile
        configs[n] = (fn, extras)

    meds = {n: [] for n in configs}
    for _ in range(5):                          # interleaved rounds
        for n, (fn, extras) in configs.items():
            t0 = time.perf_counter()
            _ = np.asarray(fn(x, extras))
            meds[n].append(time.perf_counter() - t0)
    for n, ts in sorted(meds.items()):
        ts = sorted(ts)
        print(f"extra_windows={n:2d}  med {ts[len(ts) // 2] * 1e3:7.2f} ms"
              f"  best {ts[0] * 1e3:7.2f}  (per-step us: "
              f"{ts[len(ts) // 2] * 1e6 / (F * NB):.1f})")


if __name__ == "__main__":
    main()
