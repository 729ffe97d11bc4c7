"""Drift-immune A/B of candidate-list compaction at production shapes.

Times N-iteration fori_loops of each strategy over (F, NB, G, M) bool
relevance (rolled per iteration to defeat hoisting); reports
(T(N)-T(1))/(N-1) per frame.  See prof_prep_loop.py for the rationale.

Usage: python tools/prof_lists_loop.py [--frames 8] [--n 17]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--m", type=int, default=896)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    F, N, M = args.frames, args.n, args.m
    NB, G = 8, 2

    rng = np.random.default_rng(0)
    relc = jnp.asarray(rng.random((F, NB, G, M)) < 0.06)
    m_ids = jnp.arange(M, dtype=jnp.int32)

    def s_argsort(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        order = jnp.argsort(~r, axis=-1, stable=True).astype(jnp.int32)
        return order.sum(dtype=jnp.int32) + counts.sum()

    def s_sortkey(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        keys = jnp.where(r, m_ids, m_ids + M)
        s = jnp.sort(keys, axis=-1)
        lists = jnp.where(s >= M, 0, s)
        return lists.sum(dtype=jnp.int32) + counts.sum()

    def s_topk256(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        vals = jnp.where(r, M - m_ids, 0)
        top, _ = jax.lax.top_k(vals, 256)
        lists = jnp.where(top > 0, M - top, 0)
        return lists.sum(dtype=jnp.int32) + counts.sum()

    def s_topk128(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        vals = jnp.where(r, M - m_ids, 0)
        top, _ = jax.lax.top_k(vals, 128)
        lists = jnp.where(top > 0, M - top, 0)
        return lists.sum(dtype=jnp.int32) + counts.sum()

    def timed(strat, n):
        @jax.jit
        def run(r0):
            def body(i, acc):
                r = jnp.roll(r0, i, axis=-1)
                return acc + strat(r)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        _ = np.asarray(run(relc))
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(run(relc))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"frames={F} n={N} M={M} density=0.06")
    for name, strat in [("argsort", s_argsort), ("sortkey", s_sortkey),
                        ("topk256", s_topk256), ("topk128", s_topk128)]:
        t1 = timed(strat, 1)
        tn = timed(strat, N)
        per = (tn - t1) / (N - 1)
        print(f"{name:8s} per-iter {per*1e3:7.2f} ms "
              f"({per*1e3/F:7.4f} ms/frame)")


if __name__ == "__main__":
    main()
