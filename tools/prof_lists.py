"""Micro-bench of per-tile candidate list compaction strategies.

The shadow prep turns relc (F, NB, G, M) bool into per-tile index lists
(relevant candidates first, original order).  Order within the list is
irrelevant to correctness (occlusion is an OR) but the ORDER-PRESERVING
forms are compared here because stability is free in some of them.

Strategies:
  argsort  — jnp.argsort(~relc, stable)        (current production)
  sortkey  — jnp.sort(m + ~relc * M) (tail entries alias real candidates
             mod M: harmless, their membership bits are zero per tile)
  topk     — lax.top_k of relc * (M - m), k=M; decode M - v, pad -> 0
  topk256  — same with k=256 (capacity-capped; guard handled by caller)

Usage: python tools/prof_lists.py [--frames 64]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_host(fn, *args, iters=5):
    out = fn(*args)
    _ = jax.tree.map(np.asarray, out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--m", type=int, default=768)
    ap.add_argument("--tiles", type=int, default=16)
    args = ap.parse_args()
    F, M, T = args.frames, args.m, args.tiles

    rng = np.random.default_rng(0)
    # ~8% density like graybox post-pruning (~50 of 768 per tile).
    relc = jnp.asarray(rng.random((F, T, M)) < 0.08)

    def checksum(lists, counts):
        return lists.sum(dtype=jnp.int32) + counts.sum(dtype=jnp.int32)

    @jax.jit
    def f_argsort(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        order = jnp.argsort(~r, axis=-1, stable=True).astype(jnp.int32)
        return checksum(order, counts)

    m_ids = jnp.arange(M, dtype=jnp.int32)

    @jax.jit
    def f_sortkey(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        keys = m_ids + jnp.where(r, 0, M)
        s = jnp.sort(keys, axis=-1)
        lists = jnp.where(s >= M, s - M, s)
        return checksum(lists, counts)

    @jax.jit
    def f_topk(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        vals = jnp.where(r, M - m_ids, 0)
        top, _ = jax.lax.top_k(vals, M)
        lists = jnp.where(top > 0, M - top, 0)
        return checksum(lists, counts)

    @jax.jit
    def f_topk256(r):
        counts = r.sum(axis=-1).astype(jnp.int32)
        vals = jnp.where(r, M - m_ids, 0)
        top, _ = jax.lax.top_k(vals, 256)
        lists = jnp.where(top > 0, M - top, 0)
        return checksum(lists, counts)

    for name, fn in [("argsort", f_argsort), ("sortkey", f_sortkey),
                     ("topk", f_topk), ("topk256", f_topk256)]:
        t = time_host(fn, relc)
        print(f"{name:8s} {t*1e3:8.2f} ms  ({t*1e3/F:7.4f} ms/frame)")


if __name__ == "__main__":
    main()
