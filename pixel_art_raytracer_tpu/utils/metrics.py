"""Performance metrics and timing.

The reference's only instrumentation is a per-frame wall-clock print
(``SDL_GetTicks`` delta, alternative.cpp:815-817).  Here: structured timers,
rays/s accounting (primary + shadow rays per frame, matching the workload
definition in BASELINE.md), and an optional ``jax.profiler`` trace hook.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time

import jax


@dataclasses.dataclass
class RenderStats:
    frames: int
    height: int
    width: int
    seconds: float
    shadow_rays: bool = True

    @property
    def rays_per_frame(self) -> int:
        per = self.height * self.width
        return per * 2 if self.shadow_rays else per

    @property
    def mrays_per_sec(self) -> float:
        return self.frames * self.rays_per_frame / self.seconds / 1e6

    @property
    def frames_per_sec(self) -> float:
        return self.frames / self.seconds

    def to_json(self) -> str:
        return json.dumps({
            "frames": self.frames, "height": self.height, "width": self.width,
            "seconds": round(self.seconds, 6),
            "mrays_per_sec": round(self.mrays_per_sec, 3),
            "frames_per_sec": round(self.frames_per_sec, 3),
        })


def _materialize(out) -> None:
    """Pull every array leaf of ``out`` to host (np.asarray).

    A host transfer is the only completion signal that is reliable through
    remote-tunnel backends, where ``block_until_ready`` can return before
    execution actually finishes.
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def checksummed(fn):
    """Wrap ``fn`` so each array output reduces to one scalar *inside* the
    same jitted program.

    Timing the wrapper pays the full cost of computing every output element
    (sums cannot be dead-code-eliminated) while only scalars cross the
    host link — the canonical remote-safe timing pattern (a slow tunnel's
    bulk bandwidth is not part of the device work being measured).
    """
    import jax.numpy as jnp

    def _sum(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            return jnp.sum(leaf, dtype=jnp.int32)
        return jnp.sum(leaf)

    @jax.jit
    def wrapped(*args):
        return [_sum(leaf) for leaf in jax.tree_util.tree_leaves(fn(*args))]

    return wrapped


def time_fn(fn, *args, warmup: int = 1, iters: int = 3):
    """Time a device function: returns (best_seconds_per_call, last_output).

    Completion is observed by materialising every output leaf to host —
    NOT via ``block_until_ready``, which can return early through remote
    tunnels.  Large outputs would then time the host transfer too; wrap
    the function with :func:`checksummed` so only scalars cross the link.
    The warmup calls absorb compilation.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
        _materialize(out)
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        out = fn(*args)
        _materialize(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """Optional jax.profiler trace around a block (no-op when logdir=None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
