"""Kernel cost decomposition via timing-only ablations (interleaved).

Times the production pipeline cut at a kernel against ablated variants of
that kernel; the deltas split the kernel's cost into its components.
Results are WRONG under ablation; only the timing is meaningful.

All variants are compiled FIRST and then timed in alternating rounds
(median reported): the axon tunnel's ambient load drifts on the minutes
scale, so sequential cross-config comparisons below ~0.07 ms/frame are
noise (see docs/PERF.md methodology).

Shadow modes (upto=shadow): full / noslab (hit=member) / nomember
(member=true, no bitmap work) / noloads (constant candidate params — no
scalar loads) / nobody (list load + one vector op per visit).

Trace modes (--kernel trace, upto=tkeys): full / nop3 (no winner-field
resolve) / nobinmax (no per-(bin, row) maxima) / noee (pure-max phase-2
scan).

Usage: python tools/prof_shadow_ablate.py [--kernel shadow|trace]
       [--frames 64] [--rows 40] [--groups 2] [--chunk 8] [--iters 4]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", choices=["shadow", "trace"],
                    default="shadow")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--trace-rows", type=int, default=40)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--ablate", nargs="*", default=None,
                    help="explicit ablation modes to compare ('None' = "
                         "the unablated kernel; default: the full set "
                         "for the chosen kernel)")
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.models.batched import render_states_batched
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import (shadow_fast, shadow_pallas,
                                             trace_pallas)

    scene = graybox_world()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(F, scene.pos[0], radius=40)

    if args.kernel == "shadow":
        mod, upto = shadow_pallas, "shadow"
        modes = [None, "noslab", "nomember", "noloads", "nobody", "notrow"]
    else:
        mod, upto = trace_pallas, "tkeys"
        modes = [None, "nop3", "nobinmax", "noee"]
    if args.ablate is not None:
        modes = [None if m == "None" else m for m in args.ablate]

    print(f"kernel={args.kernel} frames={F} rows={args.rows} "
          f"G={args.groups} chunk={args.chunk} upto={upto}")
    entries = []
    for mode in modes:
        # "cut:<stage>" pseudo-modes time an upto-cut of the pipeline in
        # the SAME interleaved process (e.g. cut:prep vs empty vs None
        # splits the kernel stage into window/grid floor and body without
        # cross-session drift).  Upto-cut programs can compile
        # pathologically (see CLAUDE.md) — sanity-check against the
        # in-kernel ablations.
        if mode is not None and mode.startswith("cut:"):
            ablate, cut = None, mode[4:]
        else:
            ablate, cut = mode, upto
        mod._ablate = ablate
        try:
            fn = jax.jit(lambda p, l, cut=cut: render_states_batched(
                r, cache, ds, p, l, shadow_rows=args.rows,
                lane_groups=args.groups, trace_rows=args.trace_rows,
                shadow_chunk=args.chunk, upto=cut))
            _ = np.asarray(fn(players, lights))   # compile
            entries.append((mode, fn, []))
        finally:
            mod._ablate = None

    for _ in range(max(3, args.iters)):
        for mode, fn, ts in entries:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                _ = np.asarray(fn(players, lights))
                best = min(best, time.perf_counter() - t0)
            ts.append(best)

    base = None
    for mode, _, ts in entries:
        med = float(np.median(ts))
        if mode is None:
            base = med
        delta = "" if base is None else f"  delta {-(base - med)*1e3/F:+.3f}"
        print(f"ablate={str(mode):9s} med {med*1e3:9.2f} ms "
              f"({med*1e3/F:7.3f} ms/frame){delta}")


if __name__ == "__main__":
    main()
