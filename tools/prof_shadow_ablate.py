"""Shadow-kernel cost decomposition via timing-only ablations.

Times upto=shadow with the production kernel, then with the slab test
ablated (hit=member) and the membership read ablated — the deltas split
the kernel's per-candidate cost into slab-vector work, membership work,
and fixed (scalar-load / loop) cost.  Results are WRONG under ablation;
only the timing is meaningful.

Usage: python tools/prof_shadow_ablate.py [--frames 64] [--rows 40]
       [--groups 2 4] [--chunk 8]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_host(fn, *args, iters=3):
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
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--groups", type=int, nargs="*", default=[2])
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.models.batched import render_states_batched
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas

    scene = graybox_world()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(F, scene.pos[0], radius=40)

    print(f"frames={F} rows={args.rows} chunk={args.chunk}")
    for g in args.groups:
        for mode in [None, "noslab", "nomember"]:
            shadow_pallas._ablate = mode
            try:
                fn = jax.jit(lambda p, l, gg=g: render_states_batched(
                    r, cache, ds, p, l, shadow_rows=args.rows,
                    lane_groups=gg, trace_rows=40,
                    shadow_chunk=args.chunk, upto="shadow"))
                t = time_host(fn, players, lights, iters=args.iters)
                print(f"G={g} ablate={str(mode):9s} {t*1e3:9.2f} ms "
                      f"({t*1e3/F:7.3f} ms/frame)")
            finally:
                shadow_pallas._ablate = None


if __name__ == "__main__":
    main()
