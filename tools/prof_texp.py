"""Micro-profile of the trace expansion-table stage (texp).

Decomposes _expand_tables into cumulative cuts to locate its cost:
  bins   — per-frame bin rebuild only (baseline incl. dispatch floor)
  small  — + transpose, gathers, field compute (pre-expansion stack)
  mm     — + MXU lane-expansion matmul (f32, before the int cast)
  texp   — + int32 cast + full table materialisation (the real stage)

Usage: python tools/prof_texp.py [--frames 64] [--no-field-pack]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_host(fn, *args, iters=3):
    import time
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
    ap.add_argument("--no-field-pack", action="store_true")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.models.batched import render_states_batched
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import trace_pallas

    scene = graybox_world()
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto")
    r.configure_for(scene)
    if args.no_field_pack:
        r.trace_field_pack = False
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(F, scene.pos[0], radius=40)

    print(f"frames={F} field_pack={r.trace_field_pack}")
    for cut, sub in [("bins", None), ("small", "small"), ("mm", "mm"),
                     ("texp", None)]:
        trace_pallas._texp_upto = sub
        upto = "bins" if cut == "bins" else "texp"
        try:
            fn = jax.jit(lambda p, l, u=upto: render_states_batched(
                r, cache, ds, p, l, upto=u))
            t = time_host(fn, players, lights, iters=args.iters)
            print(f"{cut:6s} {t*1e3:9.2f} ms ({t*1e3/F:7.3f} ms/frame)")
        finally:
            trace_pallas._texp_upto = None


if __name__ == "__main__":
    main()
