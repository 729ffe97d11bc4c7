"""Batched per-stage TPU profiling (one tool; flags replace the old
prof_batched/2/3 triplet).

Renders an F-frame light-sweep scan on the graybox world and times a
cumulative stage decomposition: bins merge -> primary trace -> shadow
factor -> full shaded frame.

Two materialisation modes:
  default     per-frame checksums are fused inside the scan body (cheapest
              honest completion signal; scalars only cross the host link).
  --array-out each stage emits a REAL per-frame array that the scan stacks
              into HBM; the checksum is a second pass outside the scan, so
              the body cannot fuse the reduction.  Locates cost that only
              appears when stages must materialise.

Also compares the XLA fast-shadow path with --shadow fast.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pixel_art_raytracer_tpu.utils.metrics import time_fn  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--array-out", action="store_true",
                    help="stages emit real per-frame arrays (no sum fusion)")
    ap.add_argument("--shadow", choices=["pallas", "fast"], default="pallas")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast, shade as shade_ops

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl=args.shadow, trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    def stage_fn(p, l, upto):
        pos = ds.pos.at[0].set(p)
        d = ds._replace(pos=pos)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        if upto == "bins":
            return cnt if args.array_out else cnt.sum()
        gbuf = r.trace(d, be, cnt)
        if upto == "trace":
            # touch the full epilogue so nothing dead-code-eliminates
            mix = (gbuf.entity_index + gbuf.y + gbuf.z
                   + gbuf.color.sum(-1).astype(jnp.int32)
                   + gbuf.normal.sum(-1).astype(jnp.int32))
            return mix if args.array_out else mix.sum(dtype=jnp.int32)
        if upto == "factor":
            factor = shade_ops.lighting_factor(
                d.pos, d.ext, gbuf, be, cnt, l, cfg, r.shadow_max_steps,
                args.shadow, tables)
            fi = (factor * 255).astype(jnp.int32)
            return fi if args.array_out else fi.sum(dtype=jnp.int32)
        frame = r.shade(d, gbuf, be, cnt, l)
        return (frame.reshape(cfg.view_height, -1) if args.array_out
                else frame.sum(dtype=jnp.int32))

    def scan_over(upto):
        @jax.jit
        def run(players, lights):
            def body(_, pl):
                return None, stage_fn(*pl, upto)
            _, ys = jax.lax.scan(body, None, (players, lights))
            # checksum outside the scan: with --array-out the scan body has
            # already been forced to stack real arrays into HBM.
            return ys.sum(dtype=jnp.int32)
        return run

    mode = "array-out" if args.array_out else "sum-fused"
    print(f"frames={F} shadow={args.shadow} mode={mode}")
    for upto, label in [("bins", "bins merge"),
                        ("trace", "+ primary trace"),
                        ("factor", "+ shadow factor"),
                        ("frame", "FULL (merge+trace+shade)")]:
        best, _ = time_fn(scan_over(upto), players, lights,
                          iters=args.iters)
        print(f"{label:36s} {best*1e3:9.2f} ms  "
              f"({best*1e3/F:7.3f} ms/frame)")


if __name__ == "__main__":
    main()
