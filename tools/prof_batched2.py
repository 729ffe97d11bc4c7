"""64-frame batched decomposition with forced materialisation per stage."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

F = 64


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1e3:9.2f} ms  ({best*1e3/F:7.2f} ms/frame)")


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.default_tables(cfg, max_candidates=1024)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    def scan_over(frame_fn):
        def run(players, lights):
            def body(_, pl_):
                p, l = pl_
                return None, frame_fn(p, l)
            _, out = jax.lax.scan(body, None, (players, lights))
            return out.sum(dtype=jnp.int64) if out.dtype != jnp.uint8 \
                else out.sum(dtype=jnp.int32)
        return jax.jit(run)

    def stage(p, l, upto):
        pos = ds.pos.at[0].set(p)
        d = ds._replace(pos=pos)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        if upto == "merge":
            return cnt.sum()
        gbuf = r.trace(d, be, cnt)
        if upto == "trace":
            # force the full epilogue
            return (gbuf.color.sum(dtype=jnp.int32)
                    + gbuf.normal.sum().astype(jnp.int32)
                    + gbuf.y.sum() + gbuf.z.sum() + gbuf.entity_index.sum())
        frame = r.shade(d, gbuf, be, cnt, l)
        return frame.sum(dtype=jnp.int32)

    timeit("merge", scan_over(lambda p, l: stage(p, l, "merge")),
           players, lights)
    timeit("merge+trace (full epilogue)",
           scan_over(lambda p, l: stage(p, l, "trace")), players, lights)
    timeit("FULL", scan_over(lambda p, l: stage(p, l, "full")),
           players, lights)

    # FULL with the scan-free fast shadow for comparison
    r2 = DeferredRenderer(cfg, shadow_impl="fast", trace_impl="auto",
                          shadow_tables=tables)
    r2.configure_for(scene)

    def full2(p, l):
        pos = ds.pos.at[0].set(p)
        d = ds._replace(pos=pos)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        gbuf = r2.trace(d, be, cnt)
        return r2.shade(d, gbuf, be, cnt, l).sum(dtype=jnp.int32)

    timeit("FULL (xla fast shadow)", scan_over(full2), players, lights)


if __name__ == "__main__":
    main()
