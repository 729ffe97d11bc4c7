"""Batched (16-frame scan) marginal-cost profiling on TPU."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:42s} {best*1e3:9.2f} ms  ({best*1e3/16:7.2f} ms/frame)")


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast
    from pixel_art_raytracer_tpu.ops.cstyle import c_div

    scene = graybox_world()
    light = default_light()
    from pixel_art_raytracer_tpu.ops import shadow_fast as _sf
    tables = _sf.default_tables(cfg, max_candidates=1024)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto", shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        16, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    def scan_over(frame_fn):
        def run(players, lights):
            def body(_, pl_):
                p, l = pl_
                return None, frame_fn(p, l)
            _, out = jax.lax.scan(body, None, (players, lights))
            return out
        return jax.jit(run)

    # 1. binning merge only
    timeit("merge only", scan_over(
        lambda p, l: cache.merge(ds.pos.at[0].set(p)[:1], ds.ext[:1])[1].sum()),
        players, lights)

    # 2. merge + pallas trace (checksum of winner entity)
    def f2(p, l):
        be, cnt = cache.merge(p[None], ds.ext[:1])
        gbuf = r.trace(ds._replace(pos=ds.pos.at[0].set(p)), be, cnt)
        return gbuf.entity_index.sum()
    timeit("merge + pallas trace", scan_over(f2), players, lights)

    # 3. + membership tables + candidates (no per-pixel work)
    tables = shadow_fast.default_tables(cfg)
    def f3(p, l):
        be, cnt = cache.merge(p[None], ds.ext[:1])
        lbx = c_div(l[0], cfg.bin_size)
        lby = c_div(jnp.int32(cfg.view_height) - l[1] - l[2], cfg.bin_size)
        lbz = c_div(l[2], cfg.bin_size)
        member = shadow_fast.dda_membership((lbx, lby, lbz), cfg, tables)
        cands = shadow_fast.build_candidates(ds.pos, ds.ext, be, cnt, member,
                                             cfg, tables)
        return member.sum() + cands.ent.sum()
    timeit("merge + membership + candidates", scan_over(f3), players, lights)

    # 4. full pipeline
    def f4(p, l):
        pos = ds.pos.at[0].set(p)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        d = ds._replace(pos=pos)
        gbuf = r.trace(d, be, cnt)
        return r.shade(d, gbuf, be, cnt, l)
    timeit("FULL (merge+trace+shade)", scan_over(f4), players, lights)


if __name__ == "__main__":
    main()
