"""Decompose the fast-shadow + epilogue costs (batched, on TPU)."""

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
    r = DeferredRenderer(cfg, shadow_impl="fast", trace_impl="auto")
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    ds = DeviceScene.from_scene(scene, cfg)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    players, lights = anim.light_sweep_states(
        16, scene.pos[0], center=(light.x, light.y, light.z), radius=40)
    tables = shadow_fast.default_tables(cfg)

    def scan_over(frame_fn):
        def run(players, lights):
            def body(_, pl_):
                p, l = pl_
                return None, frame_fn(p, l)
            _, out = jax.lax.scan(body, None, (players, lights))
            return out
        return jax.jit(run)

    def prelude(p, l):
        pos = ds.pos.at[0].set(p)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        d = ds._replace(pos=pos)
        gbuf = r.trace(d, be, cnt)
        lbx = c_div(l[0], cfg.bin_size)
        lby = c_div(jnp.int32(cfg.view_height) - l[1] - l[2], cfg.bin_size)
        lbz = c_div(l[2], cfg.bin_size)
        member = shadow_fast.dda_membership((lbx, lby, lbz), cfg, tables)
        cands = shadow_fast.build_candidates(pos, ds.ext, be, cnt, member,
                                             cfg, tables)
        return d, gbuf, member, cands

    # A: prelude only (gbuffer checksum)
    timeit("prelude (merge+trace+member+cands)", scan_over(
        lambda p, l: prelude(p, l)[1].entity_index.sum()), players, lights)

    # B: + pixel bitmap gather
    def fB(p, l):
        d, gbuf, member, cands = prelude(p, l)
        H, W = cfg.view_height, cfg.view_width
        wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
        rbx = c_div(wx, cfg.bin_size)
        rby = c_div(jnp.int32(cfg.view_height) - gbuf.y - gbuf.z, cfg.bin_size)
        rbz = c_div(gbuf.z, cfg.bin_size)
        bm = shadow_fast.pixel_bitmap(member, rbx, rby, rbz, cfg, tables)
        return bm.sum()
    timeit("+ pixel bitmap gather", scan_over(fB), players, lights)

    # C: + candidate scan (full shade, sum only)
    def fC(p, l):
        d, gbuf, member, cands = prelude(p, l)
        be, cnt = cache.merge(d.pos[:1], ds.ext[:1])
        frame = r.shade(d, gbuf, be, cnt, l)
        return frame.sum()
    timeit("+ full shade (checksum only)", scan_over(fC), players, lights)

    # D: full with frame output transfer
    def fD(p, l):
        d, gbuf, member, cands = prelude(p, l)
        be, cnt = cache.merge(d.pos[:1], ds.ext[:1])
        return r.shade(d, gbuf, be, cnt, l)
    timeit("+ frames transferred to host", scan_over(fD), players, lights)


if __name__ == "__main__":
    main()
