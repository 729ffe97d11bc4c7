"""64-frame decomposition with REAL array outputs per stage (no sum fusion).

Locates cost that only appears when stages must materialise: each variant's
scan emits a genuine per-frame array; timing pulls a tiny checksum computed
by a second pass over the stacked result (outside the scan, so the scan body
itself cannot fuse the reduction).
"""

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
    np.asarray(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:9.2f} ms  ({best*1e3/F:7.2f} ms/frame)")


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast, shade as shade_ops

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.default_tables(cfg, max_candidates=1024)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    ds = DeviceScene.from_scene(scene, cfg)
    t = np.arange(F)
    players = jnp.asarray(np.broadcast_to(scene.pos[0], (F, 3)), jnp.int32)
    lights = jnp.asarray(np.stack([440 + (t % 16), np.full(F, 160),
                                   np.full(F, 80)], 1), jnp.int32)

    def variant(stage):
        def frame_fn(p, l):
            pos = ds.pos.at[0].set(p)
            d = ds._replace(pos=pos)
            be, cnt = cache.merge(pos[:1], ds.ext[:1])
            if stage == "bins":
                return cnt
            gbuf = r.trace(d, be, cnt)
            if stage == "gbuf":
                return gbuf.entity_index + gbuf.y + gbuf.z \
                    + gbuf.color.sum(-1).astype(jnp.int32) \
                    + gbuf.normal.sum(-1).astype(jnp.int32)
            factor = shade_ops.lighting_factor(
                d.pos, d.ext, gbuf, be, cnt, l, cfg, 16, "pallas", tables)
            if stage == "factor":
                return (factor * 255).astype(jnp.int32)
            frame = r.shade(d, gbuf, be, cnt, l)
            return frame.reshape(cfg.view_height, -1)

        @jax.jit
        def run(players, lights):
            def body(_, pl):
                return None, frame_fn(*pl)
            _, ys = jax.lax.scan(body, None, (players, lights))
            return ys.sum(dtype=jnp.int32)

        return run

    timeit("bins (array out)", variant("bins"), players, lights)
    timeit("+ gbuffer (array out)", variant("gbuf"), players, lights)
    timeit("+ shadow+factor (array out)", variant("factor"), players, lights)
    timeit("+ frame (array out)", variant("frame"), players, lights)


if __name__ == "__main__":
    main()
