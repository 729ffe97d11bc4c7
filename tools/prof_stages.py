"""Per-stage TPU timing for the render pipeline variants.

Times each stage with device->host materialisation (block_until_ready is not
reliable through the remote-TPU tunnel).  Usage:
    python tools/prof_stages.py [graybox|demo]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(label, fn, *args, iters=3):
    out = None
    for _ in range(2):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:35s} {best*1e3:9.2f} ms")
    return out


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, demo_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import binning

    which = sys.argv[1] if len(sys.argv) > 1 else "graybox"
    scene = graybox_world() if which == "graybox" else demo_world(10)
    light = default_light()
    print(f"scene={which} entities={scene.n_entities} "
          f"devices={jax.devices()}")

    r = DeferredRenderer(cfg)
    r.configure_for(scene)
    ds = DeviceScene.from_scene(scene, cfg)
    la = jnp.asarray(light.as_array())

    bins = timeit("binning full rebuild", jax.jit(r.build_bins), ds)
    be, cnt = bins

    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    merge = jax.jit(cache.merge)
    timeit("binning static merge", merge, ds.pos[:1], ds.ext[:1])

    rj = DeferredRenderer(cfg, trace_impl="jnp")
    rj.spans = r.spans
    timeit("trace jnp", jax.jit(rj.trace), ds, be, cnt)

    rp = DeferredRenderer(cfg, trace_impl="pallas")
    rp.spans = r.spans
    gbuf = timeit("trace pallas", jax.jit(rp.trace), ds, be, cnt)

    rs = DeferredRenderer(cfg, shadow_impl="scan")
    rs.spans = r.spans
    timeit("shade scan-shadow", jax.jit(rs.shade), ds, gbuf, be, cnt, la)

    rf = DeferredRenderer(cfg, shadow_impl="fast")
    rf.spans = r.spans
    timeit("shade fast-shadow", jax.jit(rf.shade), ds, gbuf, be, cnt, la)

    # Combined best pipeline
    best = DeferredRenderer(cfg, shadow_impl="fast", trace_impl="pallas")
    best.spans = r.spans

    def full(dpos, dext, light):
        be, cnt = cache.merge(dpos, dext)
        gbuf = best.trace(ds, be, cnt)
        return best.shade(ds, gbuf, be, cnt, light)

    timeit("FULL best pipeline", jax.jit(full), ds.pos[:1], ds.ext[:1], la)


if __name__ == "__main__":
    main()
