"""Localize TPU parity breaks: per-stage diffs between implementations.

Compares, on the current backend:
  1. G-buffer: trace=pallas vs trace=jnp (field-by-field diff counts).
  2. lit mask: shadow=pallas vs shadow=fast (same jnp G-buffer).
Prints the first few differing pixel coordinates and values for each break.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.ops import shadow_fast, shade as shade_ops

    scene = graybox_world()
    light = default_light()
    ds = DeviceScene.from_scene(scene)
    la = jnp.asarray(light.as_array())
    tables = shadow_fast.derive_tables(cfg, scene)

    rj = DeferredRenderer(cfg, shadow_impl="fast", trace_impl="jnp",
                          shadow_tables=tables)
    rj.configure_for(scene)
    rp = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="pallas",
                          shadow_tables=tables)
    rp.configure_for(scene)

    be, cnt = jax.jit(rj.build_bins)(ds)

    @jax.jit
    def gbufs(ds, be, cnt):
        rj._traced = rp._traced = True
        gj = rj.trace(ds, be, cnt)
        gp = rp.trace(ds, be, cnt)
        return gj, gp

    gj, gp = gbufs(ds, be, cnt)
    gj = jax.tree.map(np.asarray, gj)
    gp = jax.tree.map(np.asarray, gp)
    print("== G-buffer: pallas vs jnp ==")
    for name in ("normal", "color", "y", "z", "entity_index"):
        a, b = getattr(gj, name), getattr(gp, name)
        d = (a != b)
        while d.ndim > 2:
            d = d.any(-1)
        n = int(d.sum())
        print(f"  {name:13s} diff_px={n}")
        if n:
            ys, xs = np.nonzero(d)
            for k in range(min(5, n)):
                j, i = int(ys[k]), int(xs[k])
                print(f"    px(j={j}, i={i}): jnp={a[j, i]} pallas={b[j, i]}")

    @jax.jit
    def lits(ds, be, cnt):
        rj._traced = True
        g = rj.trace(ds, be, cnt)
        f_fast = shade_ops.lighting_factor(
            ds.pos, ds.ext, g, be, cnt, la, cfg, rj.shadow_max_steps,
            "fast", tables)
        f_pal = shade_ops.lighting_factor(
            ds.pos, ds.ext, g, be, cnt, la, cfg, rj.shadow_max_steps,
            "pallas", tables)
        return f_fast, f_pal

    ff, fp = lits(ds, be, cnt)
    ff, fp = np.asarray(ff), np.asarray(fp)
    d = ff != fp
    n = int(d.sum())
    print(f"== lighting factor: pallas vs fast (jnp gbuf) == diff_px={n}")
    if n:
        ys, xs = np.nonzero(d)
        for k in range(min(8, n)):
            j, i = int(ys[k]), int(xs[k])
            print(f"    px(j={j}, i={i}): fast={ff[j, i]} pallas={fp[j, i]}")


if __name__ == "__main__":
    main()
