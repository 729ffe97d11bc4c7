"""How much of the light-geometry stage is the f64-emulated exact
division?  Times the real `light_geometry` against a WRONG-but-same-shape
variant using native f32 division (timing only — native divide is ~1 ulp
off on TPU and would break parity).

Run on the default (TPU) env; F-frame batch over the graybox G-buffer.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_host(fn, *args, iters=5):
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
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast
    from pixel_art_raytracer_tpu.ops import shade as shade_ops

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    # One traced G-buffer batch, computed once and parked on device.
    @jax.jit
    def gbufs(players):
        dyn_pos = players[:, None, :]
        dyn_ext = jnp.broadcast_to(ds.ext[:1], (F, 1, 3))
        bins_ent, counts = jax.vmap(cache.merge)(dyn_pos, dyn_ext)
        from pixel_art_raytracer_tpu.ops import trace_pallas
        return trace_pallas.trace_pixels_pallas_batched(
            ds.pos, ds.ext, ds.sprite_id, ds.atlas_color, ds.atlas_normal,
            ds.palette, bins_ent, counts, dyn_pos, cfg,
            (ds.depth_d0, ds.depth_slope), r.normal_bands, r.color_rects,
            r.depth_segments, rows_per_block=anim.trace_rows,
            packed_picks=r.trace_packed, field_pack=r.trace_field_pack)

    g = gbufs(players)
    _ = np.asarray(g.y[0, 0, :4])

    def checksum(t):
        tl, inv, origin, rb, lb = t
        return (tl[0].reshape(F, -1).sum(axis=1)
                + inv[1].reshape(F, -1).sum(axis=1)
                + rb[2].reshape(F, -1).sum(axis=1).astype(jnp.float32))

    @jax.jit
    def geom_exact(g, lights):
        return checksum(jax.vmap(
            lambda gb, l: shade_ops.light_geometry(gb, l, cfg))(g, lights))

    def light_geometry_native(gbuf, light_a, config):
        W = config.view_width
        f32 = jnp.float32
        bs = config.bin_size
        from pixel_art_raytracer_tpu.ops.cstyle import c_div
        Hl = gbuf.y.shape[0]
        wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :],
                              (Hl, W))
        wy, wz = gbuf.y, gbuf.z
        lx, ly, lz = light_a[0], light_a[1], light_a[2]
        dx = lx.astype(f32) - wx.astype(f32)
        dy = ly.astype(f32) - wy.astype(f32)
        dz = lz.astype(f32) - wz.astype(f32)
        length = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
        tl = (dx / length, dy / length, dz / length)
        tl = jax.lax.optimization_barrier(tl)
        inv = (1.0 / tl[0], 1.0 / tl[1], 1.0 / tl[2])
        rb = (c_div(wx, bs), c_div(jnp.int32(config.view_height) - wy - wz,
                                   bs), c_div(wz, bs))
        lb = (c_div(lx, bs), c_div(jnp.int32(config.view_height) - ly - lz,
                                   bs), c_div(lz, bs))
        origin = (wx.astype(f32), wy.astype(f32), wz.astype(f32))
        return tl, inv, origin, rb, lb

    @jax.jit
    def geom_native(g, lights):
        return checksum(jax.vmap(
            lambda gb, l: light_geometry_native(gb, l, cfg))(g, lights))

    for name, fn in [("exact (f64-emulated div)", geom_exact),
                     ("native f32 div (WRONG, timing only)", geom_native)]:
        t = time_host(fn, g, lights)
        print(f"{name:40s} {t*1e3:8.2f} ms  ({t*1e3/F:6.3f} ms/frame)")


if __name__ == "__main__":
    main()
