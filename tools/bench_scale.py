"""BASELINE config-5 scale bench: supersampled big-scene rendering.

Renders a 10k-box scene at a 1024x1024 base resolution with s-times
supersampling (the render runs at (1024*s)^2 — lane-tiled Pallas kernels)
and reports per-frame time and Mrays/s at the *traced* resolution.

Usage: python tools/bench_scale.py [factor=2] [iters=3] [frames=8]
                                   [--nonramp]

``--nonramp``: give half the boxes a NON-column-constant depth map, so
the big-scene run exercises the kernel's ramp-rect depth path
(trace_pallas.depth_rects — the arbitrary-atlas generalisation of the
shipped tile's single ramp) instead of falling back to the jnp tracer.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nonramp = "--nonramp" in sys.argv
    factor = int(args[0]) if len(args) > 0 else 2
    iters = int(args[1]) if len(args) > 1 else 3

    from pixel_art_raytracer_tpu.config import RenderConfig
    from pixel_art_raytracer_tpu.scene import SceneBuilder
    from pixel_art_raytracer_tpu.models.supersample import (
        SupersampledRenderer)

    cfg = RenderConfig(view_width=1024, view_height=1024, view_length=320)
    atlas = None
    if nonramp:
        from pixel_art_raytracer_tpu.assets import (SpriteAtlas,
                                                    make_tile_floor)

        tile = make_tile_floor()
        h, w = tile.depth.shape[-2:]
        r_ = np.arange(h)[:, None]
        c_ = np.arange(w)[None, :]
        # Two column bands (scale-friendly: the supersample staircase of a
        # band stays a few dozen rects; a per-column cycle would exceed
        # the rect cap at factor >= 2 and silently fall back to jnp).
        depth1 = (np.maximum(0, 19 - r_)
                  + np.where(c_ >= w // 2, 3, 0)).astype(np.int32)
        atlas = SpriteAtlas(
            color=np.stack([tile.color[0], tile.color[0]]),
            depth=np.stack([tile.depth[0], depth1]),
            normal=np.stack([tile.normal[0], tile.normal[0]]))
    b = SceneBuilder(config=cfg, atlas=atlas)
    b.insert((500, 36, 80), (20, 20, 20))            # player
    n = 1
    i = 0
    while n < 10_000:                                 # 10k-box floor+piers
        x = (i * 37) % 1040
        z = (i * 53) % 300
        y = 20 if (i % 7 == 0) else 0
        b.insert((x, y, z), (20, 20, 20),
                 sprite_id=(i % 2) if nonramp else 0)
        n += 1
        i += 1
    scene = b.build()
    print(f"scene: {scene.n_entities} entities; render at "
          f"{1024 * factor}x{1024 * factor} (s={factor})")

    F = int(args[2]) if len(args) > 2 else 8

    # Shadow tables derive from the scaled scene in prepare()/configure_for.
    ss = SupersampledRenderer(
        cfg, factor=factor, shadow_impl="pallas", trace_impl="auto")
    ds = ss.prepare(scene)
    if nonramp:
        segs = ss.renderer.depth_segments
        assert segs and len(segs[0]) == 7, \
            "non-ramp atlas must ride the rect-depth kernel path"
        print(f"non-ramp atlas: {len(segs)} depth rects on the kernel path")
    light = jnp.asarray([512, 200, 80], jnp.int32)

    t0 = time.time()
    frame = np.asarray(ss.render(ds, light))
    print(f"single frame (incl. compile): {time.time() - t0:.1f}s, "
          f"frame {frame.shape}, mean {frame.mean():.1f}")
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(ss.render(ds, light))
        best = min(best, time.perf_counter() - t0)
    side = 1024 * factor
    rays = 2 * side * side
    print(f"single-frame best {best * 1e3:.1f} ms/frame at {side}x{side} "
          f"-> {rays / best / 1e6:.1f} Mrays/s "
          f"({rays / 1e6:.1f} Mrays/frame)")

    # Batched animation at scale: F frames through the whole-batch
    # pipeline (one launch per kernel), light sweep, frames delivered.
    import jax

    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins

    anim = AnimationRenderer(ss.renderer, ss.config,
                             static_bins=StaticBins(
                                 ds.pos, ds.ext, 1, ss.config,
                                 ss.renderer.spans))
    players, lights = anim.light_sweep_states(
        F, ds.pos[0], center=(512 * factor, 200 * factor, 80 * factor),
        radius=40 * factor)

    @jax.jit
    def run(players, lights):
        frames = anim._render_states(ds, players, lights)
        return frames, frames.reshape(F, -1).sum(axis=1, dtype=jnp.int32)

    t0 = time.time()
    _ = np.asarray(run(players, lights)[1])
    print(f"batched F={F} (incl. compile): {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(run(players, lights)[1])
        best = min(best, time.perf_counter() - t0)
    print(f"batched best {best * 1e3 / F:.1f} ms/frame -> "
          f"{rays * F / best / 1e6:.1f} Mrays/s")


if __name__ == "__main__":
    main()
