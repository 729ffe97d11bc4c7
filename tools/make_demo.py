"""Produce the demo artifacts: animated GIF of the graybox world (the
reference's published artifact is exactly such a capture) plus stills.

Usage: python tools/make_demo.py [out_dir] [n_frames]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    out_dir = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "docs")
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out_dir.mkdir(parents=True, exist_ok=True)

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.utils.gif import write_gif
    from pixel_art_raytracer_tpu.utils.png import write_png

    scene = graybox_world()
    light = default_light()
    r = DeferredRenderer(cfg, shadow_impl="fast", trace_impl="auto")
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene)

    players, lights = anim.light_sweep_states(
        n_frames, scene.pos[0], center=(light.x, light.y, light.z),
        radius=120)
    frames = np.asarray(anim.render_states(ds, players, lights))

    encoder = write_gif(out_dir / "graybox_sweep.gif", frames, delay_cs=5)
    write_png(out_dir / "graybox_frame.png", frames[0])
    print(f"wrote {out_dir}/graybox_sweep.gif ({encoder} encoder, "
          f"{n_frames} frames) and graybox_frame.png")


if __name__ == "__main__":
    main()
