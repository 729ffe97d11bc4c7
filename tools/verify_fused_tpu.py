"""On-device parity check for the fused trace+shadow kernel.

Compiles the batched graybox pipeline twice — fused (ops/fused_pallas,
one launch per (frame, row-block) tile) and the two-kernel default — on
the current backend and compares the delivered frames pixel-exactly.
Interpret-mode parity (tests/test_batched.py TestFusedKernel) does not
cover Mosaic lowering or TPU float semantics; this does.  Reference
fused per-frame loop: alternative.cpp:690-760.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main(frames: int = 8):
    from pixel_art_raytracer_tpu.utils.device import require_device

    print(f"backend: {require_device()}")

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.derive_tables(cfg, scene)
    ds = DeviceScene.from_scene(scene)

    frames_out = {}
    for fused in (False, True):
        r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                             shadow_tables=tables)
        r.configure_for(scene)
        r.fuse_trace_shadow = fused
        cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
        anim = AnimationRenderer(r, cfg, static_bins=cache, batched=True)
        players, lights = anim.light_sweep_states(
            frames, scene.pos[0], center=(light.x, light.y, light.z),
            radius=40)
        t0 = time.time()
        out = np.asarray(anim.render_states(ds, players, lights))
        print(f"fused={fused}: rendered {out.shape} in {time.time()-t0:.1f}s")
        frames_out[fused] = out

    eq = np.array_equal(frames_out[True], frames_out[False])
    ndiff = int((frames_out[True] != frames_out[False]).any(-1).sum())
    print(f"FUSED PARITY {'OK' if eq else f'FAIL ({ndiff} px differ)'}")
    return 0 if eq else 1


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sys.exit(main(n))
