"""On-device parity check: compiled (Mosaic) kernels vs the CPU oracle.

Renders the graybox frame on the current backend with every implementation
pair and reports pixel-exactness against the NumPy oracle (itself
cross-checked against the independent C++ oracle).  Run on the TPU to verify
the compiled kernels — interpret-mode parity on CPU does not cover Mosaic
lowering.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from pixel_art_raytracer_tpu.utils.device import require_device

    print(f"backend: {require_device()}")

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu import oracle
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.ops import shadow_fast

    scene = graybox_world()
    light = default_light()
    print("computing oracle golden frame...")
    img_p, _ = oracle.render_frame(scene, light)

    ds = DeviceScene.from_scene(scene)
    la = jnp.asarray(light.as_array())
    tables = shadow_fast.derive_tables(cfg, scene)
    print(f"derived tables: {tables}")
    failures = 0
    for trace_impl, shadow_impl in [("pallas", "pallas"), ("pallas", "fast"),
                                    ("jnp", "fast")]:
        r = DeferredRenderer(cfg, shadow_impl=shadow_impl,
                             trace_impl=trace_impl, shadow_tables=tables)
        r.configure_for(scene)
        t0 = time.time()
        frame = np.asarray(r.render(ds, la))
        ok = np.array_equal(frame, img_p)
        failures += 0 if ok else 1
        diff = 0 if ok else int((frame != img_p).any(-1).sum())
        print(f"trace={trace_impl:6s} shadow={shadow_impl:6s} "
              f"exact={ok} diff_px={diff} ({time.time()-t0:.0f}s)")
    # Whole-batch pipeline (the bench path: frame-grid kernels, batched
    # prep, slot compaction, lane groups) vs per-frame renders — on the
    # compiled backend.
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins

    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    # Guard the comparison's meaning: if a config/renderer change ever makes
    # the batched path incapable, render_states would silently fall back to
    # the scan path and this check would become vacuous.
    assert anim._batched_capable(ds), \
        "batched pipeline not engaged — parity check would be vacuous"
    players, lights = anim.light_sweep_states(
        2, scene.pos[0], center=(light.x, light.y, light.z), radius=40)
    t0 = time.time()
    batch = np.asarray(anim.render_states(ds, players, lights))
    singles = np.stack([
        np.asarray(r.render(ds, lights[k])) for k in range(2)])
    ok = np.array_equal(batch, singles)
    failures += 0 if ok else 1
    diff = 0 if ok else int((batch != singles).any(-1).sum())
    print(f"batched pipeline (F=2, slot_cap={anim.trace_slot_cap}, "
          f"G={anim.shadow_lane_groups}) exact={ok} diff_px={diff} "
          f"({time.time()-t0:.0f}s)")

    print("PARITY OK" if failures == 0 else f"PARITY FAILURES: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
