"""BASELINE workload configs: shapes beyond the reference defaults.

Config 3: 512x512 view (not a bin-size multiple -> ceil hash grid) with ~1k
entities and depth-sorted overlap resolve.  Config 2 shape: 256x256.  All
gated against the NumPy oracle pixel-exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig
from pixel_art_raytracer_tpu.scene import SceneBuilder, Light
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.models.animation import AnimationRenderer


def overlap_scene(config, n_side=32, seed=3):
    """~1k overlapping boxes at varied y/z — exercises depth resolve."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder(config=config)
    b.insert((config.view_width // 2, 36, config.view_length // 4),
             (20, 20, 20))
    for i in range(n_side):
        for j in range(n_side):
            x = int(rng.integers(0, config.view_width - 4))
            y = int(rng.integers(0, 60))
            z = int(rng.integers(0, config.view_length - 4))
            b.insert((x, y, z), (20, 20, 20))
    return b.build()


def render_both(scene, light, config, **kw):
    r = DeferredRenderer(config, **kw)
    r.spans = r.spans_for(scene)
    ds = DeviceScene.from_scene(scene, config)
    frame = np.asarray(r.render(ds, light.as_array()))
    img_p, _ = oracle.render_frame(scene, light, config)
    return frame, img_p


@pytest.mark.slow
class TestConfig3_512:
    def test_512_overlap_golden(self):
        cfg = RenderConfig(view_width=512, view_height=512, view_length=320)
        assert cfg.hash_width == 13 and cfg.hash_height == 13
        scene = overlap_scene(cfg)
        assert scene.n_entities == 1025
        light = Light(400, 300, 100)
        from pixel_art_raytracer_tpu.ops import shadow_fast
        tables = shadow_fast.default_tables(cfg, max_candidates=4096)
        frame, img_p = render_both(scene, light, cfg, shadow_impl="fast",
                                   trace_impl="auto", shadow_tables=tables)
        np.testing.assert_array_equal(frame, img_p)


class TestConfig2_256:
    def test_256_anim_batch(self):
        cfg = RenderConfig(view_width=256, view_height=256, view_length=320)
        scene = overlap_scene(cfg, n_side=10)
        r = DeferredRenderer(cfg, shadow_impl="fast")
        r.spans = r.spans_for(scene)
        anim = AnimationRenderer(r, cfg)
        ds = DeviceScene.from_scene(scene, cfg)
        players, lights = anim.light_sweep_states(4, scene.pos[0])
        frames = np.asarray(anim.render_states(ds, players, lights))
        assert frames.shape == (4, 256, 256, 3)
        # golden-check frame 0 against the oracle
        img_p, _ = oracle.render_frame(
            scene, Light(*map(int, np.asarray(lights[0]))), cfg)
        np.testing.assert_array_equal(frames[0], img_p)


class TestCheckpointedAnimation:
    def test_resume(self, tmp_path):
        cfg = RenderConfig(view_width=80, view_height=80, view_length=80)
        b = SceneBuilder(config=cfg)
        b.insert((30, 20, 20), (20, 20, 20))
        b.insert((0, 0, 0), (20, 20, 20))
        scene = b.build()
        r = DeferredRenderer(cfg, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        anim = AnimationRenderer(r, cfg)
        ds = DeviceScene.from_scene(scene, cfg)
        players = np.broadcast_to(scene.pos[0], (5, 3)).astype(np.int32)
        lights = np.broadcast_to(np.array([60, 60, 20]), (5, 3)).astype(np.int32)
        out1 = anim.render_long(ds, players, lights, tmp_path, chunk_size=2)
        assert out1.shape == (5, 80, 80, 3)
        out2 = anim.render_long(ds, players, lights, tmp_path, chunk_size=2)
        np.testing.assert_array_equal(out1, out2)


class TestConfig1_64:
    """BASELINE config 1: reference sprite on a tiny 64x64 frame, CPU jax
    backend, pixel-exact vs the oracle (which is cross-checked against the
    independent C++ implementation)."""

    def test_64_brute_and_deferred_golden(self):
        from pixel_art_raytracer_tpu.models.brute import BruteForceRenderer
        from pixel_art_raytracer_tpu.runtime import native

        cfg = RenderConfig(view_width=64, view_height=64, view_length=64)
        b = SceneBuilder(config=cfg)
        b.insert((10, 0, 10), (20, 20, 20))
        b.insert((30, 10, 20), (20, 20, 20))
        scene = b.build()
        light = Light(64, 32, 16)
        frame, img_p = render_both(scene, light, cfg, shadow_impl="fast",
                                   shadow_max_steps=8)
        np.testing.assert_array_equal(frame, img_p)
        if native.native_available():
            img_c, _ = native.cpp_render_frame(scene, light, cfg)
            np.testing.assert_array_equal(img_p, img_c)
        # brute-force model G-buffer agrees on this quirk-free scene
        ds = DeviceScene.from_scene(scene, cfg)
        brute = BruteForceRenderer(cfg)
        gb = brute.trace(ds)
        be, cnt = oracle.build_bins(scene, cfg)
        gb_p = oracle.trace_pixels(scene, be, cnt, cfg)
        np.testing.assert_array_equal(np.asarray(gb.entity_index),
                                      gb_p.entity_index)
