"""Property tests from SURVEY.md §4 plus alternate-config robustness."""

import dataclasses

import numpy as np
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig
from pixel_art_raytracer_tpu.scene import SceneBuilder, Light
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene


def sparse_scene(config, n=12, seed=5):
    """Scene with at most one occupied bin per ray column: tiles on a
    coarse grid so no pixel's bin column crosses two occupied z bins."""
    b = SceneBuilder(config=config)
    rng = np.random.default_rng(seed)
    xs = rng.permutation(config.view_width // config.bin_size)[:n]
    for k, bx in enumerate(xs):
        b.insert((int(bx) * config.bin_size + 5, 0,
                  (k % 2) * config.bin_size + 5), (16, 16, 16))
    return b.build()


class TestEarlyExitProperty:
    def test_no_effect_with_sparse_columns(self):
        """SURVEY §4.4: the early-exit heuristic never changes images when
        each ray column has <= 1 occupied bin run."""
        cfg_on = RenderConfig(view_width=240, view_height=160,
                              view_length=160)
        cfg_off = dataclasses.replace(cfg_on, early_exit=False)
        scene = sparse_scene(cfg_on)
        be, cnt = oracle.build_bins(scene, cfg_on)
        gb_on = oracle.trace_pixels(scene, be, cnt, cfg_on)
        gb_off = oracle.trace_pixels(scene, be, cnt, cfg_off)
        np.testing.assert_array_equal(gb_on.entity_index, gb_off.entity_index)
        np.testing.assert_array_equal(gb_on.color, gb_off.color)


class TestInsertionOrderSensitivity:
    def test_binning_is_permutation_sensitive(self):
        """SURVEY §4.4: bin contents depend on entity order (documented
        behaviour, not randomised away): reversing insertion order of two
        overlapping boxes flips the depth tie-break winner."""
        cfg = RenderConfig(view_width=80, view_height=80, view_length=80)
        b1 = SceneBuilder(config=cfg)
        b1.insert((20, 0, 20), (20, 20, 20))
        b1.insert((20, 0, 20), (20, 20, 20))
        s1 = b1.build()
        be1, cnt1 = oracle.build_bins(s1, cfg)
        gb1 = oracle.trace_pixels(s1, be1, cnt1, cfg)
        hit = gb1.y != 0
        assert (gb1.entity_index[hit] == 0).all()  # first writer wins ties


class TestAlternateConfigs:
    @pytest.mark.parametrize("cfg", [
        RenderConfig(view_width=80, view_height=80, view_length=80,
                     bin_capacity=4),
        RenderConfig(view_width=80, view_height=80, view_length=80,
                     bin_size=20),
        RenderConfig(view_width=120, view_height=88, view_length=80),
    ], ids=["cap4", "bin20", "nonmultiple"])
    def test_pipeline_matches_oracle(self, cfg):
        b = SceneBuilder(config=cfg)
        b.insert((30, 10, 20), (20, 20, 20))
        for i in range(3):
            for j in range(3):
                b.insert((i * 22, 0, j * 22), (16, 16, 16))
        scene = b.build()
        light = Light(cfg.view_width - 10, cfg.view_height - 20, 20)
        r = DeferredRenderer(cfg, shadow_max_steps=8)
        r.configure_for(scene)
        ds = DeviceScene.from_scene(scene, cfg)
        frame = np.asarray(r.render(ds, light.as_array()))
        img_p, _ = oracle.render_frame(scene, light, cfg)
        np.testing.assert_array_equal(frame, img_p)
