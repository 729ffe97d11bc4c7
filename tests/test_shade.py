"""Shadow-march + deferred-lighting parity and full-frame golden tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import (SceneBuilder, demo_world,
                                           graybox_world, default_light, Light)
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.runtime import native


_RENDERERS = {}


def render_jax(scene, light, config=DEFAULT_CONFIG):
    # One renderer per (config, scene-shape): jit caches persist across
    # lights, keeping the suite to a single compile per shape.
    key = (config, scene.n_entities)
    if key not in _RENDERERS:
        r = DeferredRenderer(config)
        r.spans = r.spans_for(scene)
        _RENDERERS[key] = r
    r = _RENDERERS[key]
    ds = DeviceScene.from_scene(scene, config)
    return np.asarray(r.render(ds, light.as_array()))


class TestShadePixelExact:
    def test_demo_world(self):
        scene = demo_world(10)
        light = default_light()
        img_p, _ = oracle.render_frame(scene, light)
        img_j = render_jax(scene, light)
        np.testing.assert_array_equal(img_j, img_p)

    def test_light_positions(self):
        scene = demo_world(6)
        for light in [Light(100, 100, 100), Light(479, 10, 300)]:
            img_p, _ = oracle.render_frame(scene, light)
            img_j = render_jax(scene, light)
            np.testing.assert_array_equal(img_j, img_p,
                                          err_msg=f"light={light}")

    def test_background_is_quarter_gray(self):
        # Quirk Q6: unlit background shades to ambient * 127 = 31.
        b = SceneBuilder()
        b.insert((0, 0, 0), (20, 20, 20))
        scene = b.build()
        img, _ = oracle.render_frame(scene, default_light())
        assert tuple(img[0, 400]) == (31, 31, 31)

    def test_self_shadow_skip(self):
        # A single box never shadows itself (alternative.cpp:483-487):
        # its top face must be lit despite sitting inside its own bin path.
        b = SceneBuilder()
        b.insert((200, 0, 100), (20, 20, 20))
        scene = b.build()
        light = Light(250, 200, 120)
        img, gbuf = oracle.render_frame(scene, light)
        top = (gbuf.entity_index == 0) & (gbuf.normal[..., 1] == 1.0)
        assert top.any()
        # lit top-face pixels are brighter than ambient-only (25 for pal 0)
        vals = img[top][:, 0]
        assert (vals > 25).any()


class TestKernelPathGolden:
    """Default-tier Pallas-vs-oracle golden (VERDICT r3 #5): both Mosaic
    kernels (trace + shadow, interpret mode on CPU) against the NumPy
    oracle — and the C++ oracle when built — so ``pytest -q`` alone
    certifies kernel parity without the slow graybox tier.  Golden
    semantics: alternative.cpp:271-500."""

    def test_trace_and_shadow_kernels_vs_oracle(self):
        scene = demo_world(8)
        light = Light(150, 170, 90)
        r = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="pallas",
                             trace_impl="pallas")
        r.configure_for(scene)
        ds = DeviceScene.from_scene(scene, DEFAULT_CONFIG)
        img_j = np.asarray(r.render(ds, light.as_array()))
        img_p, _ = oracle.render_frame(scene, light)
        np.testing.assert_array_equal(img_j, img_p)
        if native.native_available():
            img_c, _ = native.cpp_render_frame(scene, light)
            np.testing.assert_array_equal(img_j, img_c)


@pytest.mark.slow
class TestGoldenGraybox:
    """The flagship golden gate: full 480x320 graybox frame, three-way."""

    def test_graybox_frame(self):
        scene = graybox_world()
        light = default_light()
        bins = oracle.build_bins(scene)
        gb_p = oracle.trace_pixels(scene, *bins)
        img_p = oracle.shade(scene, gb_p, *bins, light)
        img_j = render_jax(scene, light)
        np.testing.assert_array_equal(img_j, img_p)
        if native.native_available():
            img_c, _ = native.cpp_render_frame(scene, light)
            np.testing.assert_array_equal(img_c, img_p)


class TestOverlay:
    def test_line_endpoints_and_bounds(self):
        img = np.zeros((320, 480, 3), np.uint8)
        oracle.draw_line(img, 10, 10, 50, 30, (255, 0, 0))
        assert tuple(img[10, 10]) == (255, 0, 0)
        assert tuple(img[30, 50]) == (255, 0, 0)
        # out-of-bounds endpoints must not crash
        oracle.draw_line(img, -20, -20, 500, 340, (0, 255, 0))


class TestDeviceOverlay:
    def test_matches_host_bresenham(self):
        import jax
        import jax.numpy as jnp
        from pixel_art_raytracer_tpu.ops.overlay import draw_line as jline

        rng = np.random.default_rng(7)
        f = jax.jit(jline)
        for _ in range(12):
            x0, x1 = rng.integers(-30, 510, 2)
            y0, y1 = rng.integers(-30, 350, 2)
            host = np.zeros((320, 480, 3), np.uint8)
            oracle.draw_line(host, int(x0), int(y0), int(x1), int(y1),
                             (255, 0, 0))
            dev = np.asarray(f(jnp.zeros((320, 480, 3), jnp.uint8),
                               int(x0), int(y0), int(x1), int(y1),
                               jnp.asarray([255, 0, 0], jnp.uint8)))
            np.testing.assert_array_equal(
                dev, host, err_msg=f"({x0},{y0})->({x1},{y1})")
