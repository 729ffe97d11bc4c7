"""Animation, brute-force, and inverse-rendering model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import SceneBuilder, demo_world, Light
from pixel_art_raytracer_tpu import oracle
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.models.animation import (AnimationRenderer,
                                                      WorldState, apply_keys)
from pixel_art_raytracer_tpu.models.brute import BruteForceRenderer
from pixel_art_raytracer_tpu.models.inverse import InverseLightFitter

SMALL = RenderConfig(view_width=80, view_height=80, view_length=80)


def small_scene(config=SMALL):
    b = SceneBuilder(config=config)
    b.insert((30, 20, 20), (20, 20, 20))
    for i in range(3):
        for j in range(3):
            b.insert((i * 24, 0, j * 24), (16, 16, 16))
    return b.build()


class TestAnimation:
    def test_batched_render_matches_per_frame_oracle(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        anim = AnimationRenderer(r, SMALL)
        ds = DeviceScene.from_scene(scene, SMALL)

        players = np.stack([scene.pos[0] + np.array([5 * k, 0, 0])
                            for k in range(3)]).astype(np.int32)
        lights = np.stack([[60, 60, 20], [40, 70, 30], [20, 50, 10]]
                          ).astype(np.int32)
        frames = np.asarray(anim.render_states(
            ds, jnp.asarray(players), jnp.asarray(lights)))
        assert frames.shape == (3, 80, 80, 3)

        for k in range(3):
            import dataclasses
            sc = dataclasses.replace(scene, pos=scene.pos.copy())
            sc.pos[0] = players[k]
            img_p, _ = oracle.render_frame(
                sc, Light(*map(int, lights[k])), SMALL)
            np.testing.assert_array_equal(frames[k], img_p,
                                          err_msg=f"frame {k}")

    def test_apply_keys_matches_reference_bindings(self):
        s = WorldState(player_pos=jnp.asarray([10, 10, 10], jnp.int32),
                       light=jnp.asarray([0, 0, 0], jnp.int32))
        s = apply_keys(s, ["left", "up", "pageup", "o", "j", "a"])
        np.testing.assert_array_equal(np.asarray(s.player_pos), [5, 15, 15])
        np.testing.assert_array_equal(np.asarray(s.light), [5, -5, -5])

    def test_render_script(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        anim = AnimationRenderer(r, SMALL)
        ds = DeviceScene.from_scene(scene, SMALL)
        init = WorldState(player_pos=jnp.asarray(scene.pos[0], jnp.int32),
                          light=jnp.asarray([60, 60, 20], jnp.int32))
        frames, final = anim.render_script(ds, init, [["right"], [], ["h"]])
        assert frames.shape[0] == 3
        assert int(final.player_pos[0]) == scene.pos[0][0] + 5
        assert int(final.light[0]) == 55


class TestBruteForce:
    def test_matches_deferred_on_quirk_free_scene(self):
        # demo_world has no bin overflow in any column and no adjacent-bin
        # early exits that change winners, so brute == deferred G-buffer.
        scene = small_scene()
        ds = DeviceScene.from_scene(scene, SMALL)
        brute = BruteForceRenderer(SMALL, entity_chunk=4)
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        gb_b = jax.jit(brute.trace)(ds)
        be, cnt = jax.jit(r.build_bins)(ds)
        gb_d = jax.jit(r.trace)(ds, be, cnt)
        np.testing.assert_array_equal(np.asarray(gb_b.entity_index),
                                      np.asarray(gb_d.entity_index))
        np.testing.assert_array_equal(np.asarray(gb_b.color),
                                      np.asarray(gb_d.color))

    def test_unshadowed_render_runs(self):
        scene = small_scene()
        ds = DeviceScene.from_scene(scene, SMALL)
        brute = BruteForceRenderer(SMALL)
        frame = np.asarray(brute.render(ds, np.array([60, 60, 20])))
        assert frame.shape == (80, 80, 3)
        assert frame.max() > 31  # something is lit


class TestInverse:
    def test_loss_decreases_and_gradients_flow(self):
        scene = small_scene()
        r = DeferredRenderer(SMALL, shadow_max_steps=8)
        r.spans = r.spans_for(scene)
        fitter = InverseLightFitter(SMALL, r, learning_rate=3.0,
                                    with_shadows=False)
        ds = DeviceScene.from_scene(scene, SMALL)
        true_light = jnp.asarray([70.0, 60.0, 10.0], jnp.float32)
        target = fitter.soft_frame(ds, true_light)[None]
        light, history = fitter.fit(ds, target, np.array([20.0, 20.0, 40.0]),
                                    steps=25)
        assert history[-1] < history[0]
        g = jax.grad(fitter.loss)(jnp.asarray([20.0, 20.0, 40.0]), ds,
                                  target[0])
        assert np.isfinite(np.asarray(g)).all() and (np.asarray(g) != 0).any()
