"""Runtime guards against silent wrongness in the shadow fast paths.

The fast shadow implementations carry static bounds — DDA step count
(``ShadowTables.max_steps``), candidate capacity (``max_candidates``), and
the start-bin z table range — that a far light or dense scene can exceed.
The reference computes the step bound dynamically per ray
(alternative.cpp:423-432) and tests every occupied bin (:476-492), so
exceeding a static bound silently diverges.  With
``shadow_guard="fallback"`` (the default) the frame revalidates the bounds
on device and reroutes to the exact dynamically-bounded march.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import demo_world, Light
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.ops import shadow_fast

FAR_LIGHT = Light(2000, 900, 80)      # ~38 bins away: needs > 16 DDA steps


def wall_scene():
    """Floor strip plus a wall 8 bins toward a far +x light: shadow rays
    must march > 4 DDA steps before reaching the occluder, so truncated
    tables visibly miss it."""
    from pixel_art_raytracer_tpu.scene import SceneBuilder

    b = SceneBuilder(config=DEFAULT_CONFIG)
    b.insert((240, 36, 80), (20, 20, 20))            # player (unused)
    for i in range(0, 360, 20):                      # floor strip, bin x 0-8
        for z in (200, 220):
            b.insert((i, 0, z), (20, 20, 20))
    for y in (0, 20):                                # wall at bin x 9
        for z in (200, 220):
            b.insert((360, y, z), (20, 20, 20))
    return b.build()


WALL_LIGHT = Light(2000, 30, 210)                    # far along +x


def setup(scene, **kw):
    r = DeferredRenderer(DEFAULT_CONFIG, **kw)
    r.spans = r.spans_for(scene)
    ds = DeviceScene.from_scene(scene)
    be, cnt = jax.jit(r.build_bins)(ds)
    return r, ds, be, cnt


def anchor_frame(scene, ds, be, cnt, gbuf, light):
    """Exact reference semantics: scan shadow with an ample static bound."""
    r = DeferredRenderer(DEFAULT_CONFIG, shadow_impl="scan",
                         shadow_max_steps=64, shadow_guard="none")
    r.spans = r.spans_for(scene)
    return np.asarray(jax.jit(r.shade)(ds, gbuf, be, cnt,
                                       jnp.asarray(light.as_array())))


class TestFarLightGuard:
    def test_fast_guard_matches_exact(self):
        scene = demo_world(10)
        r, ds, be, cnt = setup(scene, shadow_impl="fast")   # max_steps=16
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        want = anchor_frame(scene, ds, be, cnt, gbuf, FAR_LIGHT)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(FAR_LIGHT.as_array())))
        np.testing.assert_array_equal(got, want)

    def test_unguarded_fast_truncates(self):
        """The guard matters: without it the distant occluder is missed."""
        scene = wall_scene()
        tables = shadow_fast.default_tables(DEFAULT_CONFIG, max_steps=4)
        r, ds, be, cnt = setup(scene, shadow_impl="fast",
                               shadow_tables=tables, shadow_guard="none")
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        want = anchor_frame(scene, ds, be, cnt, gbuf, WALL_LIGHT)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(WALL_LIGHT.as_array())))
        assert (got != want).any(), \
            "truncated tables should diverge for a far light"

    def test_guarded_fast_catches_distant_occluder(self):
        """Same scenario with the guard on: pixel-exact."""
        scene = wall_scene()
        tables = shadow_fast.default_tables(DEFAULT_CONFIG, max_steps=4)
        r, ds, be, cnt = setup(scene, shadow_impl="fast",
                               shadow_tables=tables)
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        want = anchor_frame(scene, ds, be, cnt, gbuf, WALL_LIGHT)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(WALL_LIGHT.as_array())))
        np.testing.assert_array_equal(got, want)

    def test_scan_guard_matches_exact(self):
        scene = demo_world(10)
        r, ds, be, cnt = setup(scene, shadow_impl="scan",
                               shadow_max_steps=4)
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        want = anchor_frame(scene, ds, be, cnt, gbuf, FAR_LIGHT)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(FAR_LIGHT.as_array())))
        np.testing.assert_array_equal(got, want)

    def test_pallas_guard_matches_exact(self):
        scene = demo_world(10)
        tables = shadow_fast.default_tables(DEFAULT_CONFIG, max_steps=4)
        r, ds, be, cnt = setup(scene, shadow_impl="pallas",
                               shadow_tables=tables)
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        want = anchor_frame(scene, ds, be, cnt, gbuf, FAR_LIGHT)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(FAR_LIGHT.as_array())))
        np.testing.assert_array_equal(got, want)


class TestOverflowGuard:
    def test_candidate_overflow_falls_back(self):
        """Deliberately tiny candidate capacity: overflow must not drop
        occluders (shadow_fast.py's documented failure mode)."""
        scene = demo_world(10)
        light = Light(480, 160, 80)
        tables = shadow_fast.default_tables(DEFAULT_CONFIG,
                                            max_candidates=8)
        r, ds, be, cnt = setup(scene, shadow_impl="fast",
                               shadow_tables=tables)
        gbuf = jax.jit(r.trace)(ds, be, cnt)

        # Confirm the scenario actually overflows.
        from pixel_art_raytracer_tpu.ops.cstyle import c_div

        bs = DEFAULT_CONFIG.bin_size
        lb = (c_div(jnp.int32(light.x), bs),
              c_div(jnp.int32(DEFAULT_CONFIG.view_height - light.y - light.z),
                    bs),
              c_div(jnp.int32(light.z), bs))
        member = shadow_fast.dda_membership(lb, DEFAULT_CONFIG, tables)
        cands = shadow_fast.build_candidates(ds.pos, ds.ext, be, cnt,
                                             member, DEFAULT_CONFIG, tables)
        assert bool(cands.overflow)

        want = anchor_frame(scene, ds, be, cnt, gbuf, light)
        got = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(light.as_array())))
        np.testing.assert_array_equal(got, want)


class TestDynamicMarch:
    def test_matches_static_scan_when_in_bound(self):
        from pixel_art_raytracer_tpu.ops import shade as shade_ops

        scene = demo_world(10)
        light = Light(250, 50, 150)
        r, ds, be, cnt = setup(scene, shadow_impl="scan",
                               shadow_max_steps=16, shadow_guard="none")
        gbuf = jax.jit(r.trace)(ds, be, cnt)
        f_static = np.asarray(jax.jit(r.shade)(
            ds, gbuf, be, cnt, jnp.asarray(light.as_array())))
        r2, *_ = setup(scene, shadow_impl="scan", shadow_max_steps=0)
        # max_steps=0 with guard: every frame falls back to the dynamic
        # march, which must still be exact.
        f_dyn = np.asarray(jax.jit(r2.shade)(
            ds, gbuf, be, cnt, jnp.asarray(light.as_array())))
        np.testing.assert_array_equal(f_dyn, f_static)
