"""Static-bin cache must be bit-identical to the full rebuild."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixel_art_raytracer_tpu.config import RenderConfig, DEFAULT_CONFIG
from pixel_art_raytracer_tpu.scene import SceneBuilder, demo_world
from pixel_art_raytracer_tpu.ops import binning
from pixel_art_raytracer_tpu.ops.static_bins import StaticBins


def full_bins(pos, ext, config, spans):
    return jax.jit(lambda p, e: binning.build_bins(p, e, config, spans))(
        jnp.asarray(pos), jnp.asarray(ext))


def crowded_scene():
    """Many overlapping boxes in few bins so the wrap interacts with the
    dynamic insertion; player is entity 0."""
    b = SceneBuilder()
    b.insert((85, 40, 45), (20, 20, 20))          # player (dynamic)
    for k in range(12):
        b.insert((80 + (k % 3), 0, 40 + (k % 4)), (20, 20, 20))
    for k in range(5):
        b.insert((200, 10 * k, 100), (20, 20, 20))
    return b.build()


@pytest.mark.parametrize("scene_fn", [crowded_scene, lambda: demo_world(10)])
def test_merge_matches_full_rebuild(scene_fn):
    scene = scene_fn()
    cfg = DEFAULT_CONFIG
    spans = binning.entity_span_bound(scene.ext.max(axis=0), cfg)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, spans)
    merge = jax.jit(cache.merge)

    # Move the player around, incl. out of view and into crowded bins.
    for player in [(85, 40, 45), (80, 0, 40), (200, 25, 100),
                   (-500, 0, 0), (0, 0, 0), (455, 300, 310)]:
        pos = scene.pos.copy()
        pos[0] = player
        be_full, cnt_full = full_bins(pos, scene.ext, cfg, spans)
        be_inc, cnt_inc = merge(jnp.asarray(pos[:1]),
                                jnp.asarray(scene.ext[:1]))
        np.testing.assert_array_equal(np.asarray(be_inc), np.asarray(be_full),
                                      err_msg=f"player={player}")
        np.testing.assert_array_equal(np.asarray(cnt_inc),
                                      np.asarray(cnt_full))


def test_multiple_dynamics():
    scene = crowded_scene()
    cfg = DEFAULT_CONFIG
    spans = binning.entity_span_bound(scene.ext.max(axis=0), cfg)
    # Treat the first three entities as dynamic.
    cache = StaticBins(scene.pos, scene.ext, 3, cfg, spans)
    pos = scene.pos.copy()
    pos[0] = (82, 5, 41)
    pos[1] = (81, 2, 42)
    pos[2] = (300, 0, 200)
    be_full, cnt_full = full_bins(pos, scene.ext, cfg, spans)
    be_inc, cnt_inc = jax.jit(cache.merge)(jnp.asarray(pos[:3]),
                                           jnp.asarray(scene.ext[:3]))
    np.testing.assert_array_equal(np.asarray(be_inc), np.asarray(be_full))
    np.testing.assert_array_equal(np.asarray(cnt_inc), np.asarray(cnt_full))


def test_requires_dynamic_prefix():
    with pytest.raises(ValueError):
        StaticBins(np.zeros((4, 3), np.int32), np.ones((4, 3), np.int32), 0,
                   DEFAULT_CONFIG, (2, 3, 2))
