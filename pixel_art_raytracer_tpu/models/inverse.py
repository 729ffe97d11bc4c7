"""Differentiable inverse rendering: fit light parameters to target frames.

The reference has no training of any kind; this model family exists because
the JAX re-design makes the shading path differentiable for free, giving the
framework a gradient-based workload (and the multi-chip dry run a real
data-parallel training step).  Visibility (primary trace + shadow march) is
integer/boolean and passes through ``stop_gradient``; gradients flow through
the Lambert shading with respect to a continuous light position.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..config import RenderConfig, DEFAULT_CONFIG
from ..ops.cstyle import c_div
from ..ops import shadow as shadow_ops
from .deferred import DeferredRenderer, DeviceScene


class InverseLightFitter:
    """Optimise a continuous light position so renders match target frames."""

    def __init__(self, config: RenderConfig = DEFAULT_CONFIG,
                 renderer: DeferredRenderer | None = None,
                 learning_rate: float = 2.0, with_shadows: bool = True):
        self.config = config
        self.renderer = renderer or DeferredRenderer(config)
        self.optimizer = optax.adam(learning_rate)
        self.with_shadows = with_shadows

    # -- differentiable forward -------------------------------------------

    def soft_frame(self, dscene: DeviceScene, light_f32: jax.Array) -> jax.Array:
        """Render an (H, W, 3) float32 frame in [0, 1], differentiable in
        ``light_f32`` through the shading (not through visibility)."""
        cfg = self.config
        r = self.renderer
        f32 = jnp.float32
        H, W = cfg.view_height, cfg.view_width

        bins_ent, counts = r.build_bins(dscene)
        gbuf = r.trace(dscene, bins_ent, counts)

        wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
        dx = light_f32[0] - wx.astype(f32)
        dy = light_f32[1] - gbuf.y.astype(f32)
        dz = light_f32[2] - gbuf.z.astype(f32)
        length = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) + f32(1e-6)
        tlx, tly, tlz = dx / length, dy / length, dz / length

        if self.with_shadows:
            light_i = jax.lax.stop_gradient(
                jnp.round(light_f32).astype(jnp.int32))
            bs = cfg.bin_size
            rbx = c_div(wx, bs)
            rby = c_div(jnp.int32(cfg.view_height) - gbuf.y - gbuf.z, bs)
            rbz = c_div(gbuf.z, bs)
            lbx = c_div(light_i[0], bs)
            lby = c_div(jnp.int32(cfg.view_height) - light_i[1] - light_i[2],
                        bs)
            lbz = c_div(light_i[2], bs)
            inv = tuple(jax.lax.stop_gradient(f32(1.0) / t)
                        for t in (tlx, tly, tlz))
            lit = shadow_ops.trace_light(
                dscene.pos, dscene.ext, bins_ent, counts, (rbx, rby, rbz),
                (lbx, lby, lbz), gbuf.entity_index,
                (wx.astype(f32), gbuf.y.astype(f32), gbuf.z.astype(f32)),
                inv, cfg, r.shadow_max_steps).astype(f32)
            lit = jax.lax.stop_gradient(lit)
        else:
            lit = f32(1.0)

        n = gbuf.normal
        dot = n[..., 0] * tlx + n[..., 1] * tly + n[..., 2] * tlz
        diffuse = jnp.maximum(0.0, dot)
        brightness = cfg.ambient + lit * jnp.minimum(
            1.0 - cfg.ambient, diffuse)
        base = gbuf.color[..., :3].astype(f32) / 255.0
        return base * brightness[..., None]

    # -- training ----------------------------------------------------------

    def loss(self, light_f32, dscene, target) -> jax.Array:
        """MSE against an (H, W, 3) float32 target frame in [0, 1]."""
        pred = self.soft_frame(dscene, light_f32)
        return jnp.mean((pred - target) ** 2)

    def batch_loss(self, light_f32, dscene, targets) -> jax.Array:
        """Mean loss over a batch of target frames (F, H, W, 3)."""
        losses = jax.vmap(lambda t: self.loss(light_f32, dscene, t))(targets)
        return jnp.mean(losses)

    def init(self, light0) -> tuple[jax.Array, optax.OptState]:
        light = jnp.asarray(light0, jnp.float32)
        return light, self.optimizer.init(light)

    def train_step_impl(self, light, opt_state, dscene, targets):
        """One optimisation step on a batch of targets; returns
        (light, opt_state, loss).  Un-jitted body, reused by the sharded
        multi-chip step in parallel/mesh.py."""
        loss, grads = jax.value_and_grad(self.batch_loss)(light, dscene,
                                                          targets)
        updates, opt_state = self.optimizer.update(grads, opt_state)
        light = optax.apply_updates(light, updates)
        return light, opt_state, loss

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, light, opt_state, dscene, targets):
        return self.train_step_impl(light, opt_state, dscene, targets)

    def fit(self, dscene, targets, light0, steps: int = 50):
        light, opt_state = self.init(light0)
        history = []
        for _ in range(steps):
            light, opt_state, loss = self.train_step(light, opt_state,
                                                     dscene, targets)
            history.append(float(loss))
        return light, history
