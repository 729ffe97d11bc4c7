"""Device-side 2D overlays: Bresenham line rasterisation.

The reference draws a red debug line from the hovered pixel to the light
with a callback-based Bresenham (``draw_line``, alternative.cpp:139-175,
bounds-checked at the call site 762-772).  The host-side equivalent lives in
oracle/cpu_renderer.draw_line (used by the Session); this module provides a
jit-friendly device version so overlays can stay inside a batched render.

The rasteriser runs as a bounded ``fori_loop`` writing into the frame with
bounds-masked scatters — identical pixel sets to the serial algorithm (same
error-accumulator updates and the same double-step behaviour when both
conditions fire).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw_line(image: jax.Array, x0, y0, x1, y1, color) -> jax.Array:
    """Draw a line segment onto an (H, W, C) image; returns the new image.

    Endpoints are traced scalars (int32).  Out-of-bounds pixels are dropped,
    matching the reference call site's bounds check.  The iteration bound is
    the 8-connected worst case |dx| + |dy| + 1.
    """
    H, W, _ = image.shape
    x0 = jnp.asarray(x0, jnp.int32)
    y0 = jnp.asarray(y0, jnp.int32)
    x1 = jnp.asarray(x1, jnp.int32)
    y1 = jnp.asarray(y1, jnp.int32)
    color = jnp.asarray(color, image.dtype)

    x_delta = jnp.abs(x1 - x0)
    y_delta = -jnp.abs(y1 - y0)
    x_sign = jnp.where(x0 < x1, 1, -1).astype(jnp.int32)
    y_sign = jnp.where(y0 < y1, 1, -1).astype(jnp.int32)
    max_steps = int(image.shape[0] + image.shape[1] + 1)

    def body(_, state):
        img, x, y, err, done = state
        ok = ~done & (x >= 0) & (x < W) & (y >= 0) & (y < H)
        img = jnp.where(ok, img.at[y, x].set(color), img)
        at_end = (x == x1) & (y == y1)
        done = done | at_end

        e2 = 2 * err
        step_x = (e2 >= y_delta) & ~done
        # Serial returns when x hits x1 while stepping x; emulate by marking
        # done (no further writes) — subsequent state is then irrelevant.
        done = done | (step_x & (x == x1))
        err = jnp.where(step_x, err + y_delta, err)
        x = jnp.where(step_x & ~done, x + x_sign, x)

        step_y = (e2 <= x_delta) & ~done
        done = done | (step_y & (y == y1))
        err = jnp.where(step_y, err + x_delta, err)
        y = jnp.where(step_y & ~done, y + y_sign, y)
        return img, x, y, err, done

    state = (image, x0, y0, x_delta + y_delta, jnp.asarray(False))
    img, *_ = jax.lax.fori_loop(0, max_steps, body, state)
    return img
