"""Ordered-dither palette shading (BASELINE config 4 extension).

The reference multiplies palette colors by a continuous brightness factor
(alternative.cpp:757-758), leaving the pixel-art palette — this extension
instead re-quantises the lit result back onto the palette with a Bayer
threshold matrix, the classic pixel-art look.  Pure elementwise jnp; fuses
into the shading epilogue.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def bayer_matrix(n: int = 4) -> np.ndarray:
    """Standard 2^k x 2^k Bayer matrix with thresholds in [0, 1)."""
    assert n & (n - 1) == 0 and n > 0
    m = np.zeros((1, 1), np.int32)
    size = 1
    while size < n:
        m = np.block([[4 * m + 0, 4 * m + 2],
                      [4 * m + 3, 4 * m + 1]])
        size *= 2
    return (m.astype(np.float32) + 0.5) / (size * size)


def dither_to_palette(target: jax.Array, palette_luma: jax.Array,
                      n: int = 4) -> jax.Array:
    """Quantise per-pixel target luminance onto palette indices with ordered
    dithering.

    Args:
      target: (H, W) float32 lit luminance in [0, 1] (base luma x factor).
      palette_luma: (P,) float32 palette luminance in [0, 1], ascending.
      n: Bayer matrix size (power of two).

    Returns (H, W) int32 dithered palette indices: the target luminance
    lands between two palette entries; the Bayer threshold picks which.
    """
    H, W = target.shape
    P = palette_luma.shape[0]
    bayer = jnp.asarray(bayer_matrix(n))
    tile = jnp.tile(bayer, (-(-H // n), -(-W // n)))[:H, :W]

    # Find the highest palette entry <= target (lower neighbour).
    below = (palette_luma[None, None, :] <= target[..., None]).sum(-1) - 1
    lo = jnp.clip(below, 0, P - 1)
    hi = jnp.clip(lo + 1, 0, P - 1)
    luma_lo = palette_luma[lo]
    luma_hi = palette_luma[hi]
    span = jnp.where(luma_hi > luma_lo, luma_hi - luma_lo, 1.0)
    frac = jnp.clip((target - luma_lo) / span, 0.0, 1.0)
    return jnp.where(frac > tile, hi, lo)


def shade_dithered(gbuf_color, brightness, palette_rgb, n: int = 4):
    """Full dithered shading: lit pixels re-quantised onto the palette.

    Args:
      gbuf_color: (H, W, >=3) uint8 base colors from the G-buffer.
      brightness: (H, W) float32 lighting factor in [0, 1].
      palette_rgb: (P, 3) uint8 palette sorted by luminance.

    Returns (H, W, 3) uint8 frames built exclusively of palette colors.
    """
    weights = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    pal_luma = (palette_rgb.astype(jnp.float32) @ weights) / 255.0
    base_luma = (gbuf_color[..., :3].astype(jnp.float32) @ weights) / 255.0
    idx = dither_to_palette(base_luma * brightness, pal_luma, n)
    return palette_rgb[idx]
