"""Deferred lighting: L1-Lambert + ambient, gated by the shadow march.

Transcribes the inline lighting loop in the reference's frame loop
(alternative.cpp:702-760): ambient-only by default, full Lambert + ambient
where the shadow ray reports the light reachable.  All float math stays in
float32 with the reference's ``std::min/std::max`` argument order; the final
u8 color scale truncates (sprites.hpp:8-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from .cstyle import c_min, c_max, c_div, exact_f32_div, exact_f32_recip
from .shadow import trace_light
from .trace import GBufferArrays


def shade(pos: jax.Array, ext: jax.Array, gbuf: GBufferArrays,
          bins_ent: jax.Array, counts: jax.Array, light: jax.Array,
          config: RenderConfig, max_steps: int = 16,
          shadow_impl: str = "scan", shadow_tables=None,
          style: str = "reference", palette_rgb=None,
          guard: str = "fallback", row0=0) -> jax.Array:
    """Light the G-buffer; returns the (H, W, 3) uint8 frame.

    ``light`` is an (3,) int32 array (x, y, z) — traced, so animated lights
    don't retrigger compilation.  ``shadow_impl`` selects the per-pixel DDA
    scan ('scan', the direct transcription), the table-driven candidate scan
    ('fast'), or the Pallas kernel ('pallas') — all pixel-identical.
    ``guard`` controls the silent-wrongness runtime guard (see
    :func:`lighting_factor`).
    """
    factor = lighting_factor(pos, ext, gbuf, bins_ent, counts, light, config,
                             max_steps, shadow_impl, shadow_tables, guard,
                             row0)
    if style == "dithered":
        from .dither import shade_dithered

        return shade_dithered(gbuf.color, factor, palette_rgb)
    rgb = gbuf.color[..., :3].astype(jnp.float32) * factor[..., None]
    return rgb.astype(jnp.uint8)


def light_geometry(gbuf: GBufferArrays, light: jax.Array,
                   config: RenderConfig, int_exact: bool = False):
    """Per-pixel shadow-ray geometry (alternative.cpp:707-732): L1-normalised
    towards-light direction, reciprocal direction, ray/light bin coords, and
    float origin.  Returns (tl, inv, origin, rb, lb) — each a 3-tuple of
    (h, W) arrays (lb entries are scalars broadcastable over pixels).

    Extracted from :func:`lighting_factor` so batched drivers can vmap it;
    the op sequence is exactly the reference's (parity-critical: the
    optimization barrier preserves the 1/(d/len) double rounding).

    ``int_exact``: compute the six correctly-rounded divisions with the
    integer-class primitives (ops/divkernel) instead of the float64
    emulation.  Value-identical within the primitives' domain — the
    per-pixel L1 light distance must stay below 2^13 (callers guard and
    reroute, see models/batched.py) — but pure f32/i32 vector ops, so
    XLA fuses the whole chain instead of materialising float64 pixel
    buffers (the round-4 HLO census put the f64 emulation's buffers
    among the program's largest HBM writers, ~12 MB/frame).  No
    optimization barrier needed: the long-division form has no 1/(d/len)
    algebra XLA could fold.
    """
    cfg = config
    # Lane count from the G-buffer itself: the batched pipeline keeps its
    # frames lane-padded (pad lanes are background pixels whose world x is
    # simply their lane index); single-frame callers pass view_width-wide
    # buffers and nothing changes.
    W = gbuf.y.shape[-1]
    f32 = jnp.float32
    bs = cfg.bin_size

    Hl = gbuf.y.shape[0]
    wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (Hl, W))
    wy = gbuf.y
    wz = gbuf.z

    lx, ly, lz = light[0], light[1], light[2]
    if int_exact:
        from .divkernel import rn_div_int, rn_recip

        # Integer light deltas are exact in both int32 and f32 (the f32
        # subtraction below rounds only beyond 2^24, far past the
        # guarded domain), so RN(d / length) over the ints equals the
        # reference's f32-operand division bit for bit.
        dxi = lx - wx
        dyi = ly - wy
        dzi = lz - wz
        ln = jnp.abs(dxi) + jnp.abs(dyi) + jnp.abs(dzi)
        tlx = rn_div_int(dxi, ln)
        tly = rn_div_int(dyi, ln)
        tlz = rn_div_int(dzi, ln)
        inv = (rn_recip(tlx), rn_recip(tly), rn_recip(tlz))
    else:
        dx = lx.astype(f32) - wx.astype(f32)
        dy = ly.astype(f32) - wy.astype(f32)
        dz = lz.astype(f32) - wz.astype(f32)
        # L1 normalisation (sprites.hpp:28-35, quirk Q2).
        length = jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz)
        # Correctly-rounded divisions (TPU's native f32 divide is ~1 ulp
        # off); the barrier stops XLA folding 1/(d/len) into len/d, which
        # would remove one rounding step the reference performs.
        tlx = exact_f32_div(dx, length)
        tly = exact_f32_div(dy, length)
        tlz = exact_f32_div(dz, length)
        tlx, tly, tlz = jax.lax.optimization_barrier((tlx, tly, tlz))
        inv = (exact_f32_recip(tlx), exact_f32_recip(tly),
               exact_f32_recip(tlz))

    # Bin coordinates (alternative.cpp:724-732), C-truncating division.
    rb = (c_div(wx, bs),
          c_div(jnp.int32(cfg.view_height) - wy - wz, bs),
          c_div(wz, bs))
    lb = (c_div(lx, bs),
          c_div(jnp.int32(cfg.view_height) - ly - lz, bs),
          c_div(lz, bs))

    origin = (wx.astype(f32), wy.astype(f32), wz.astype(f32))
    return (tlx, tly, tlz), inv, origin, rb, lb


def max_needed_steps(rb, lb) -> jax.Array:
    """max over rays of int(largest_bin_distance) — the per-ray DDA bound
    the reference computes (alternative.cpp:423-432)."""
    f32 = jnp.float32
    ddx = lb[0].astype(f32) - rb[0].astype(f32)
    ddy = lb[1].astype(f32) - rb[1].astype(f32)
    ddz = lb[2].astype(f32) - rb[2].astype(f32)
    largest = c_max(c_max(jnp.abs(ddx), jnp.abs(ddy)), jnp.abs(ddz))
    return jnp.max(largest.astype(jnp.int32))


def brightness_factor(normal, tl, lit, config: RenderConfig) -> jax.Array:
    """min(1, Lambert + ambient) where lit, ambient elsewhere
    (alternative.cpp:734-758)."""
    dot = (normal[..., 0] * tl[0] + normal[..., 1] * tl[1]
           + normal[..., 2] * tl[2])
    return factor_from_dot(dot, lit, config)


def factor_from_dot(dot, lit, config: RenderConfig) -> jax.Array:
    """``brightness_factor`` from a precomputed Lambert dot — callers that
    already computed the dot (e.g. for the shadow-needed mask) pass it
    directly so the normal buffer can fuse away instead of materialising
    for a recomputation.  Same float ops in the same order."""
    f32 = jnp.float32
    diffuse = c_max(f32(0.0), dot)                    # std::max<float>(0, ·)
    brightness = c_min(f32(1.0), diffuse + f32(config.ambient))
    return jnp.where(lit, brightness, f32(config.ambient))


def lighting_factor(pos, ext, gbuf, bins_ent, counts, light,
                    config: RenderConfig, max_steps: int = 16,
                    shadow_impl: str = "scan", shadow_tables=None,
                    guard: str = "fallback", row0=0) -> jax.Array:
    """Per-pixel brightness factor: ambient where the light is occluded,
    min(1, Lambert + ambient) where reachable.  The scalar core of the
    lighting loop (alternative.cpp:702-760).

    ``guard``: every production shadow path carries static bounds that a
    hostile frame can exceed — the DDA step bound ``max_steps`` (a far
    light needs more steps, alternative.cpp:423-432 computes the bound per
    ray), the fast paths' candidate capacity, and their start-bin z table
    range.  With ``guard="fallback"`` (default) the frame checks those
    bounds on device and a single ``lax.cond`` reroutes the whole frame to
    the exact dynamically-bounded march (shadow.trace_light_dynamic) when
    any is exceeded — occluders are never silently dropped.  ``"none"``
    skips the check (for callers that prove the bounds statically, or
    vmapped contexts where cond lowers to executing both branches).
    """
    cfg = config
    W = cfg.view_width

    # Row count comes from the G-buffer: row-sharded shards pass a window
    # of rows (absolute offset row0); world math uses only world-space
    # coordinates, so the window is transparent except to the shadow
    # kernel's per-block tables.
    tl, inv, origin, rb, lb = light_geometry(gbuf, light, cfg)
    (rbx, rby, rbz), (lbx, lby, lbz) = rb, lb
    wy, wz = gbuf.y, gbuf.z

    def dynamic_fallback():
        from .shadow import trace_light_dynamic

        return trace_light_dynamic(pos, ext, bins_ent, counts,
                                   (rbx, rby, rbz), (lbx, lby, lbz),
                                   gbuf.entity_index, origin, inv, cfg)

    if shadow_impl in ("fast", "pallas"):
        from . import shadow_fast

        tables = shadow_tables or shadow_fast.default_tables(
            cfg, max_steps=max_steps)
        member = shadow_fast.dda_membership((lbx, lby, lbz), cfg, tables)
        cands = shadow_fast.build_candidates(pos, ext, bins_ent, counts,
                                             member, cfg, tables)

        def fast_lit():
            if shadow_impl == "pallas":
                from . import shadow_pallas

                w_pad = -(-W // 128) * 128
                pad = w_pad - W

                def padw(a):
                    return jnp.pad(a, ((0, 0), (0, pad)))

                SZ = tables.sz_hi - tables.sz_lo
                szidx = jnp.clip(rbz - tables.sz_lo, 0, SZ - 1)
                # Background pixels (zero G-buffer y/z, quirk Q6) use the
                # aliased background start row; wy+wz == world_j >= 1 for
                # hits.
                bg = ((wy + wz) == 0).astype(jnp.int32)
                lit_pad = shadow_pallas.trace_light_pallas(
                    member, padw(szidx), padw(bg), padw(gbuf.entity_index),
                    padw(origin[1]), padw(origin[2]),
                    padw(inv[0]), padw(inv[1]), padw(inv[2]),
                    cands, cfg, tables, row0=row0)
                return lit_pad[:, :W] > 0
            bitmap = shadow_fast.pixel_bitmap(member, rbx, rby, rbz, cfg,
                                              tables)
            return shadow_fast.trace_light_fast(bitmap, gbuf.entity_index,
                                                origin, inv, cands, cfg)

        if guard == "fallback":
            # Static-bound validation on device: candidate capacity, DDA
            # step bound, and start-bin z table range.  Any violation
            # reroutes the frame to the exact dynamic march.
            sz_ok = jnp.all((rbz >= tables.sz_lo) & (rbz < tables.sz_hi))
            ok = (~cands.overflow & sz_ok
                  & (max_needed_steps(rb, lb) <= tables.max_steps))
            lit = jax.lax.cond(ok, fast_lit, dynamic_fallback)
        else:
            lit = fast_lit()
    else:
        if guard == "fallback":
            lit = jax.lax.cond(
                max_needed_steps(rb, lb) <= max_steps,
                lambda: trace_light(pos, ext, bins_ent, counts,
                                    (rbx, rby, rbz), (lbx, lby, lbz),
                                    gbuf.entity_index, origin, inv, cfg,
                                    max_steps),
                dynamic_fallback)
        else:
            lit = trace_light(pos, ext, bins_ent, counts, (rbx, rby, rbz),
                              (lbx, lby, lbz), gbuf.entity_index,
                              origin, inv, cfg, max_steps)

    return brightness_factor(gbuf.normal, tl, lit, cfg)


def shade_multi(pos: jax.Array, ext: jax.Array, gbuf: GBufferArrays,
               bins_ent: jax.Array, counts: jax.Array, lights: jax.Array,
               config: RenderConfig, max_steps: int = 16,
               shadow_impl: str = "fast", shadow_tables=None) -> jax.Array:
    """Additive multi-light shading (framework extension).

    The reference carries a light *vector* but shades with ``lights[0]`` only
    (alternative.cpp:624-626, 711-758).  This extension accumulates each
    light's (shadowed) diffuse contribution over a shared ambient base and
    saturates.  ``lights``: (L, 3) int32.
    """
    cfg = config
    f32 = jnp.float32

    def one(light):
        return lighting_factor(pos, ext, gbuf, bins_ent, counts, light, cfg,
                               max_steps, shadow_impl, shadow_tables)

    factors = jax.lax.map(one, lights)                 # (L, H, W)
    ambient = f32(cfg.ambient)
    diffuse = jnp.maximum(factors - ambient, 0.0).sum(axis=0)
    total = jnp.minimum(1.0, ambient + diffuse)
    rgb = gbuf.color[..., :3].astype(f32) * total[..., None]
    return rgb.astype(jnp.uint8)


def shade_directional(pos: jax.Array, ext: jax.Array, gbuf: GBufferArrays,
                      bins_ent: jax.Array, counts: jax.Array,
                      direction, config: RenderConfig,
                      max_steps: int | None = None, style: str = "reference",
                      palette_rgb=None, ambient: float | None = None
                      ) -> jax.Array:
    """Directional-light shading (framework extension; the reference has only
    the single point light).

    ``direction`` is the (3,) float32 direction *toward* the light.  Shadow
    rays march the same 7-phase bin DDA toward a virtual light far along the
    direction, so occlusion uses the identical traversal machinery.

    ``max_steps`` defaults to the grid-crossing bound: a ray starting in
    the grid leaves it after at most hash_width + hash_height+1 +
    hash_length thick-DDA steps, so no in-grid occluder can be missed for
    any direction (out-of-grid steps test nothing).
    """
    cfg = config
    if max_steps is None:
        max_steps = (cfg.hash_width + cfg.hash_height + 1
                     + cfg.hash_length)
    H, W = cfg.view_height, cfg.view_width
    f32 = jnp.float32
    bs = cfg.bin_size

    wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
    wy, wz = gbuf.y, gbuf.z

    d = jnp.asarray(direction, f32)
    length = jnp.abs(d[0]) + jnp.abs(d[1]) + jnp.abs(d[2])
    tlx = exact_f32_div(d[0], length)
    tly = exact_f32_div(d[1], length)
    tlz = exact_f32_div(d[2], length)
    tlx, tly, tlz = jax.lax.optimization_barrier((tlx, tly, tlz))
    inv = (exact_f32_recip(tlx), exact_f32_recip(tly),
           exact_f32_recip(tlz))

    rbx = c_div(wx, bs)
    rby = c_div(jnp.int32(cfg.view_height) - wy - wz, bs)
    rbz = c_div(wz, bs)

    # Virtual far light: far enough that every path exits the grid.
    span = max(cfg.view_width, cfg.view_height, cfg.view_length) * 2
    fx = wx + (tlx * span).astype(jnp.int32)
    fy = wy + (tly * span).astype(jnp.int32)
    fz = wz + (tlz * span).astype(jnp.int32)
    lbx = c_div(fx, bs)
    lby = c_div(jnp.int32(cfg.view_height) - fy - fz, bs)
    lbz = c_div(fz, bs)

    origin = (wx.astype(f32), wy.astype(f32), wz.astype(f32))
    lit = trace_light(pos, ext, bins_ent, counts, (rbx, rby, rbz),
                      (lbx, lby, lbz), gbuf.entity_index, origin, inv, cfg,
                      max_steps)

    n = gbuf.normal
    dot = n[..., 0] * tlx + n[..., 1] * tly + n[..., 2] * tlz
    amb = f32(cfg.ambient if ambient is None else ambient)
    brightness = c_min(f32(1.0), c_max(f32(0.0), dot) + amb)
    factor = jnp.where(lit, brightness, amb)

    if style == "dithered":
        from .dither import shade_dithered

        return shade_dithered(gbuf.color, factor, palette_rgb)
    rgb = gbuf.color[..., :3].astype(f32) * factor[..., None]
    return rgb.astype(jnp.uint8)
