"""NumPy oracle renderer — the parity anchor for the JAX/Pallas pipeline.

This is a direct transcription of the reference's observable semantics
(SURVEY.md §3.3/§3.4), vectorised over pixels but processing candidates in the
reference's exact sequential order.  Golden frames produced here gate the
device pipeline; an independently written C++ oracle (native/) cross-checks
this module in turn.

Semantics notes (each with the reference citation):
  * Binning: per-entity view cull, covered-bin range with the y-shear, scatter
    into (hash_volume, bin_capacity) slots with occupancy wrapping at the
    capacity via ``& (cap-1)`` — silently overwriting the oldest entries
    (alternative.cpp:195-269, quirk Q3).
  * Primary rays: fixed oblique slope <0,-1,1>; specialised interval test, NOT
    the slab test (alternative.cpp:310-317, quirk Q4); depth key with
    texel-depth offset, strictly-greater wins so ties keep the first writer
    (alternative.cpp:336-347); early exit after intersections in two bins with
    no intervening empty bin (alternative.cpp:293-300, 368-374, quirk Q5).
  * Shadow rays: 7-phase thick-line DDA over bins from the pixel's bin to the
    light's bin, C-style float/int conversions, slab intersection with
    ``std::min/std::max`` NaN asymmetry, self-intersection skip by entity id
    (alternative.cpp:399-500, 703-760).
  * Out-of-range *flat* bin indices during the shadow march are treated as
    empty.  The reference reads out of bounds there (UB); however, negative or
    overflowing bin *coordinates* whose flat index still lands in
    [0, hash_volume) alias into other bins deterministically — that aliasing
    IS reproduced (``index_into_view_hash`` folds coordinates at
    alternative.cpp:180-182 with no bounds check).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import RenderConfig, DEFAULT_CONFIG
from ..scene import Scene, Light

INT32_MIN = np.int32(np.iinfo(np.int32).min)


# ---------------------------------------------------------------------------
# C-semantics scalar helpers (oracle-local, loop-friendly).
# ---------------------------------------------------------------------------

def _ctrunc_div(a: int, b: int) -> int:
    """C integer division (truncation toward zero) on Python ints."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _c_min_f(a, b):
    """Vectorised ``std::min``: ``b < a ? b : a``."""
    return np.where(b < a, b, a)


def _c_max_f(a, b):
    """Vectorised ``std::max``: ``a < b ? b : a``."""
    return np.where(a < b, b, a)


# ---------------------------------------------------------------------------
# G-buffer container.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GBuffer:
    """Deferred-shading record per pixel (``Pixel``, sprites.hpp:53-58)."""

    normal: np.ndarray        # (H, W, 3) float32
    color: np.ndarray         # (H, W, 4) uint8 (RGBA; alpha unused)
    y: np.ndarray             # (H, W) int32 reconstructed world y
    z: np.ndarray             # (H, W) int32 reconstructed world z
    entity_index: np.ndarray  # (H, W) int32


# ---------------------------------------------------------------------------
# Acceleration structure: uniform spatial hash.
# ---------------------------------------------------------------------------

def build_bins(scene: Scene, config: RenderConfig = DEFAULT_CONFIG):
    """Rebuild the spatial hash (``count_entities_in_bins``, alternative.cpp:195-269).

    Returns (bins_ent, counts):
      bins_ent: (hash_volume, bin_capacity) int32 entity indices, -1 = empty
      counts:   (hash_volume,) int32 occupancy AFTER the wrap (``total & (cap-1)``)

    Plain Python loops — slow but transparently faithful.
    """
    cfg = config
    cap = cfg.bin_capacity
    bins_ent = np.full((cfg.hash_volume, cap), -1, np.int32)
    counts = np.zeros(cfg.hash_volume, np.int32)
    bs = cfg.bin_size
    vw, vh, vl = cfg.view_width, cfg.view_height, cfg.view_length

    pos = scene.pos
    ext = scene.ext
    for i in range(scene.n_entities):
        x0, y0, z0 = (int(v) for v in pos[i])
        ex, ey, ez = (int(v) for v in ext[i])
        x1, y1, z1 = x0 + ex, y0 + ey, z0 + ez

        # View cull (alternative.cpp:212-219).  Screen-y span depends on y+z.
        if (x1 < 0 or x0 >= vw
                or y1 < 0 - z1
                or y0 >= vh - z0 + bs
                or z1 < -ez - bs
                or z0 > vl + bs):
            continue

        # Covered bin ranges (alternative.cpp:222-240).  min_y uses the max
        # world y because screen y is flipped.
        min_xi = max(0, _ctrunc_div(x0, bs))
        min_yi = max(0, _ctrunc_div(vh - y1 - z1, bs))
        min_zi = max(0, _ctrunc_div(z0, bs))
        max_xi = min(cfg.hash_width, _ctrunc_div(x1 + bs - 1, bs))
        max_yi = min(cfg.hash_height, _ctrunc_div(vh - y0 - z0 + bs - 1, bs))
        max_zi = min(cfg.hash_length, _ctrunc_div(z1 + bs - 1, bs))

        for bx in range(min_xi, max_xi):
            for by in range(min_yi, max_yi):
                for bz in range(min_zi, max_zi):
                    flat = cfg.bin_flat_index(bx, by, bz)
                    slot = counts[flat]
                    bins_ent[flat, slot] = i
                    counts[flat] = (slot + 1) & (cap - 1)
    return bins_ent, counts


# ---------------------------------------------------------------------------
# Primary visibility.
# ---------------------------------------------------------------------------

def trace_pixels(scene: Scene, bins_ent: np.ndarray, counts: np.ndarray,
                 config: RenderConfig = DEFAULT_CONFIG) -> GBuffer:
    """Primary-visibility pass (``trace_hash_for_pixel``, alternative.cpp:271-397).

    Vectorised over pixels; the (bin_z, slot) candidate sequence runs in the
    reference order so the strictly-greater depth compare and the early-exit
    heuristic behave identically.
    """
    cfg = config
    H, W = cfg.view_height, cfg.view_width
    cap = cfg.bin_capacity
    atlas = scene.atlas
    sw = cfg.sprite_width

    i = np.arange(W, dtype=np.int32)[None, :]
    j = np.arange(H, dtype=np.int32)[:, None]
    world_j = (cfg.view_height - j).astype(np.int32)
    bin_x = i // cfg.bin_size
    bin_y = j // cfg.bin_size

    bg = np.asarray(cfg.background, np.uint8)
    out_color = np.broadcast_to(bg, (H, W, 4)).copy()
    out_normal = np.zeros((H, W, 3), np.float32)
    out_y = np.zeros((H, W), np.int32)
    out_z = np.zeros((H, W), np.int32)
    out_ent = np.zeros((H, W), np.int32)

    best_depth = np.full((H, W), INT32_MIN, np.int32)
    isect_bins = np.zeros((H, W), np.int32)
    broken = np.zeros((H, W), bool)

    palette = cfg.palette_array  # (P, 4) uint8

    pos, ext, sid_of = scene.pos, scene.ext, scene.sprite_id

    for bz in range(cfg.hash_length):
        flat = cfg.bin_flat_index(bin_x, bin_y, np.int32(bz))  # (H, W)
        cnt = counts[flat]
        active = ~broken
        # Empty bin resets the adjacent-intersected counter
        # (alternative.cpp:297-300).
        isect_bins[active & (cnt == 0)] = 0
        has_intersected = np.zeros((H, W), bool)

        for k in range(cap):
            ent = bins_ent[flat, k]
            valid = active & (k < cnt) & (ent >= 0)
            ent_s = np.where(valid, ent, 0)
            px, py, pz = (pos[ent_s, a] for a in range(3))
            ex, ey, ez = (ext[ent_s, a] for a in range(3))

            # Oblique interval test (alternative.cpp:310-317).
            hit = (valid
                   & (i >= px) & (i < px + ex)
                   & (world_j > py + pz)
                   & (world_j <= py + ey + pz + ez))

            row = py + ey + pz + ez - world_j          # sprite row
            col = i - px                                # sprite column
            row_c = np.clip(row, 0, atlas.sprite_height - 1)
            col_c = np.clip(col, 0, sw - 1)
            sid = sid_of[ent_s]
            sdep = atlas.depth[sid, row_c, col_c]

            # Depth key (alternative.cpp:336-341).
            depth = py - pz + np.minimum(0, ey - row) - sdep
            improve = hit & (depth > best_depth)

            best_depth = np.where(improve, depth, best_depth)
            cidx = atlas.color[sid, row_c, col_c]
            out_color = np.where(improve[..., None], palette[cidx], out_color)
            out_normal = np.where(improve[..., None],
                                  atlas.normal[sid, row_c, col_c], out_normal)
            out_y = np.where(improve, py + ey + ez - row - sdep, out_y)
            out_z = np.where(improve, pz + sdep, out_z)
            out_ent = np.where(improve, ent_s, out_ent)
            has_intersected |= improve

        isect_bins = isect_bins + (active & has_intersected)
        broken |= active & (isect_bins >= 2) if cfg.early_exit else False

    return GBuffer(normal=out_normal, color=out_color, y=out_y, z=out_z,
                   entity_index=out_ent)


# ---------------------------------------------------------------------------
# Shadow rays + deferred lighting.
# ---------------------------------------------------------------------------

def shade(scene: Scene, gbuf: GBuffer, bins_ent: np.ndarray,
          counts: np.ndarray, light: Light,
          config: RenderConfig = DEFAULT_CONFIG) -> np.ndarray:
    """Deferred lighting pass (alternative.cpp:702-760): ambient default, then
    Lambert + ambient where the shadow march reports the light unobstructed.

    Returns the lit frame as (H, W, 3) uint8 RGB.
    """
    cfg = config
    H, W = cfg.view_height, cfg.view_width
    bs = cfg.bin_size

    wx = np.broadcast_to(np.arange(W, dtype=np.int32)[None, :], (H, W))
    wy = gbuf.y
    wz = gbuf.z

    with np.errstate(divide="ignore", invalid="ignore"):
        dx = np.float32(light.x) - wx.astype(np.float32)
        dy = np.float32(light.y) - wy.astype(np.float32)
        dz = np.float32(light.z) - wz.astype(np.float32)
        # L1 normalisation (sprites.hpp:28-35, quirk Q2).
        length = np.abs(dx) + np.abs(dy) + np.abs(dz)
        tlx, tly, tlz = dx / length, dy / length, dz / length
        inv = (np.float32(1.0) / tlx, np.float32(1.0) / tly,
               np.float32(1.0) / tlz)

    # Bin coordinates of ray origin and light (alternative.cpp:724-732).
    # C-trunc division: (vh - y - z) can be negative.
    def ctrunc_div_arr(a, b):
        q = np.abs(a) // b
        return np.where((a < 0), -q, q).astype(np.int32)

    rbx = wx // bs
    rby = ctrunc_div_arr(cfg.view_height - wy - wz, bs)
    rbz = ctrunc_div_arr(wz, bs)
    lbx = _ctrunc_div(light.x, bs)
    lby = _ctrunc_div(cfg.view_height - light.y - light.z, bs)
    lbz = _ctrunc_div(light.z, bs)

    lit = _trace_light(scene, bins_ent, counts, rbx, rby, rbz,
                       lbx, lby, lbz, gbuf.entity_index,
                       (wx, wy, wz), inv, config)

    normal = gbuf.normal
    with np.errstate(invalid="ignore"):
        dot = (normal[..., 0] * tlx + normal[..., 1] * tly
               + normal[..., 2] * tlz)
    ambient = np.float32(cfg.ambient)
    diffuse = _c_max_f(np.float32(0.0), dot)          # std::max<float>(0, dot)
    brightness = _c_min_f(np.float32(1.0), diffuse + ambient)
    factor = np.where(lit, brightness, ambient)

    rgb = gbuf.color[..., :3].astype(np.float32) * factor[..., None]
    return rgb.astype(np.uint8)


def _trace_light(scene: Scene, bins_ent, counts, rbx, rby, rbz,
                 lbx, lby, lbz, start_ent, origin, inv,
                 config: RenderConfig) -> np.ndarray:
    """Vectorised shadow march (``trace_hash_for_light``, alternative.cpp:399-500).

    Returns a (H, W) bool map: True = light reachable (not occluded).
    """
    cfg = config
    cap = cfg.bin_capacity
    V = cfg.hash_volume
    H, W = rbx.shape

    sx = rbx.astype(np.float32)
    sy = rby.astype(np.float32)
    sz = rbz.astype(np.float32)
    dx = np.float32(lbx) - sx
    dy = np.float32(lby) - sy
    dz = np.float32(lbz) - sz

    largest = _c_max_f(_c_max_f(np.abs(dx), np.abs(dy)), np.abs(dz))
    with np.errstate(divide="ignore", invalid="ignore"):
        stx, sty, stz = dx / largest, dy / largest, dz / largest
    n_steps = largest.astype(np.int32)      # int(largest), trunc
    max_steps = int(n_steps.max()) if n_steps.size else 0

    start_flat = cfg.bin_flat_index(rbx, rby, rbz)

    tx = sx.copy()
    ty = sy.copy()
    tz = sz.copy()
    occluded = np.zeros((H, W), bool)

    # Origins as float32: the reference subtracts int16s in int arithmetic and
    # casts the (small, f32-exact) difference to float — identical values.
    ox = origin[0].astype(np.float32)
    oy = origin[1].astype(np.float32)
    oz = origin[2].astype(np.float32)
    invx, invy, invz = inv

    pos, ext = scene.pos, scene.ext

    # The 7-phase neighbour pattern (alternative.cpp:432-466): phases 0-5 test
    # axis/diagonal combos off the current anchor; phase 6 advances the anchor.
    PHASE_AXES = [(1, 0, 0), (0, 1, 0), (0, 0, 1),
                  (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]

    for t in range(7 * max_steps):
        phase = t % 7
        ax, ay, az = PHASE_AXES[phase]
        active = (t < 7 * n_steps) & ~occluded
        with np.errstate(invalid="ignore"):
            cx = tx + (stx if ax else 0.0)
            cy = ty + (sty if ay else 0.0)
            cz = tz + (stz if az else 0.0)
        if phase == 6:
            tx, ty, tz = cx.copy(), cy.copy(), cz.copy()

        with np.errstate(invalid="ignore"):
            bx = cx.astype(np.int32)
            by = cy.astype(np.int32)
            bz = cz.astype(np.int32)
        flat = cfg.bin_flat_index(bx, by, bz)
        # Reference reads whatever memory the flat index points at; indices
        # outside the allocation are UB there and masked empty here.
        in_range = (flat >= 0) & (flat < V)
        flat_c = np.where(in_range, flat, 0)
        test = active & in_range & (flat != start_flat)

        cnt = counts[flat_c]
        for k in range(cap):
            ent = bins_ent[flat_c, k]
            consider = test & (k < cnt) & (ent >= 0) & (ent != start_ent)
            ent_s = np.where(ent >= 0, ent, 0)
            px, py, pz = (pos[ent_s, a].astype(np.float32) for a in range(3))
            ex, ey, ez = (ext[ent_s, a].astype(np.float32) for a in range(3))

            with np.errstate(invalid="ignore"):
                # Slab test with the reference's exact min/max chain
                # (alternative.cpp:40-83).
                x1 = (px - ox) * invx
                x2 = (px + ex - ox) * invx
                tmin = _c_min_f(x1, x2)
                tmax = _c_max_f(x1, x2)
                y1 = (py - oy) * invy
                y2 = (py + ey - oy) * invy
                tmin = _c_max_f(tmin, _c_min_f(y1, y2))
                tmax = _c_min_f(tmax, _c_max_f(y1, y2))
                z1 = (pz - oz) * invz
                z2 = (pz + ez - oz) * invz
                tmin = _c_max_f(tmin, _c_min_f(z1, z2))
                tmax = _c_min_f(tmax, _c_max_f(z1, z2))
                hit = tmax >= tmin
            occluded |= consider & hit

    return ~occluded


# ---------------------------------------------------------------------------
# Overlay + full frame.
# ---------------------------------------------------------------------------

def draw_line(image: np.ndarray, x0: int, y0: int, x1: int, y1: int,
              color) -> None:
    """Bresenham line with bounds-checked plotting (alternative.cpp:139-175,
    callback at 762-772).  Mutates ``image`` (H, W, C) in place."""
    H, W = image.shape[:2]
    x_delta = abs(x1 - x0)
    y_delta = -abs(y1 - y0)
    x, y = x0, y0
    x_sign = 1 if x < x1 else -1
    y_sign = 1 if y < y1 else -1
    error = x_delta + y_delta
    while True:
        if 0 <= x < W and 0 <= y < H:
            image[y, x] = color
        if x == x1 and y == y1:
            return
        error2 = 2 * error
        if error2 >= y_delta:
            if x == x1:
                return
            error += y_delta
            x += x_sign
        if error2 <= x_delta:
            if y == y1:
                return
            error += x_delta
            y += y_sign


def render_frame(scene: Scene, light: Light,
                 config: RenderConfig = DEFAULT_CONFIG,
                 mouse: tuple[int, int] | None = None,
                 bins=None):
    """Full per-frame pipeline: rebin -> trace -> shade [-> debug overlay].

    Returns (image_rgb_u8, gbuffer).  When ``mouse`` is given, the red
    cursor-to-light debug line is drawn (alternative.cpp:762-772).
    ``bins`` may carry a prebuilt (bins_ent, counts) pair.
    """
    if bins is None:
        bins = build_bins(scene, config)
    bins_ent, counts = bins
    gbuf = trace_pixels(scene, bins_ent, counts, config)
    image = shade(scene, gbuf, bins_ent, counts, light, config)
    if mouse is not None:
        mx, my = mouse
        mx_c = min(max(mx, 0), config.view_width - 1)
        my_c = min(max(my, 0), config.view_height - 1)
        mp_y = int(gbuf.y[my_c, mx_c])
        mp_z = int(gbuf.z[my_c, mx_c])
        draw_line(image, mx,
                  config.view_height - (mp_y + mp_z),
                  light.x, config.view_height - (light.y + light.z),
                  (255, 0, 0))
    return image, gbuf
