// par_native: host-side native library for pixel_art_raytracer_tpu.
//
// Two roles:
//   1. An independently written CPU oracle renderer (flat C arrays, C ABI)
//      used to cross-check the NumPy oracle and the JAX pipeline.  It
//      implements the observable semantics documented in SURVEY.md §3
//      (reference: src/alternative.cpp) without sharing code or structure
//      with the reference implementation.
//   2. Fast host utilities for the framework runtime: an animated-GIF (LZW)
//      encoder for frame writeback.
//
// Numeric conventions (all required for pixel parity, see SURVEY.md §7):
//   - integer division truncates toward zero (C semantics),
//   - float comparisons in the slab test follow the std::min/std::max
//     argument order exactly (NaN asymmetry is observable),
//   - float -> int conversion truncates toward zero,
//   - u8 color scaling truncates the float product.
//
// Build with -ffp-contract=off so no FMA contraction perturbs f32 results.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>

extern "C" {

// ---------------------------------------------------------------------------
// Shared grid helpers.
// ---------------------------------------------------------------------------

typedef struct ParConfig {
  int32_t view_w;      // 480
  int32_t view_h;      // 320
  int32_t view_l;      // 320
  int32_t bin_size;    // 40
  int32_t bin_cap;     // 8 (power of two)
  int32_t sprite_w;    // 20
  int32_t sprite_h;    // 40
  float ambient;       // 0.25
  int32_t early_exit;  // bool
} ParConfig;

// Grid dims round up so non-multiple view sizes still cover every pixel
// (the reference's constants divide exactly; identical there).
static inline int32_t hash_w(const ParConfig* c) {
  return (c->view_w + c->bin_size - 1) / c->bin_size;
}
static inline int32_t hash_h(const ParConfig* c) {
  return (c->view_h + c->bin_size - 1) / c->bin_size;
}
static inline int32_t hash_l(const ParConfig* c) {
  return (c->view_l + c->bin_size - 1) / c->bin_size;
}
static inline int32_t hash_vol(const ParConfig* c) {
  return hash_w(c) * hash_h(c) * hash_l(c);
}

// Row-major (x-major, then y, then z) flat bin index; no bounds check, like
// the reference's index_into_view_hash (alternative.cpp:180-182).
static inline int32_t flat_bin(const ParConfig* c, int32_t x, int32_t y,
                               int32_t z) {
  return (x * hash_h(c) + y) * hash_l(c) + z;
}

// C truncating division for possibly-negative numerators.
static inline int32_t tdiv(int32_t a, int32_t b) { return a / b; }

// ---------------------------------------------------------------------------
// Spatial hash rebuild (semantics of alternative.cpp:195-269).
//
// bins_ent: [hash_vol * bin_cap] entity slots (-1 empty), counts: [hash_vol].
// Occupancy wraps with & (cap-1): the count visible to tracers is
// total_inserted mod cap, and later insertions overwrite older slots.
// ---------------------------------------------------------------------------

void par_build_bins(const ParConfig* cfg, int32_t n_entities,
                    const int32_t* pos /* [n,3] */,
                    const int32_t* ext /* [n,3] */,
                    int32_t* bins_ent /* [vol*cap] */,
                    int32_t* counts /* [vol] */) {
  const int32_t vol = hash_vol(cfg);
  const int32_t cap = cfg->bin_cap;
  const int32_t bs = cfg->bin_size;
  for (int32_t b = 0; b < vol * cap; b++) bins_ent[b] = -1;
  for (int32_t b = 0; b < vol; b++) counts[b] = 0;

  for (int32_t e = 0; e < n_entities; e++) {
    const int32_t x0 = pos[e * 3 + 0], y0 = pos[e * 3 + 1], z0 = pos[e * 3 + 2];
    const int32_t ex = ext[e * 3 + 0], ey = ext[e * 3 + 1], ez = ext[e * 3 + 2];
    const int32_t x1 = x0 + ex, y1 = y0 + ey, z1 = z0 + ez;

    // Frustum cull; the screen-y window shears with z (alternative.cpp:212-219).
    if (x1 < 0 || x0 >= cfg->view_w) continue;
    if (y1 < 0 - z1) continue;
    if (y0 >= cfg->view_h - z0 + bs) continue;
    if (z1 < -ez - bs) continue;
    if (z0 > cfg->view_l + bs) continue;

    // Covered bin ranges; min-y flips because screen y points down
    // (alternative.cpp:222-240).
    int32_t bx0 = tdiv(x0, bs);
    if (bx0 < 0) bx0 = 0;
    int32_t by0 = tdiv(cfg->view_h - y1 - z1, bs);
    if (by0 < 0) by0 = 0;
    int32_t bz0 = tdiv(z0, bs);
    if (bz0 < 0) bz0 = 0;
    int32_t bx1 = tdiv(x1 + bs - 1, bs);
    if (bx1 > hash_w(cfg)) bx1 = hash_w(cfg);
    int32_t by1 = tdiv(cfg->view_h - y0 - z0 + bs - 1, bs);
    if (by1 > hash_h(cfg)) by1 = hash_h(cfg);
    int32_t bz1 = tdiv(z1 + bs - 1, bs);
    if (bz1 > hash_l(cfg)) bz1 = hash_l(cfg);

    for (int32_t bx = bx0; bx < bx1; bx++)
      for (int32_t by = by0; by < by1; by++)
        for (int32_t bz = bz0; bz < bz1; bz++) {
          const int32_t f = flat_bin(cfg, bx, by, bz);
          const int32_t slot = counts[f];
          bins_ent[f * cap + slot] = e;
          counts[f] = (slot + 1) & (cap - 1);
        }
  }
}

// ---------------------------------------------------------------------------
// Primary visibility (semantics of alternative.cpp:271-397).
//
// Outputs a SoA G-buffer.  palette: [n_pal*4] RGBA u8.  Atlas arrays are
// indexed [sprite][row][col].
// ---------------------------------------------------------------------------

void par_trace_pixels(const ParConfig* cfg, int32_t n_entities,
                      const int32_t* pos, const int32_t* ext,
                      const int32_t* sprite_id,
                      const int32_t* atlas_color, const int32_t* atlas_depth,
                      const float* atlas_normal, const uint8_t* palette,
                      const int32_t* bins_ent, const int32_t* counts,
                      const uint8_t bg[4],
                      /* outputs, all [H*W...] row-major from screen top */
                      float* out_normal /* [H*W*3] */,
                      uint8_t* out_color /* [H*W*4] */,
                      int32_t* out_y, int32_t* out_z, int32_t* out_ent) {
  (void)n_entities;
  const int32_t W = cfg->view_w, H = cfg->view_h;
  const int32_t cap = cfg->bin_cap, bs = cfg->bin_size;
  const int32_t sprite_texels = cfg->sprite_w * cfg->sprite_h;

  for (int32_t px_x = 0; px_x < W; px_x++) {
    const int32_t bx = px_x / bs;
    for (int32_t px_y = 0; px_y < H; px_y++) {
      const int32_t wj = H - px_y;  // world-space y of this ray's screen row
      const int32_t by = px_y / bs;

      int32_t best = std::numeric_limits<int32_t>::min();
      int32_t hit_bins = 0;
      // G-buffer defaults: background color, zero everything else
      // (alternative.cpp:281; quirk Q6).
      float n_out[3] = {0.f, 0.f, 0.f};
      uint8_t c_out[4] = {bg[0], bg[1], bg[2], bg[3]};
      int32_t y_out = 0, z_out = 0, e_out = 0;

      for (int32_t bz = 0; bz < hash_l(cfg); bz++) {
        const int32_t f = flat_bin(cfg, bx, by, bz);
        const int32_t cnt = counts[f];
        if (cnt == 0) hit_bins = 0;  // reset on empty bin (alternative.cpp:297-300)
        bool bin_hit = false;

        for (int32_t s = 0; s < cnt; s++) {
          const int32_t e = bins_ent[f * cap + s];
          const int32_t ax = pos[e * 3], ay = pos[e * 3 + 1], az = pos[e * 3 + 2];
          const int32_t gx = ext[e * 3], gy = ext[e * 3 + 1], gz = ext[e * 3 + 2];

          // Oblique interval test for slope <0,-1,1> (alternative.cpp:310-317).
          if (px_x < ax || px_x >= ax + gx) continue;
          if (wj <= ay + az || wj > ay + gy + az + gz) continue;

          const int32_t row = ay + gy + az + gz - wj;
          const int32_t col = px_x - ax;
          const int32_t texel =
              sprite_id[e] * sprite_texels + row * cfg->sprite_w + col;
          const int32_t sdep = atlas_depth[texel];
          const int32_t over = gy - row;  // position along the box's y axis
          const int32_t depth = ay - az + (over < 0 ? over : 0) - sdep;

          // Strictly-greater keeps the first writer on ties
          // (alternative.cpp:344-346).
          if (depth <= best) continue;
          best = depth;
          const int32_t pal = atlas_color[texel];
          c_out[0] = palette[pal * 4 + 0];
          c_out[1] = palette[pal * 4 + 1];
          c_out[2] = palette[pal * 4 + 2];
          c_out[3] = palette[pal * 4 + 3];
          n_out[0] = atlas_normal[texel * 3 + 0];
          n_out[1] = atlas_normal[texel * 3 + 1];
          n_out[2] = atlas_normal[texel * 3 + 2];
          y_out = ay + gy + gz - row - sdep;
          z_out = az + sdep;
          e_out = e;
          bin_hit = true;
        }

        hit_bins += bin_hit ? 1 : 0;
        // Early exit after hits in two bins without an intervening empty one
        // (alternative.cpp:368-374; quirk Q5).
        if (cfg->early_exit && hit_bins >= 2) break;
      }

      const int32_t p = px_y * W + px_x;
      out_normal[p * 3 + 0] = n_out[0];
      out_normal[p * 3 + 1] = n_out[1];
      out_normal[p * 3 + 2] = n_out[2];
      out_color[p * 4 + 0] = c_out[0];
      out_color[p * 4 + 1] = c_out[1];
      out_color[p * 4 + 2] = c_out[2];
      out_color[p * 4 + 3] = c_out[3];
      out_y[p] = y_out;
      out_z[p] = z_out;
      out_ent[p] = e_out;
    }
  }
}

// ---------------------------------------------------------------------------
// Shadow march + deferred lighting (semantics of alternative.cpp:399-500 and
// 702-760).
// ---------------------------------------------------------------------------

// std::min/std::max argument-order-faithful comparisons.
static inline float sel_min(float a, float b) { return b < a ? b : a; }
static inline float sel_max(float a, float b) { return a < b ? b : a; }

// Slab test against a box, given the ray origin and inverse direction
// (semantics of AABB::intersect, alternative.cpp:40-83).
static inline bool slab_hit(const int32_t* bpos, const int32_t* bext,
                            float ox, float oy, float oz, float ix, float iy,
                            float iz) {
  const float x1 = ((float)bpos[0] - ox) * ix;
  const float x2 = ((float)(bpos[0] + bext[0]) - ox) * ix;
  float lo = sel_min(x1, x2);
  float hi = sel_max(x1, x2);
  const float y1 = ((float)bpos[1] - oy) * iy;
  const float y2 = ((float)(bpos[1] + bext[1]) - oy) * iy;
  lo = sel_max(lo, sel_min(y1, y2));
  hi = sel_min(hi, sel_max(y1, y2));
  const float z1 = ((float)bpos[2] - oz) * iz;
  const float z2 = ((float)(bpos[2] + bext[2]) - oz) * iz;
  lo = sel_max(lo, sel_min(z1, z2));
  hi = sel_min(hi, sel_max(z1, z2));
  return hi >= lo;
}

// One shadow ray: returns true when the light is reachable.  7-phase
// thick-line DDA over bins (semantics of trace_hash_for_light,
// alternative.cpp:399-500).  Out-of-allocation flat indices are treated as
// empty bins (the reference reads OOB memory there, which is UB); flat
// indices inside [0, vol) — including aliased ones from out-of-range bin
// coordinates — are used as-is.
static bool light_reachable(const ParConfig* cfg, const int32_t* pos,
                            const int32_t* ext, const int32_t* bins_ent,
                            const int32_t* counts, int32_t sx, int32_t sy,
                            int32_t sz, int32_t exx, int32_t eyy, int32_t ezz,
                            int32_t skip_entity, float ox, float oy, float oz,
                            float ix, float iy, float iz) {
  const int32_t vol = hash_vol(cfg);
  const int32_t cap = cfg->bin_cap;

  const float ddx = (float)exx - (float)sx;
  const float ddy = (float)eyy - (float)sy;
  const float ddz = (float)ezz - (float)sz;
  float longest = fabsf(ddx);
  if (fabsf(ddy) > longest) longest = fabsf(ddy);
  if (fabsf(ddz) > longest) longest = fabsf(ddz);
  const float stx = ddx / longest, sty = ddy / longest, stz = ddz / longest;

  const int32_t start_flat = flat_bin(cfg, sx, sy, sz);
  float anchor_x = (float)sx, anchor_y = (float)sy, anchor_z = (float)sz;
  const int32_t n_steps = (int32_t)longest;

  for (int32_t step = 0; step < n_steps; step++) {
    for (int32_t phase = 0; phase < 7; phase++) {
      float cx = anchor_x, cy = anchor_y, cz = anchor_z;
      // Phase pattern (alternative.cpp:432-466): x, y, z, xy, xz, yz, xyz;
      // the final phase advances the anchor.
      const bool px = phase == 0 || phase == 3 || phase == 4 || phase == 6;
      const bool py = phase == 1 || phase == 3 || phase == 5 || phase == 6;
      const bool pz = phase == 2 || phase == 4 || phase == 5 || phase == 6;
      if (px) cx += stx;
      if (py) cy += sty;
      if (pz) cz += stz;
      if (phase == 6) {
        anchor_x = cx;
        anchor_y = cy;
        anchor_z = cz;
      }

      const int32_t f =
          flat_bin(cfg, (int32_t)cx, (int32_t)cy, (int32_t)cz);
      if (f == start_flat) continue;
      if (f < 0 || f >= vol) continue;  // reference: UB; here: empty
      const int32_t cnt = counts[f];
      for (int32_t s = 0; s < cnt; s++) {
        const int32_t e = bins_ent[f * cap + s];
        if (e == skip_entity) continue;  // self-shadow guard (alternative.cpp:483-487)
        if (slab_hit(&pos[e * 3], &ext[e * 3], ox, oy, oz, ix, iy, iz))
          return false;
      }
    }
  }
  return true;
}

void par_shade(const ParConfig* cfg, const int32_t* pos, const int32_t* ext,
               const int32_t* bins_ent, const int32_t* counts,
               const float* gb_normal, const uint8_t* gb_color,
               const int32_t* gb_y, const int32_t* gb_z, const int32_t* gb_ent,
               int32_t light_x, int32_t light_y, int32_t light_z,
               uint8_t* out_rgb /* [H*W*3] */) {
  const int32_t W = cfg->view_w, H = cfg->view_h, bs = cfg->bin_size;
  const float ambient = cfg->ambient;

  const int32_t lbx = tdiv(light_x, bs);
  const int32_t lby = tdiv(cfg->view_h - light_y - light_z, bs);
  const int32_t lbz = tdiv(light_z, bs);

  for (int32_t p = 0; p < H * W; p++) {
    const int32_t wx = p % W;
    const int32_t wy = gb_y[p];
    const int32_t wz = gb_z[p];

    // L1-normalised direction toward the light (quirk Q2).
    const float vx = (float)(light_x - wx);
    const float vy = (float)(light_y - wy);
    const float vz = (float)(light_z - wz);
    const float len = fabsf(vx) + fabsf(vy) + fabsf(vz);
    const float tx = vx / len, ty = vy / len, tz = vz / len;
    const float ix = 1.0f / tx, iy = 1.0f / ty, iz = 1.0f / tz;

    const int32_t rbx = tdiv(wx, bs);
    const int32_t rby = tdiv(cfg->view_h - wy - wz, bs);
    const int32_t rbz = tdiv(wz, bs);

    float factor = ambient;
    if (light_reachable(cfg, pos, ext, bins_ent, counts, rbx, rby, rbz, lbx,
                        lby, lbz, gb_ent[p], (float)wx, (float)wy, (float)wz,
                        ix, iy, iz)) {
      const float dot = gb_normal[p * 3] * tx + gb_normal[p * 3 + 1] * ty +
                        gb_normal[p * 3 + 2] * tz;
      const float diffuse = sel_max(0.0f, dot);
      factor = sel_min(1.0f, diffuse + ambient);
    }
    // u8 scale with truncation (sprites.hpp:8-16).
    out_rgb[p * 3 + 0] = (uint8_t)((float)gb_color[p * 4 + 0] * factor);
    out_rgb[p * 3 + 1] = (uint8_t)((float)gb_color[p * 4 + 1] * factor);
    out_rgb[p * 3 + 2] = (uint8_t)((float)gb_color[p * 4 + 2] * factor);
  }
}

// ---------------------------------------------------------------------------
// Animated GIF (GIF89a) encoder with LZW compression.
//
// Frames arrive palette-indexed (<=256 colors).  This replaces the
// reference's SDL present path (alternative.cpp:774-788) with file writeback,
// matching its only published artifact format (gif.gif).
// ---------------------------------------------------------------------------

typedef struct GifWriter {
  FILE* fp;
  uint8_t chunk[256];
  int32_t chunk_len;
  uint32_t bit_acc;
  int32_t bit_len;
} GifWriter;

static void gif_flush_chunk(GifWriter* w) {
  if (w->chunk_len == 0) return;
  fputc(w->chunk_len, w->fp);
  fwrite(w->chunk, 1, (size_t)w->chunk_len, w->fp);
  w->chunk_len = 0;
}

static void gif_put_code(GifWriter* w, uint32_t code, int32_t width) {
  w->bit_acc |= code << w->bit_len;
  w->bit_len += width;
  while (w->bit_len >= 8) {
    w->chunk[w->chunk_len++] = (uint8_t)(w->bit_acc & 0xff);
    w->bit_acc >>= 8;
    w->bit_len -= 8;
    if (w->chunk_len == 255) gif_flush_chunk(w);
  }
}

// LZW with a fixed-size open-addressing dictionary.
static void gif_lzw_image(GifWriter* w, const uint8_t* idx, int32_t n,
                          int32_t min_code_bits) {
  const int32_t clear_code = 1 << min_code_bits;
  const int32_t eoi_code = clear_code + 1;
  fputc(min_code_bits, w->fp);

  // hash table: key = (prefix_code << 8) | next_byte
  enum { HSIZE = 1 << 16 };
  static int32_t hkey[HSIZE];
  static int16_t hval[HSIZE];

  int32_t code_bits = min_code_bits + 1;
  int32_t next_code = eoi_code + 1;
  memset(hkey, 0xff, sizeof(hkey));

  gif_put_code(w, (uint32_t)clear_code, code_bits);
  int32_t prefix = idx[0];
  for (int32_t i = 1; i < n; i++) {
    const int32_t key = (prefix << 8) | idx[i];
    uint32_t h = ((uint32_t)key * 2654435761u) & (HSIZE - 1);
    int32_t found = -1;
    while (hkey[h] != -1) {
      if (hkey[h] == key) {
        found = hval[h];
        break;
      }
      h = (h + 1) & (HSIZE - 1);
    }
    if (found >= 0) {
      prefix = found;
      continue;
    }
    gif_put_code(w, (uint32_t)prefix, code_bits);
    if (next_code < 4096) {
      hkey[h] = key;
      hval[h] = (int16_t)next_code;
      if (next_code == (1 << code_bits)) code_bits++;
      next_code++;
    } else {
      gif_put_code(w, (uint32_t)clear_code, code_bits);
      code_bits = min_code_bits + 1;
      next_code = eoi_code + 1;
      memset(hkey, 0xff, sizeof(hkey));
    }
    prefix = idx[i];
  }
  gif_put_code(w, (uint32_t)prefix, code_bits);
  gif_put_code(w, (uint32_t)eoi_code, code_bits);
  // flush remaining bits
  if (w->bit_len > 0) {
    w->chunk[w->chunk_len++] = (uint8_t)(w->bit_acc & 0xff);
    w->bit_acc = 0;
    w->bit_len = 0;
    if (w->chunk_len == 255) gif_flush_chunk(w);
  }
  gif_flush_chunk(w);
  fputc(0, w->fp);  // block terminator
}

// Write an animated GIF.  frames: [n_frames * w * h] palette indices;
// palette: [pal_size * 3] RGB; delay in 1/100 s. Returns 0 on success.
int32_t par_gif_write(const char* path, const uint8_t* frames,
                      int32_t n_frames, int32_t width, int32_t height,
                      const uint8_t* palette, int32_t pal_size,
                      int32_t delay_cs, int32_t loop) {
  if (pal_size < 2 || pal_size > 256 || n_frames < 1) return 1;
  FILE* fp = fopen(path, "wb");
  if (!fp) return 2;

  int32_t pal_bits = 1;
  while ((1 << pal_bits) < pal_size) pal_bits++;
  const int32_t pal_entries = 1 << pal_bits;

  GifWriter w;
  memset(&w, 0, sizeof(w));
  w.fp = fp;

  fwrite("GIF89a", 1, 6, fp);
  // logical screen descriptor
  fputc(width & 0xff, fp);
  fputc(width >> 8, fp);
  fputc(height & 0xff, fp);
  fputc(height >> 8, fp);
  fputc(0xf0 | (pal_bits - 1), fp);  // global color table, pal_bits bpp
  fputc(0, fp);                      // background color index
  fputc(0, fp);                      // aspect
  for (int32_t i = 0; i < pal_entries; i++) {
    if (i < pal_size) {
      fwrite(&palette[i * 3], 1, 3, fp);
    } else {
      fputc(0, fp);
      fputc(0, fp);
      fputc(0, fp);
    }
  }
  if (n_frames > 1) {
    // Netscape looping extension.
    fwrite("\x21\xff\x0bNETSCAPE2.0\x03\x01", 1, 16, fp);
    fputc(loop & 0xff, fp);
    fputc((loop >> 8) & 0xff, fp);
    fputc(0, fp);
  }

  const int32_t npix = width * height;
  const int32_t min_code_bits = pal_bits < 2 ? 2 : pal_bits;
  for (int32_t f = 0; f < n_frames; f++) {
    // graphic control extension (frame delay)
    fwrite("\x21\xf9\x04\x00", 1, 4, fp);
    fputc(delay_cs & 0xff, fp);
    fputc((delay_cs >> 8) & 0xff, fp);
    fputc(0, fp);  // transparent color index (unused)
    fputc(0, fp);  // terminator
    // image descriptor
    fputc(0x2c, fp);
    fputc(0, fp);
    fputc(0, fp);
    fputc(0, fp);
    fputc(0, fp);
    fputc(width & 0xff, fp);
    fputc(width >> 8, fp);
    fputc(height & 0xff, fp);
    fputc(height >> 8, fp);
    fputc(0, fp);  // no local color table
    gif_lzw_image(&w, &frames[(int64_t)f * npix], npix, min_code_bits);
  }
  fputc(0x3b, fp);  // trailer
  fclose(fp);
  return 0;
}

}  // extern "C"
