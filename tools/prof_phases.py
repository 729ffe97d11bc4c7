"""Batched-pipeline phase decomposition on TPU.

Times cumulative phase checksums of the whole-batch renderer
(models/batched.py): bins -> expand tables -> trace kernel -> G-buffer ->
light geometry -> membership words -> candidates -> pruned lists ->
shadow kernel -> full shade.  XLA dead-code-eliminates phases a checksum
does not need (e.g. the member-words phase drops the trace kernel), so
read deltas with the dependency structure in mind; the ~26 ms floor on the
remote-TPU tunnel is per-program dispatch overhead.
"""

import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import argparse
import numpy as np
import jax, jax.numpy as jnp
from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
from pixel_art_raytracer_tpu.scene import graybox_world, default_light
from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas, trace_pallas
from pixel_art_raytracer_tpu.ops import shade as shade_ops
from pixel_art_raytracer_tpu.utils.metrics import time_fn

ap = argparse.ArgumentParser()
ap.add_argument('--frames', type=int, default=64)
ap.add_argument('--iters', type=int, default=3)
args = ap.parse_args()
F = args.frames
scene = graybox_world()
light = default_light()
tables = shadow_fast.derive_tables(cfg, scene)
r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                     shadow_tables=tables, shadow_guard="none")
r.configure_for(scene)
cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
anim = AnimationRenderer(r, cfg, static_bins=cache, batched=True)
ds = DeviceScene.from_scene(scene, cfg)
players, lights = anim.light_sweep_states(F, scene.pos[0],
    center=(light.x, light.y, light.z), radius=40)

H, W = cfg.view_height, cfg.view_width
w_pad = 512
R = 8
SZ = tables.sz_hi - tables.sz_lo

def upto(stage):
    @jax.jit
    def run(players, lights):
        dyn_pos = players[:, None, :]
        dyn_ext = jnp.broadcast_to(ds.ext[:1], (F, 1, 3))
        be, cnt = jax.vmap(cache.merge)(dyn_pos, dyn_ext)
        if stage == "bins":
            return cnt.sum(dtype=jnp.int32)
        d0, slope, segments = trace_pallas._resolve_depth_params(
            ds.atlas_color, (ds.depth_d0, ds.depth_slope), r.depth_segments)
        tabs = jax.vmap(lambda b, c, dp: trace_pallas._expand_tables(
            ds.pos, ds.ext, ds.sprite_id, d0, slope, b, c, cfg, w_pad,
            dyn_pos=dp))(be, cnt, dyn_pos)
        if stage == "tables":
            return tabs.sum(dtype=jnp.int32)
        winners = trace_pallas.trace_keys_pallas(tabs, cfg, segments=segments)
        if stage == "kernel":
            return sum(w.sum(dtype=jnp.int32) for w in winners)
        gbuf = jax.vmap(lambda w: trace_pallas.gbuffer_from_winners(
            w, ds.atlas_color, ds.atlas_normal, ds.palette, cfg,
            r.normal_bands, r.color_rects))(winners)
        if stage == "gbuf":
            return (gbuf.entity_index.sum() + gbuf.y.sum() + gbuf.z.sum()
                    + gbuf.color.sum(dtype=jnp.int32)
                    + gbuf.normal.sum().astype(jnp.int32))
        tl, inv, origin, rb, lb = jax.vmap(
            lambda g, l: shade_ops.light_geometry(g, l, cfg))(gbuf, lights)
        if stage == "geom":
            return sum(t.sum() for t in tl).astype(jnp.int32)
        words = jax.vmap(lambda lbf: shadow_fast.dda_membership_words(
            lbf, cfg, tables))(lb)
        if stage == "member":
            return words.astype(jnp.int32).sum()
        n_words = words.shape[-1]
        any_words = jax.lax.reduce(words, jnp.uint32(0),
                                   jax.lax.bitwise_or, (1,))
        tested_any = jax.vmap(lambda w: shadow_fast.unpack_member_words(
            w[None], cfg)[0])(any_words)
        cands = jax.vmap(lambda b, c, ta, dp: shadow_fast.build_candidates(
            ds.pos, ds.ext, b, c, None, cfg, tables, tested_any=ta,
            dyn_pos=dp))(be, cnt, tested_any, dyn_pos)
        if stage == "cands":
            return cands.ent.sum()
        szidx = jnp.pad(jnp.clip(rb[2] - tables.sz_lo, 0, SZ-1),
                        ((0,0),(0,0),(0,w_pad-W)))
        bgm = jnp.pad(((gbuf.y + gbuf.z) == 0).astype(jnp.int32),
                      ((0,0),(0,0),(0,w_pad-W)))
        member = jax.vmap(lambda w: shadow_fast.unpack_member_words(w, cfg))(words)
        rel = jax.vmap(lambda m, s, b: shadow_pallas.used_block_relevance(
            m, s, b, cfg, tables, R))(member, szidx, bgm)
        lists, blk_counts = jax.vmap(
            shadow_pallas.candidate_lists_from_relevance)(cands, rel)
        t_row, t_bg = jax.vmap(lambda w: shadow_pallas.lane_member_tables(
            w, cfg, tables, R, w_pad))(words)
        cword, cmask, box, centi = jax.vmap(
            lambda c: shadow_pallas.candidate_param_tables(c, n_words))(cands)
        if stage == "lists":
            return (lists.sum() + blk_counts.sum()
                    + t_row.astype(jnp.int32).sum() + cword.sum())
        M = cands.bin.shape[1]
        ent_p = jnp.pad(gbuf.entity_index, ((0,0),(0,0),(0,w_pad-W)))
        pw = lambda a: jnp.pad(a, ((0,0),(0,0),(0,w_pad-W)))
        szr = jax.vmap(lambda sx, bb: shadow_pallas.block_sz_ranges(
            sx, bb, W, R, SZ))(szidx, bgm)
        lit_pad = shadow_pallas.shadow_call_batched(
            blk_counts, szr, cword, cmask,
            lists.reshape(F, -1, M // 128, 128),
            box, centi, t_row, t_bg, szidx, bgm, ent_p,
            pw(origin[1]), pw(origin[2]),
            pw(inv[0]), pw(inv[1]), pw(inv[2]), cfg, tables, rows_per_block=R)
        lit = lit_pad[:, :, :W] > 0
        if stage == "shadow":
            return lit.sum(dtype=jnp.int32)
        factor = shade_ops.brightness_factor(gbuf.normal, tl, lit, cfg)
        rgb = gbuf.color[..., :3].astype(jnp.float32) * factor[..., None]
        frames = rgb.astype(jnp.uint8)
        return frames.reshape(F, -1).sum(axis=1, dtype=jnp.int32).sum()
    return run

for stage in ["bins", "tables", "kernel", "gbuf", "geom", "member",
              "cands", "lists", "shadow", "full"]:
    best, _ = time_fn(upto(stage), players, lights, iters=args.iters)
    print(f"{stage:8s} {best*1e3:8.2f} ms  ({best*1e3/F:6.3f} ms/frame)")
