"""Decompose the per-frame shadow setup costs (64-frame batches)."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

F = 64


def timeit(label, fn, *args, iters=3):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best*1e3:9.2f} ms  ({best*1e3/F:7.2f} ms/frame)")


def main():
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import DeferredRenderer, DeviceScene
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas
    from pixel_art_raytracer_tpu.ops.cstyle import c_div, exact_f32_div

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    ds = DeviceScene.from_scene(scene, cfg)
    t = np.arange(F)
    players = jnp.asarray(np.broadcast_to(scene.pos[0], (F, 3)), jnp.int32)
    lights = jnp.asarray(np.stack([440 + (t % 16), np.full(F, 160),
                                   np.full(F, 80)], 1), jnp.int32)
    H, W = cfg.view_height, cfg.view_width

    def scan_over(frame_fn):
        @jax.jit
        def run(players, lights):
            def body(_, pl):
                return None, frame_fn(*pl)
            _, ys = jax.lax.scan(body, None, (players, lights))
            return ys.sum(dtype=jnp.int32)
        return run

    def prel(p, l, upto):
        pos = ds.pos.at[0].set(p)
        d = ds._replace(pos=pos)
        be, cnt = cache.merge(pos[:1], ds.ext[:1])
        gbuf = r.trace(d, be, cnt)
        wx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
        bs = cfg.bin_size
        lbx = c_div(l[0], bs)
        lby = c_div(jnp.int32(H) - l[1] - l[2], bs)
        lbz = c_div(l[2], bs)
        if upto == "gbuf":
            return gbuf.entity_index.sum()
        member = shadow_fast.dda_membership((lbx, lby, lbz), cfg, tables)
        if upto == "member":
            return gbuf.entity_index.sum() + member.sum()
        cands = shadow_fast.build_candidates(pos, ds.ext, be, cnt, member,
                                             cfg, tables)
        if upto == "cands":
            return gbuf.entity_index.sum() + cands.ent.sum()
        rbz = c_div(gbuf.z, bs)
        SZ = tables.sz_hi - tables.sz_lo
        szidx = jnp.clip(rbz - tables.sz_lo, 0, SZ - 1)
        bg = ((gbuf.y + gbuf.z) == 0).astype(jnp.int32)
        pad = 512 - W
        szp = jnp.pad(szidx, ((0, 0), (0, pad)))
        bgp = jnp.pad(bg, ((0, 0), (0, pad)))
        rel = shadow_pallas.used_block_relevance(member, szp, bgp, cfg,
                                                 tables, 8)
        if upto == "rel":
            return gbuf.entity_index.sum() + rel.sum()
        lists, counts2 = shadow_pallas.candidate_lists_from_relevance(cands,
                                                                      rel)
        if upto == "lists":
            return gbuf.entity_index.sum() + lists.sum() + counts2.sum()
        mw = shadow_pallas.pack_member_words(member)
        t_row, t_bg = shadow_pallas.lane_member_tables(mw, cfg, tables, 8,
                                                       512)
        return gbuf.entity_index.sum() + t_row.sum(dtype=jnp.uint32).astype(jnp.int32)

    for stage in ["gbuf", "member", "cands", "rel", "lists", "tables"]:
        timeit(f"through {stage}",
               scan_over(lambda p, l, s=stage: prel(p, l, s)),
               players, lights)


if __name__ == "__main__":
    main()
