"""Drift-immune attribution of the shadow-prep XLA stages.

Sequential upto-cut timings on the axon tunnel carry +-0.07 ms/frame of
ambient-load drift — too coarse for the ~0.1 ms/frame prep chain.  This
tool times each stage as an N-iteration ``lax.fori_loop`` INSIDE one
program (per-iteration light perturbation defeats loop hoisting) and
reports (T(N) - T(1)) / (N - 1): the dispatch floor and the drift cancel
in the delta.

Stages (cumulative chains over a frozen G-buffer):
  geom   — light_geometry + needs dot + membership words
  cands  — + tested_any + build_candidates
  rel    — + tile_candidate_relevance
  lists  — + candidate_lists_from_relc
  trow   — + lane_member_tables
  ptab   — + candidate_param_tables (+ szr + padding)

Usage: python tools/prof_prep_loop.py [--frames 8] [--n 17]
(frames=8 keeps the loop body light; per-frame costs scale linearly.)
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--n", type=int, default=17)
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    F, N = args.frames, args.n
    R, G = args.rows, args.groups

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import (shade as shade_ops,
                                             shadow_fast, shadow_pallas,
                                             trace_pallas)

    scene = graybox_world()
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(F, scene.pos[0], radius=40)

    H, W = cfg.view_height, cfg.view_width
    w_pad = -(-W // 128) * 128
    SZ = tables.sz_hi - tables.sz_lo

    # Frozen per-frame inputs (bins + G-buffer), computed once on device.
    dyn_pos = players[:, None, :]
    dyn_ext = jnp.broadcast_to(ds.ext[:1], (F, 1, 3))
    bins_ent, counts = jax.jit(jax.vmap(cache.merge))(dyn_pos, dyn_ext)
    params = (None if ds.depth_d0 is None
              else (ds.depth_d0, ds.depth_slope))
    gbuf = jax.jit(lambda be, cnt, dp: trace_pallas.trace_pixels_pallas_batched(
        ds.pos, ds.ext, ds.sprite_id, ds.atlas_color, ds.atlas_normal,
        ds.palette, be, cnt, dp, cfg, params, r.normal_bands, r.color_rects,
        r.depth_segments, rows_per_block=40, packed_picks=r.trace_packed,
        field_pack=r.trace_field_pack))(bins_ent, counts, dyn_pos)
    gbuf = jax.tree.map(lambda a: a.block_until_ready(), gbuf)

    def chain(light_f, upto):
        """One iteration of the prep chain for (F,3) lights; returns an
        int32 checksum (kept small so the loop carry is trivial)."""
        tl, inv, origin, rb, lb = jax.vmap(
            lambda g, l: shade_ops.light_geometry(g, l, cfg))(gbuf, light_f)
        szidx = _padw(jnp.clip(rb[2] - tables.sz_lo, 0, SZ - 1))
        bg = _padw(((gbuf.y + gbuf.z) == 0).astype(jnp.int32))
        dot = (gbuf.normal[..., 0] * tl[0] + gbuf.normal[..., 1] * tl[1]
               + gbuf.normal[..., 2] * tl[2])
        needs = _padw((dot > 0).astype(jnp.int32))
        words = jax.vmap(
            lambda lbf: shadow_fast.dda_membership_words(lbf, cfg, tables)
        )(lb)
        acc = (words.sum(dtype=jnp.uint32).astype(jnp.int32)
               + inv[0].sum().astype(jnp.int32) + needs.sum())
        if upto == "geom":
            return acc
        any_words = jax.lax.reduce(words, jnp.uint32(0),
                                   jax.lax.bitwise_or, (1,))
        tested_any = jax.vmap(
            lambda w: shadow_fast.unpack_member_words(w[None], cfg)[0]
        )(any_words)
        cands = jax.vmap(
            lambda be, cnt, ta, dp: shadow_fast.build_candidates(
                ds.pos, ds.ext, be, cnt, None, cfg, tables,
                tested_any=ta, dyn_pos=dp)
        )(bins_ent, counts, tested_any, dyn_pos)
        acc = acc + cands.bin.sum() + cands.mask.sum()
        if upto == "cands":
            return acc
        relc = jax.vmap(
            lambda w, s, b, c, n: shadow_pallas.tile_candidate_relevance(
                w, s, b, c, cfg, tables, R, lane_groups=G, needs=n)
        )(words, szidx, bg, cands, needs)
        acc = acc + relc.sum(dtype=jnp.int32)
        if upto == "rel":
            return acc
        lists, blk_counts = jax.vmap(
            shadow_pallas.candidate_lists_from_relc)(relc)
        acc = acc + lists.sum(dtype=jnp.int32) + blk_counts.sum()
        if upto == "lists":
            return acc
        t_row, t_bg = jax.vmap(
            lambda w: shadow_pallas.lane_member_tables(w, cfg, tables, R,
                                                       w_pad)
        )(words)
        acc = (acc + t_row.sum(dtype=jnp.uint32).astype(jnp.int32)
               + t_bg.sum(dtype=jnp.uint32).astype(jnp.int32))
        if upto == "trow":
            return acc
        n_words = words.shape[-1]
        cword, cmask, box, centi = jax.vmap(
            lambda c: shadow_pallas.candidate_param_tables(c, n_words)
        )(cands)
        szr = jax.vmap(
            lambda s, b, n: shadow_pallas.block_sz_ranges(s, b, W, R, SZ,
                                                          needs=n)
        )(szidx, bg, needs)
        iv_p = tuple(_padw(a) for a in inv)
        acc = (acc + cword.sum() + cmask.sum()
               + box.sum().astype(jnp.int32) + centi.sum() + szr.sum()
               + iv_p[0].sum().astype(jnp.int32))
        return acc

    def _padw(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, w_pad - a.shape[-1])))

    def timed(upto, n):
        @jax.jit
        def run(lights):
            def body(i, acc):
                # Vary the light per iteration: defeats loop-invariant
                # hoisting without changing the work's shape.
                lf = lights + (i % 7)
                return acc + chain(lf, upto)
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))

        out = run(lights)
        _ = np.asarray(out)
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(run(lights))
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"frames={F} n={N} R={R} G={G}")
    for upto in ["geom", "cands", "rel", "lists", "trow", "ptab"]:
        t1 = timed(upto, 1)
        tn = timed(upto, N)
        per = (tn - t1) / (N - 1)
        print(f"{upto:6s} T1 {t1*1e3:8.2f}  TN {tn*1e3:8.2f}  "
              f"per-iter {per*1e3:7.2f} ms ({per*1e3/F:7.4f} ms/frame)")


if __name__ == "__main__":
    main()
