"""Experiment: how much of the scan body is hoistable prep overhead?

Variants (64-frame light sweep, fused checksums):
  V1 FULL, guard off            — current pipeline floor
  V2 FULL, guard fallback       — cost of the runtime bounds guard
  V3 bins prebuilt (once)       — scan body = trace + shade only
  V4 V3 + shadow sub-stage cumulative costs (member / cands / tables /
     relevance+lists) to locate the shadow stage's internal hot spots
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pixel_art_raytracer_tpu.utils.metrics import time_fn  # noqa: E402

F = 64


def main() -> None:
    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast, shadow_pallas
    from pixel_art_raytracer_tpu.ops.cstyle import c_div

    scene = graybox_world()
    light = default_light()
    tables = shadow_fast.default_tables(cfg, max_candidates=1024)

    def mk(guard):
        r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                             shadow_tables=tables, shadow_guard=guard)
        r.configure_for(scene)
        return r

    r_no = mk("none")
    r_fb = mk("fallback")
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r_no.spans)
    anim = AnimationRenderer(r_no, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    def full(r):
        @jax.jit
        def run(players, lights):
            def body(_, pl):
                p, l = pl
                pos = ds.pos.at[0].set(p)
                d = ds._replace(pos=pos)
                be, cnt = cache.merge(pos[:1], ds.ext[:1])
                gbuf = r.trace(d, be, cnt)
                return None, r.shade(d, gbuf, be, cnt, l).sum(
                    dtype=jnp.int32)
            _, cs = jax.lax.scan(body, None, (players, lights))
            return cs
        return run

    def full_prebins(r):
        @jax.jit
        def run(players, lights):
            pos = ds.pos.at[0].set(players[0])
            d = ds._replace(pos=pos)
            be, cnt = cache.merge(pos[:1], ds.ext[:1])

            def body(_, pl):
                _p, l = pl
                gbuf = r.trace(d, be, cnt)
                return None, r.shade(d, gbuf, be, cnt, l).sum(
                    dtype=jnp.int32)
            _, cs = jax.lax.scan(body, None, (players, lights))
            return cs
        return run

    def shadow_stage(upto):
        """Prebuilt bins; cumulative shadow sub-stages in the scan body."""
        r = r_no
        H, W = cfg.view_height, cfg.view_width
        w_pad = -(-W // 128) * 128
        R = 8

        @jax.jit
        def run(players, lights):
            pos = ds.pos.at[0].set(players[0])
            d = ds._replace(pos=pos)
            be, cnt = cache.merge(pos[:1], ds.ext[:1])

            def body(_, pl):
                _p, l = pl
                gbuf = r.trace(d, be, cnt)
                base = gbuf.entity_index.sum()
                if upto == "trace":
                    return None, base
                bs = cfg.bin_size
                lb = (c_div(l[0], bs),
                      c_div(jnp.int32(H) - l[1] - l[2], bs),
                      c_div(l[2], bs))
                member = shadow_fast.dda_membership(lb, cfg, tables)
                if upto == "member":
                    return None, base + member.sum(dtype=jnp.int32)
                cands = shadow_fast.build_candidates(
                    d.pos, d.ext, be, cnt, member, cfg, tables)
                if upto == "cands":
                    return None, base + cands.ent.sum(dtype=jnp.int32)
                words = shadow_pallas.pack_member_words(member)
                t_row, t_bg = shadow_pallas.lane_member_tables(
                    words, cfg, tables, R, w_pad)
                if upto == "tables":
                    return None, (base
                                  + t_row.astype(jnp.int32).sum()
                                  + t_bg.astype(jnp.int32).sum())
                wxl = jnp.broadcast_to(
                    jnp.arange(W, dtype=jnp.int32)[None, :], (H, W))
                rbz = c_div(gbuf.z, bs)
                SZ = tables.sz_hi - tables.sz_lo
                szidx = jnp.clip(rbz - tables.sz_lo, 0, SZ - 1)
                bg = ((gbuf.y + gbuf.z) == 0).astype(jnp.int32)
                pad = w_pad - W

                def padw(a):
                    return jnp.pad(a, ((0, 0), (0, pad)))

                rel = shadow_pallas.used_block_relevance(
                    member, padw(szidx), padw(bg), cfg, tables, R)
                lists, blk_counts = \
                    shadow_pallas.candidate_lists_from_relevance(cands, rel)
                del wxl
                return None, (base + lists.sum(dtype=jnp.int32)
                              + blk_counts.sum(dtype=jnp.int32))

            _, cs = jax.lax.scan(body, None, (players, lights))
            return cs
        return run

    for label, fn in [
        ("V1 FULL guard=none", full(r_no)),
        ("V2 FULL guard=fallback", full(r_fb)),
        ("V3 FULL prebuilt bins", full_prebins(r_no)),
        ("V4a prebins trace only", shadow_stage("trace")),
        ("V4b + member sim", shadow_stage("member")),
        ("V4c + candidates", shadow_stage("cands")),
        ("V4d + word/lane tables", shadow_stage("tables")),
        ("V4e + relevance+lists", shadow_stage("lists")),
    ]:
        best, _ = time_fn(fn, players, lights)
        print(f"{label:28s} {best*1e3:9.2f} ms  ({best*1e3/F:7.3f} ms/frame)")


if __name__ == "__main__":
    main()
