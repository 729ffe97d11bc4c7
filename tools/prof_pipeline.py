"""Per-stage TPU profiling of the whole-batch pipeline (models/batched.py).

Times the cumulative stage decomposition of render_states_batched via its
``upto`` parameter (bins -> trace -> prep -> shadow -> full), and/or the
full program for a sweep of (shadow_rows, lane_groups) kernel configs.

All timings materialise tiny checksums to host (block_until_ready returns
early through the axon tunnel); the full program is the frames-delivered
form (the frame batch is a program output).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_host(fn, *args, iters=3):
    out = fn(*args)
    _ = jax.tree.map(np.asarray, out)
    best = float("inf")
    import time
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = jax.tree.map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--stages", action="store_true",
                    help="time the upto-stage decomposition")
    ap.add_argument("--upto", type=str, default=None,
                    help="time a single stage cut (e.g. texp)")
    ap.add_argument("--rows", type=int, nargs="*", default=[40])
    ap.add_argument("--groups", type=int, nargs="*", default=[1])
    ap.add_argument("--trace-rows", type=int, nargs="*", default=[8])
    ap.add_argument("--chunk", type=int, nargs="*", default=[8])
    ap.add_argument("--light", type=str, default="center",
                    choices=["center", "edge_x", "edge_z"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-field-pack", action="store_true",
                    help="force the unpacked 12-row trace field tables")
    ap.add_argument("--no-box-pack", action="store_true",
                    help="force the unpacked shadow candidate params")
    ap.add_argument("--box-pack-sweep", action="store_true",
                    help="sweep packed vs unpacked shadow params in-run")
    ap.add_argument("--kexp-sweep", action="store_true",
                    help="A/B kernel-side trace-table lane expansion "
                         "(r.trace_kernel_expand)")
    ap.add_argument("--winner-sweep", action="store_true",
                    help="sweep winner-direct vs legacy shadow inputs")
    ap.add_argument("--mx-sweep", action="store_true",
                    help="A/B kernel-side membership-table lane expansion "
                         "(r.shadow_member_expand)")
    ap.add_argument("--shade-sweep", action="store_true",
                    help="A/B shade-in-kernel packed-RGB output "
                         "(r.shadow_shade_kernel)")
    ap.add_argument("--pick2-sweep", action="store_true",
                    help="A/B two-pick vs three-pick trace winner resolve "
                         "(r.trace_pick2)")
    ap.add_argument("--bitmap-sweep", action="store_true",
                    help="sweep on-demand vs prebuilt kernel bitmaps in-run")
    ap.add_argument("--ikeys-sweep", action="store_true",
                    help="sweep incremental vs direct trace keys in-run")
    ap.add_argument("--fpb-sweep", type=int, nargs="*", default=None,
                    help="sweep SHADOW frames-per-grid-step caps in-run "
                         "(e.g. --fpb-sweep 1 2 4 8)")
    ap.add_argument("--tfpb-sweep", type=int, nargs="*", default=None,
                    help="sweep TRACE frames-per-grid-step caps in-run")
    ap.add_argument("--slot-cap-sweep", type=int, nargs="*", default=None,
                    help="sweep trace slot caps in-run (bin_capacity "
                         "means uncompacted, e.g. --slot-cap-sweep 7 8)")
    ap.add_argument("--listcap-sweep", type=int, nargs="*", default=None,
                    help="sweep capped top-k candidate lists in-run "
                         "(0 means full argsort, e.g. "
                         "--listcap-sweep 0 256 128)")
    ap.add_argument("--wdot-sweep", action="store_true",
                    help="A/B the winner-dot path (Lambert dot from packed "
                         "picks vs from the decoded normal buffer)")
    ap.add_argument("--grecomp-sweep", action="store_true",
                    help="A/B the guard cold-path recompute (slow reroute "
                         "inputs re-derived in-branch vs captured)")
    ap.add_argument("--intgeom-sweep", action="store_true",
                    help="A/B integer-exact vs f64-emulated light "
                         "geometry (r.shadow_int_geom)")
    ap.add_argument("--relrange-sweep", action="store_true",
                    help="A/B range-hull vs exact-presence tile "
                         "relevance (r.shadow_rel_range)")
    ap.add_argument("--raydot-sweep", action="store_true",
                    help="A/B in-kernel ray-dot shading (shadow kernel "
                         "derives tl/dot itself and emits packed RGB) "
                         "vs the lit-mask + XLA shade path")
    ap.add_argument("--nolists-sweep", action="store_true",
                    help="A/B all-visits kernel (no relevance/lists, "
                         "r.shadow_no_lists) vs pruned per-tile lists")
    ap.add_argument("--fused-sweep", action="store_true",
                    help="A/B the fused trace+shadow kernel "
                         "(r.fuse_trace_shadow) vs the two-kernel "
                         "default; fused configs need --rows == "
                         "--trace-rows (others are skipped)")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="also time N back-to-back dispatches materialised "
                         "together (does the dispatch floor overlap "
                         "device work?)")
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.config import DEFAULT_CONFIG as cfg
    from pixel_art_raytracer_tpu.scene import graybox_world, default_light
    from pixel_art_raytracer_tpu.models.deferred import (DeferredRenderer,
                                                         DeviceScene)
    from pixel_art_raytracer_tpu.models.animation import AnimationRenderer
    from pixel_art_raytracer_tpu.models.batched import render_states_batched
    from pixel_art_raytracer_tpu.ops.static_bins import StaticBins
    from pixel_art_raytracer_tpu.ops import shadow_fast

    scene = graybox_world()
    light = default_light()
    centers = {"center": (light.x, light.y, light.z),
               "edge_x": (20, light.y, light.z),
               "edge_z": (light.x, light.y, 280)}
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    if args.no_field_pack:
        r.trace_field_pack = False
    if args.no_box_pack:
        r.shadow_box_pack = False
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=centers[args.light], radius=40)

    def runner(rows, groups, trows, upto, chunk=None, slot_cap="anim"):
        chunk = args.chunk[0] if chunk is None else chunk
        if slot_cap == "anim":
            slot_cap = anim.trace_slot_cap
        @jax.jit
        def run(players, lights):
            out = render_states_batched(r, cache, ds, players, lights,
                                        shadow_rows=rows,
                                        lane_groups=groups,
                                        trace_rows=trows,
                                        trace_slot_cap=slot_cap,
                                        shadow_chunk=chunk, upto=upto)
            if upto is None:
                return out, out.reshape(F, -1).sum(axis=1, dtype=jnp.int32)
            return out

        if upto is None:
            return lambda p, l: run(p, l)[1]
        return run

    print(f"frames={F} light={args.light}")
    if args.stages or args.upto:
        rows, groups, trows = (args.rows[0], args.groups[0],
                               args.trace_rows[0])
        cuts = ([args.upto] if args.upto
                else ["bins", "texp", "tkeys", "trace", "geom", "cands",
                      "rel", "prep", "shadow", None])
        for upto in cuts:
            t = time_host(runner(rows, groups, trows, upto), players,
                          lights, iters=args.iters)
            label = upto or "FULL (frames delivered)"
            print(f"R={rows} G={groups} TR={trows} upto={label:24s} "
                  f"{t*1e3:9.2f} ms ({t*1e3/F:7.3f} ms/frame)")
    else:
        from pixel_art_raytracer_tpu.ops import shadow_pallas, trace_pallas

        packs = ([True, False] if args.box_pack_sweep
                 else [r.shadow_box_pack])
        winner_modes = ([True, False] if args.winner_sweep
                        else [r.shadow_winner_inputs])
        kexps = ([True, False] if args.kexp_sweep
                 else [r.trace_kernel_expand])
        mxs = ([True, False] if args.mx_sweep
               else [r.shadow_member_expand])
        shades = ([True, False] if args.shade_sweep
                  else [r.shadow_shade_kernel])
        pick2s = ([True, False] if args.pick2_sweep else [r.trace_pick2])
        bitmaps = ([True, False] if args.bitmap_sweep
                   else [shadow_pallas.BITMAP_ONDEMAND])
        ikeys = ([True, False] if args.ikeys_sweep
                 else [trace_pallas.INCREMENTAL_KEYS])
        fpbs = (args.fpb_sweep if args.fpb_sweep
                else [shadow_pallas.FRAMES_PER_BLOCK])
        tfpbs = (args.tfpb_sweep if args.tfpb_sweep
                 else [trace_pallas.TRACE_FRAMES_PER_BLOCK])
        scaps = (args.slot_cap_sweep if args.slot_cap_sweep
                 else [anim.trace_slot_cap])
        lcaps = (args.listcap_sweep if args.listcap_sweep
                 else [r.shadow_list_cap])
        wdots = ([True, False] if args.wdot_sweep
                 else [r.shadow_winner_dot])
        grecs = ([True, False] if args.grecomp_sweep
                 else [r.shadow_guard_recompute])
        rds = ([True, False] if args.raydot_sweep
               else [getattr(r, "shadow_ray_dot", False)])
        rrs = ([True, False] if args.relrange_sweep
               else [getattr(r, "shadow_rel_range", False)])
        igs = ([True, False] if args.intgeom_sweep
               else [getattr(r, "shadow_int_geom", False)])
        nls = ([True, False] if args.nolists_sweep
               else [getattr(r, "shadow_no_lists", False)])
        fss = ([True, False] if args.fused_sweep
               else [getattr(r, "fuse_trace_shadow", False)])
        # Compile every config first, then time them in interleaved
        # rounds: the axon tunnel's ambient load drifts on the minutes
        # scale (same-config repeats differ by up to 0.07 ms/frame), so
        # sequential per-config timing confounds config and drift —
        # interleaving cancels it.  Per config: median over rounds of the
        # per-round best-of-iters.
        entries = []
        for rows in args.rows:
            for groups in args.groups:
                for trows in args.trace_rows:
                    for ch in args.chunk:
                        for bp in packs:
                            import itertools

                            for (bo, ik, fpb, tfpb, scap, wm, kx, mx, sh,
                                 p2, lc, wd, gr, rd, rr, ig, nl, fs) in \
                                    itertools.product(bitmaps, ikeys,
                                                      fpbs, tfpbs, scaps,
                                                      winner_modes, kexps,
                                                      mxs, shades, pick2s,
                                                      lcaps, wdots, grecs,
                                                      rds, rrs, igs, nls,
                                                      fss):
                                key = (rows, groups, trows, ch, bp,
                                       bo, ik, fpb, tfpb, scap, wm, kx,
                                       mx, sh, p2, lc, wd, gr, rd, rr,
                                       ig, nl, fs)
                                if any(e[0] == key for e in entries):
                                    continue
                                if fs and (trows != rows
                                           or scap is not None
                                           and scap < cfg.bin_capacity):
                                    continue    # fused gate would no-op
                                r.shadow_box_pack = bp
                                r.shadow_winner_inputs = wm
                                r.trace_kernel_expand = kx
                                r.shadow_member_expand = mx
                                r.shadow_shade_kernel = sh
                                r.trace_pick2 = p2
                                r.shadow_list_cap = lc or None
                                r.shadow_winner_dot = wd
                                r.shadow_guard_recompute = gr
                                r.shadow_ray_dot = rd
                                r.shadow_rel_range = rr
                                r.shadow_int_geom = ig
                                r.shadow_no_lists = nl
                                r.fuse_trace_shadow = fs
                                shadow_pallas.BITMAP_ONDEMAND = bo
                                trace_pallas.INCREMENTAL_KEYS = ik
                                shadow_pallas.FRAMES_PER_BLOCK = fpb
                                trace_pallas.TRACE_FRAMES_PER_BLOCK = tfpb
                                sc = (None if scap is None
                                      or scap >= cfg.bin_capacity
                                      else scap)
                                fn = runner(rows, groups, trows, None,
                                            ch, slot_cap=sc)
                                _ = np.asarray(fn(players, lights))
                                entries.append((key, fn, []))
        rounds = max(3, args.iters)
        for _ in range(rounds):
            for key, fn, ts in entries:
                import time as _t
                best = float("inf")
                for _ in range(2):
                    t0 = _t.perf_counter()
                    _ = np.asarray(fn(players, lights))
                    best = min(best, _t.perf_counter() - t0)
                ts.append(best)
        rays = 2 * cfg.view_width * cfg.view_height * F
        for (rows, groups, trows, ch, bp, bo, ik, fpb, tfpb, scap,
             wm, kx, mx, sh, p2, lc, wd, gr, rd, rr,
             ig, nl, fs), _, ts in entries:
            med = float(np.median(ts))
            lo = float(np.min(ts))
            print(f"R={rows} G={groups} TR={trows} C={ch} pack={int(bp)} "
                  f"od={int(bo)} ik={int(ik)} fpb={fpb} tfpb={tfpb} "
                  f"cap={scap} wm={int(wm)} kx={int(kx)} mx={int(mx)} "
                  f"sh={int(sh)} p2={int(p2)} lc={lc} wd={int(wd)} "
                  f"gr={int(gr)} rd={int(rd)} rr={int(rr)} "
                  f"ig={int(ig)} nl={int(nl)} fu={int(fs)} FULL "
                  f"med {med*1e3:8.2f} ms ({med*1e3/F:6.3f} ms/f, "
                  f"{rays/med/1e6:6.1f} Mr/s)  best {lo*1e3:8.2f} "
                  f"({lo*1e3/F:6.3f})")
        if args.pipeline:
            import time as _t

            for (rows, groups, trows, ch, bp, bo, ik, fpb, tfpb,
                 scap, wm, kx, mx, sh, p2, lc, wd, gr, rd,
                 rr, ig, nl, fs), fn, _ in entries:
                def burst(p, l, n=args.pipeline):
                    outs = [fn(p, l) for _ in range(n)]
                    return [np.asarray(o) for o in outs]

                burst(players, lights)
                t0 = _t.perf_counter()
                burst(players, lights)
                tb = (_t.perf_counter() - t0) / args.pipeline
                print(f"R={rows} G={groups} TR={trows} C={ch} "
                      f"pack={int(bp)} pipelined x{args.pipeline}: "
                      f"{tb*1e3:9.2f} ms/batch ({tb*1e3/F:7.3f} ms/frame, "
                      f"{rays/tb/1e6:7.1f} Mrays/s)")


if __name__ == "__main__":
    main()
