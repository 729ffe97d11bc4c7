"""Compiled-program cost analysis for the whole-batch pipeline.

Compiles the full batched program (or an ``upto`` stage cut) for the real
TPU and reports what XLA itself thinks the program moves and computes:

- ``cost_analysis()`` totals (flops, bytes accessed, transcendentals),
- the optimized-HLO instruction list aggregated by op kind and ranked by
  OUTPUT bytes — a direct census of HBM materialisations (every fusion
  root is a buffer XLA writes back to HBM between fusions).

This answers "where do the ~0.24 ms/frame of XLA mid-stage time go?"
with the compiler's own numbers instead of cut-to-cut timing deltas
(which carry ±0.04 ms/frame tunnel noise).
"""

import argparse
import collections
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u64": 8, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|s32|u64|u32|s16|u16|s8|u8|"
                       r"pred)\[([0-9,]*)\]")


def shape_bytes(text: str) -> int:
    """Sum the byte sizes of every shape literal in an HLO type string
    (tuples contribute each element)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


# `%name = <shape-with-layouts> opcode(...)`; the shape may be a tuple
# and carries layout/tiling annotations, so match the opcode as the first
# lowercase word directly followed by '(' after the '=' (layout tokens
# like `T(8,128)` start uppercase and never match).
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s([a-z][\w\-]*)\(")


def census(hlo_text: str):
    """Aggregate the ENTRY computation's instructions by opcode.

    Returns {opcode: (count, output_bytes)} and a list of the largest
    individual instructions (name, opcode, bytes, line)."""
    by_op = collections.defaultdict(lambda: [0, 0])
    biggest = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        mm = re.search(r'metadata={[^}]*op_name="([^"]*)"', line)
        src = mm.group(1) if mm else ""
        sm = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        if sm:
            src += f"  {pathlib.Path(sm.group(1)).name}:{sm.group(2)}"
        m = _INSTR_RE.match(line.split(" metadata=")[0])
        if not m:
            continue
        name, ty, op = m.groups()
        b = shape_bytes(ty)
        by_op[op][0] += 1
        by_op[op][1] += b
        # keep fusions identifiable by kind
        kind = op
        if op == "fusion":
            km = re.search(r'kind=(\w+)', line)
            if km:
                kind = f"fusion.{km.group(1)}"
            cm = re.search(r'calls=%?([\w.\-]+)', line)
            if cm:
                name = f"{name}:{cm.group(1)}"
        biggest.append((b, kind, name, src))
    biggest.sort(reverse=True)
    return by_op, biggest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--trace-rows", type=int, default=40)
    ap.add_argument("--upto", type=str, default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dump", type=str, default=None,
                    help="also write the optimized HLO text here")
    args = ap.parse_args()
    F = args.frames

    from pixel_art_raytracer_tpu.utils import device as udev

    udev.require_device()

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
    tables = shadow_fast.derive_tables(cfg, scene)
    r = DeferredRenderer(cfg, shadow_impl="pallas", trace_impl="auto",
                         shadow_tables=tables)
    r.configure_for(scene)
    cache = StaticBins(scene.pos, scene.ext, 1, cfg, r.spans)
    anim = AnimationRenderer(r, cfg, static_bins=cache)
    ds = DeviceScene.from_scene(scene, cfg)
    players, lights = anim.light_sweep_states(
        F, scene.pos[0], center=(light.x, light.y, light.z), radius=40)

    @jax.jit
    def run(players, lights):
        return render_states_batched(r, cache, ds, players, lights,
                                     shadow_rows=args.rows,
                                     lane_groups=args.groups,
                                     trace_rows=args.trace_rows,
                                     trace_slot_cap=anim.trace_slot_cap,
                                     upto=args.upto)

    print(f"lowering (F={F} R={args.rows} G={args.groups} "
          f"TR={args.trace_rows} upto={args.upto}) ...", flush=True)
    lowered = run.lower(players, lights)
    print("compiling ...", flush=True)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    byts = ca.get("bytes accessed", 0.0)
    print(f"cost_analysis: flops={flops:.3e} ({flops/F:.3e}/frame), "
          f"bytes accessed={byts:.3e} ({byts/F/1e6:.1f} MB/frame)")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and k != "bytes accessed":
            print(f"  {k}: {ca[k]:.3e}")

    text = compiled.as_text()
    if args.dump:
        pathlib.Path(args.dump).write_text(text)
        print(f"optimized HLO -> {args.dump} ({len(text)} bytes)")
    by_op, biggest = census(text)
    total_out = sum(v[1] for v in by_op.values())
    print(f"\nENTRY instruction census (output bytes ~= HBM buffer "
          f"writes): total {total_out/1e9:.2f} GB "
          f"({total_out/F/1e6:.1f} MB/frame)")
    for op, (n, b) in sorted(by_op.items(), key=lambda kv: -kv[1][1]):
        print(f"  {op:28s} n={n:4d}  out={b/1e6:10.1f} MB "
              f"({b/F/1e3:8.1f} KB/frame)")
    print(f"\ntop {args.top} instructions by output bytes:")
    for b, kind, name, src in biggest[:args.top]:
        print(f"  {b/1e6:9.1f} MB  {kind:20s} {name}")
        if src:
            print(f"               {src[:150]}")


if __name__ == "__main__":
    main()
