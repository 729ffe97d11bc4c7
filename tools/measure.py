"""Autonomous TPU measurement session runner.

Replaces the round-3 pile of one-shot ``r3_measure*.sh`` scripts with one
parameterized entry point.  A session = (optionally) wait for the TPU
tunnel to come up, then run a sequence of named steps, each logged
unbuffered to its own file under ``--log-dir`` (background ``timeout``
pipelines hide interim output — per-step files don't).

Usage:
  python tools/measure.py --log-dir .r4log \\
      "bench=python -u bench.py" \\
      "stages=python -u tools/prof_pipeline.py --stages --frames 64 \\
         --rows 40 --groups 2 --trace-rows 40"

Each positional argument is ``name=shell command``.  Methodology notes
(docs/PERF.md): never compare configs across sequential runs on the axon
tunnel below ~0.07 ms/f — use prof_pipeline's interleaved sweep flags
inside ONE step instead; batch every step of a session into one
invocation so slow remote compiles amortise.
"""

from __future__ import annotations

import argparse
import datetime
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def now() -> str:
    return datetime.datetime.now().strftime("%H:%M:%S")


def wait_for_device(probes: int, probe_timeout: int = 75) -> bool:
    """Bounded-subprocess device probes until the tunnel answers (a downed
    tunnel hangs jax.devices() inside C forever — see utils/device.py)."""
    import time

    for i in range(1, probes + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "from pixel_art_raytracer_tpu.utils.device import "
                 "require_device; print(require_device(%d))"
                 % probe_timeout],
                capture_output=True, text=True, timeout=probe_timeout + 15,
                cwd=REPO)
            plat = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        except subprocess.TimeoutExpired:
            plat = ""
        if plat and plat != "cpu":
            print(f"{now()} device up: {plat} (probe {i})", flush=True)
            return True
        print(f"{now()} probe {i}/{probes}: no device", flush=True)
        time.sleep(60)
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="+",
                    help="name=shell-command, run in order")
    ap.add_argument("--log-dir", default=".r4log")
    ap.add_argument("--wait", action="store_true",
                    help="wait for the TPU tunnel before the first step")
    ap.add_argument("--probes", type=int, default=200,
                    help="max device probes (60 s apart) with --wait")
    ap.add_argument("--step-timeout", type=int, default=3000)
    ap.add_argument("--keep-going", action="store_true",
                    help="run later steps even after a failure")
    args = ap.parse_args()

    log_dir = (REPO / args.log_dir if not pathlib.Path(args.log_dir
               ).is_absolute() else pathlib.Path(args.log_dir))
    log_dir.mkdir(parents=True, exist_ok=True)
    session = log_dir / "session.log"

    def note(msg: str) -> None:
        line = f"{now()} {msg}"
        print(line, flush=True)
        with session.open("a") as f:
            f.write(line + "\n")

    if args.wait and not wait_for_device(args.probes):
        note("device never came up; aborting session")
        sys.exit(1)

    failed = 0
    for step in args.steps:
        name, _, cmd = step.partition("=")
        if not cmd:
            name, cmd = f"step{args.steps.index(step)}", step
        note(f"START {name}: {cmd}")
        with (log_dir / f"{name}.log").open("w") as out:
            rc = subprocess.call(["timeout", str(args.step_timeout),
                                  "bash", "-c", cmd],
                                 stdout=out, stderr=subprocess.STDOUT,
                                 cwd=REPO)
        note(f"END {name} rc={rc}")
        if rc != 0:
            failed += 1
            if not args.keep_going:
                note("stopping (use --keep-going to continue past failures)")
                sys.exit(rc)
    note(f"ALL DONE ({len(args.steps) - failed}/{len(args.steps)} ok)")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
