"""Bounded device availability probe for remote-backend entry points.

``jax.devices()`` on the remote ("axon") backend blocks *inside C*
(``make_c_api_client``) while the tunnel claims a chip, so a downed tunnel
hangs the caller forever — and an in-process ``SIGALRM`` cannot interrupt
it (Python signal handlers are deferred while the main thread is in a C
call; verified with a faulthandler dump).  The probe therefore runs in a
subprocess with a hard timeout; its device claim is released on exit.
"""

from __future__ import annotations

import subprocess
import sys


def require_device(timeout_s: int = 300) -> str:
    """Return the backend platform name, or raise SystemExit with a clear
    message if no jax device materialises within ``timeout_s``."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        raise SystemExit(
            f"no jax device within {timeout_s}s — TPU tunnel down?  "
            "(probe subprocess hung in the backend claim loop)")
    if proc.returncode != 0:
        raise SystemExit(
            f"device probe failed rc={proc.returncode}:\n"
            f"{proc.stderr.strip()[-500:]}")
    return proc.stdout.strip()
