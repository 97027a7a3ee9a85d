"""Device preflight: fail-fast detection of a wedged TPU runtime.

Round-2 postmortem (docs/PERF_NOTES.md): a crashed/poisoned axon TPU worker
leaves the service socket accepting connections but never granting the
device, so ANY client — including a trivial ``jnp.ones((8,8)).sum()`` —
blocks forever with 0 CPU. A blocked client in turn holds the grant queue,
so the wedge propagates to every later process. Two rules follow:

  1. Probe the device in a THROWAWAY subprocess with a hard timeout BEFORE
     the main process initialises jax (one process at a time on the chip —
     probing after init would deadlock against ourselves).
  2. Never leave a blocked client running: kill the probe's entire process
     group on timeout.

Used by ``bench.py`` and ``train.py`` (``preflight: true`` config key); also
runnable standalone: ``python tools/preflight.py [timeout_s]``.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

_PROBE_CODE = r"""
import time
t0 = time.time()
import jax
print("PROBE devices:", jax.devices(), flush=True)
import jax.numpy as jnp
v = float(jnp.ones((128, 128)).sum())
assert v == 128.0 * 128.0, v
print("PROBE-OK %.1fs" % (time.time() - t0), flush=True)
"""


def probe_device(timeout_s: float = 240.0, log=None) -> dict:
    """Run a trivial jax program in a subprocess under a hard timeout.

    Returns ``{"ok": bool, "rc": int|None, "seconds": float,
    "detail": str}``. ``ok=False`` with ``rc=None`` means the probe hung
    (wedged runtime) and was killed.

    Call BEFORE the calling process initialises jax: the chip admits one
    process at a time, so a probe launched after init would block on the
    caller itself.
    """
    # The sitecustomize imports jax in EVERY process, so module presence
    # means nothing; what matters is whether this process already holds a
    # device client (then the probe would block on us, not the runtime).
    xb = getattr(sys.modules.get("jax._src.xla_bridge"), "_backends", None)
    if xb and log is not None:
        log("preflight: WARNING jax backend already initialised in this "
            "process - probe may block on this very process")
    t0 = time.time()
    p = subprocess.Popen(
        [sys.executable, "-c", _PROBE_CODE],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    try:
        out, _ = p.communicate(timeout=timeout_s)
        txt = out.decode(errors="replace")
        ok = p.returncode == 0 and "PROBE-OK" in txt
        return {"ok": ok, "rc": p.returncode,
                "seconds": round(time.time() - t0, 1),
                "detail": txt.strip().splitlines()[-1] if txt.strip() else ""}
    except subprocess.TimeoutExpired:
        # Kill the exact process group we started (never by pattern).
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            p.kill()
        p.wait()
        return {"ok": False, "rc": None,
                "seconds": round(time.time() - t0, 1),
                "detail": f"probe hung > {timeout_s:.0f}s - TPU runtime "
                          "wedged (docs/PERF_NOTES.md recovery recipe)"}


def main():
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 240.0
    res = probe_device(timeout)
    print(res)
    sys.exit(0 if res["ok"] else 3)


if __name__ == "__main__":
    main()
