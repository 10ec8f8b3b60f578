#!/usr/bin/env python
"""Tunnel-health probe (the CLAUDE.md outage playbook, mechanized).

Prints one line: backend, device, and the median round-trip of a tiny
device readback. Healthy sessions measure ~1-3 ms; ~10x that means the
tunnel is DEGRADED (recent process churn / sustained traffic, PERF.md
sessions 7/9) and perf numbers taken now are not comparable across
sessions. Exits 2 if the backend cannot be reached within the timeout.

The probe body runs in a CHILD process killed with SIGKILL on timeout:
jax backend init blocks inside C (grpc connect) when the tunnel is
DOWN, so an in-process SIGALRM handler never gets to run (observed
round 4: a 150 s alarm never fired across a 300 s hang).
"""
import os
import signal
import subprocess
import sys
import time

_CHILD_FLAG = "--_probe-child"
# r5 s2: a DEGRADED tunnel can take >150 s just to init the backend
# (observed: the 150-s probe printed DOWN while bench.py, with no
# timeout, initialized and ran in the same minute). 300 s separates
# slow-degraded from truly dead.
INIT_TIMEOUT_S = 300.0


def _child() -> int:
    t_init = time.time()
    import jax
    import jax.numpy as jnp
    try:
        dev = jax.devices()[0]
    except Exception as e:  # UNAVAILABLE etc.
        print(f"tunnel: DOWN ({type(e).__name__}: {e})")
        return 2
    init_s = time.time() - t_init
    print(f"# backend init {init_s:.1f}s", flush=True)
    x = jnp.ones((8,), jnp.float32)
    float(jnp.sum(x))  # compile + first transfer outside the probe
    rtts = []
    for _ in range(10):
        t0 = time.time()
        float(jnp.sum(x))
        rtts.append(time.time() - t0)
    rtts.sort()
    med = rtts[len(rtts) // 2] * 1e3
    state = "OK" if med < 10.0 else "DEGRADED"
    print(f"tunnel: {state} ({dev.platform}:{dev.device_kind}, median "
          f"readback RTT {med:.2f} ms, min {rtts[0]*1e3:.2f}, "
          f"max {rtts[-1]*1e3:.2f})")
    return 0 if state == "OK" else 1


def main() -> int:
    if _CHILD_FLAG in sys.argv:
        return _child()
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__),
                             _CHILD_FLAG])
    deadline = time.time() + INIT_TIMEOUT_S
    while time.time() < deadline:
        rc = proc.poll()
        if rc is not None:
            return rc
        time.sleep(0.5)
    proc.send_signal(signal.SIGKILL)  # by PID, never by pattern
    proc.wait()
    print("tunnel: DOWN (backend init timed out)", flush=True)
    return 2


if __name__ == "__main__":
    sys.exit(main())
