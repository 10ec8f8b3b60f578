#!/usr/bin/env python
"""Tunnel-health probe (the CLAUDE.md outage playbook, mechanized).

Prints one line: backend, device, and the median round-trip of a tiny
device readback. Healthy sessions measure ~1-3 ms; ~10x that means the
tunnel is DEGRADED (recent process churn / sustained traffic, PERF.md
sessions 7/9) and perf numbers taken now are not comparable across
sessions. Exits 2 if the backend cannot be reached within the timeout.
"""
import sys
import time


def main() -> int:
    import signal

    def _alarm(signum, frame):
        print("tunnel: DOWN (backend init timed out)", flush=True)
        import os
        os._exit(2)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(150)
    try:
        import jax
        import jax.numpy as jnp
        dev = jax.devices()[0]
    except Exception as e:  # UNAVAILABLE etc.
        print(f"tunnel: DOWN ({type(e).__name__}: {e})")
        return 2
    signal.alarm(0)
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


if __name__ == "__main__":
    sys.exit(main())
