#!/usr/bin/env python
"""Micro-bench the wavefront's per-bounce glue ops at a given width.

Calibrates the ns/lane cost of each non-traversal op in the bounce body
(PERF.md small-scene glue decomposition): threefry RNG, row gathers from
small vs large tables, argsort (compaction transitions / tsort), and a
fused elementwise chain standing in for the shading arithmetic.

Each op runs INNER times inside one jit (fori_loop with a data dependence
on the loop index) so the ~33 ms tunnel sync amortizes away; reported
time is per inner iteration.
"""
import argparse
import statistics
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

INNER = 30


def timed(label, body, init, *, n, reps=5):
    """body(i, carry) -> carry; runs INNER times inside one jit."""
    fn = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, body, c))
    out = fn(init)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[0])
    meds = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(init)
        float(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[0])
        meds.append((time.time() - t0) / INNER)
    m = statistics.median(meds)
    print(f"{label:<44}: {m*1e3:8.3f} ms  ({m/n*1e9:6.1f} ns/lane)",
          flush=True)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=921600)
    args = ap.parse_args()
    n = args.n
    print(f"# width n={n}, inner={INNER}, device={jax.devices()[0]}",
          flush=True)

    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (n, 3))
    idx_small = jax.random.randint(key, (n,), 0, 16)
    idx_big = jax.random.randint(key, (n,), 0, 260000)
    small_tab = jax.random.normal(key, (16, 16))
    big_tab = jax.random.normal(key, (260000, 32))
    fkeys = jax.random.uniform(key, (n,))
    cdf = jnp.linspace(0, 1, 64)

    timed("split + uniform (n, 9) [bounce RNG]",
          lambda i, c: (jax.random.split(c[0])[0],
                        c[1] + jax.random.uniform(c[0], (n, 9)).sum(1)),
          (key, jnp.zeros((n,))), n=n)
    timed("gather [n,16] from 16-row table",
          lambda i, c: c + small_tab[(idx_small + i) & 15].sum(1),
          jnp.zeros((n,)), n=n)
    timed("gather [n,32] from 260k-row table",
          lambda i, c: c + big_tab[(idx_big + i) % 260000].sum(1),
          jnp.zeros((n,)), n=n)
    timed("argsort f32 (compaction/tsort transition)",
          lambda i, c: jnp.argsort(fkeys + c.astype(jnp.float32)
                                   * jnp.float32(1e-9)).astype(jnp.int32),
          jnp.zeros((n,), jnp.int32), n=n)
    timed("gather 10x [n,3] carries by perm",
          lambda i, c: sum(o[(c + k) % n] for k in range(10))[:, 0]
          .astype(jnp.int32) % n,
          jnp.arange(n, dtype=jnp.int32), n=n)

    def chain(i, c):
        y = c
        for _ in range(20):
            y = y * 1.0001 + 0.1
        return y
    timed("20-op fused elementwise chain [n,3]", chain, o, n=n)
    timed("searchsorted into 64-entry CDF",
          lambda i, c: jnp.searchsorted(
              cdf, fkeys + c.astype(jnp.float32) * 1e-9).astype(jnp.int32),
          jnp.zeros((n,), jnp.int32), n=n)


if __name__ == "__main__":
    main()
