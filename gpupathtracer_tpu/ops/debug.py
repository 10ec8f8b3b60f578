"""Traversal debug instrumentation.

Role of the reference's 4 MB debug SSBO + P-key binary traversal-trail dump
(Renderer.cpp:594-595, 664-678; written by the restart-trail traversal,
BVH.glsl:864-866): per-ray counters of traversal work, dumpable to disk for
offline analysis. Useful for BVH-quality regressions (visits/ray tracks SAH
quality) and for diagnosing packet-divergence hotspots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY
from gpupathtracer_tpu.ops.intersect import mt_intersect
from gpupathtracer_tpu.ops.traverse import _safe_inv, _slab_test


class TraversalTrail(NamedTuple):
    pops: jnp.ndarray        # [N] stack pops per ray
    node_visits: jnp.ndarray  # [N] internal-node expansions
    leaf_tests: jnp.ndarray  # [N] triangle tests
    t: jnp.ndarray           # [N] closest hit distance
    prim: jnp.ndarray        # [N]


def closest_hit_trail(wbvh, tri_geom, o, d, t_max,
                      stack_depth: int = 48, leaf_size: int = 4) -> TraversalTrail:
    """Per-ray instrumented closest-hit (per-lane traversal + counters)."""
    n = o.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    inv_d = _safe_inv(d)
    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)
    state = (stack, sp, t_max.astype(jnp.float32),
             jnp.full((n,), -1, jnp.int32),
             jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
             jnp.zeros((n,), jnp.int32))

    def cond(s):
        return jnp.any(s[1] > 0)

    def body(s):
        stack, sp, t, prim, pops, visits, tests = s
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        entry = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(live, sp - 1, sp)
        pops = pops + live
        is_leaf = live & (entry < 0)
        is_node = live & (entry >= 0)
        visits = visits + is_node

        nidx = jnp.where(is_node, entry, 0)
        bounds = wbvh.child_bounds[nidx]
        centry = wbvh.child_entry[nidx]
        tnear, chit = _slab_test(bounds, o, inv_d, t)
        chit = chit & (centry != INVALID_ENTRY) & is_node[:, None]
        order = jnp.argsort(jnp.where(chit, tnear, jnp.inf), axis=1)
        s_entry = jnp.take_along_axis(centry, order, axis=1)
        s_hit = jnp.take_along_axis(chit, order, axis=1)
        incl = jnp.cumsum(s_hit.astype(jnp.int32), axis=1)
        total = incl[:, -1]
        pos = jnp.where(s_hit, sp[:, None] + total[:, None] - incl,
                        stack_depth)
        for j in range(centry.shape[-1]):
            stack = stack.at[lane, pos[:, j]].set(s_entry[:, j], mode="drop")
        sp = jnp.where(is_node, jnp.minimum(sp + total, stack_depth), sp)

        packed = jnp.where(is_leaf, -(entry + 1), 0)
        first = packed >> 4
        count = packed & 15
        for k in range(leaf_size):
            ok = is_leaf & (k < count)
            tests = tests + ok
            tidx = wbvh.refs[jnp.where(ok, first + k, 0)]
            tt, _, _, th = mt_intersect(tri_geom[tidx], o, d)
            closer = ok & th & (tt < t)
            t = jnp.where(closer, tt, t)
            prim = jnp.where(closer, tidx, prim)
        return stack, sp, t, prim, pops, visits, tests

    _, _, t, prim, pops, visits, tests = jax.lax.while_loop(cond, body, state)
    return TraversalTrail(pops=pops, node_visits=visits, leaf_tests=tests,
                          t=t, prim=prim)


def dump_trails(trail: TraversalTrail, path: str) -> str:
    """Binary dump (role of the P-key debugBuf dump, Renderer.cpp:664-678)."""
    import os
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.stack([np.asarray(trail.pops), np.asarray(trail.node_visits),
                    np.asarray(trail.leaf_tests)], axis=1).astype(np.int32)
    arr.tofile(path)
    return path
