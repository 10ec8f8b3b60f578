"""Batched Moller-Trumbore triangle intersection.

Semantics match the reference's active intersector IntersectTriangleMT
(src/shaders/common/Geometry.glsl:198-225): precomputed edge vectors, strict
inequalities u > 0, u < 1, v > 0, u + v < 1, t in (0, t_closest).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_tri_geom(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """Pack triangle geometry as [T, 9] = (p0, e1, e2) so a leaf fetch is one
    gather (role of the 5-texel RGBA32F packing, Geometry.glsl:130-178)."""
    return np.concatenate([p0, e1, e2], axis=1).astype(np.float32)


def mt_intersect(tri: jnp.ndarray, o: jnp.ndarray, d: jnp.ndarray):
    """Intersect rays with one triangle per lane.

    Args: tri [N, 9] packed (p0, e1, e2); o, d [N, 3].
    Returns (t, u, v, hit): hit is the parametric-validity mask only; callers
    compare t against their current closest.
    """
    p0 = tri[..., 0:3]
    e1 = tri[..., 3:6]
    e2 = tri[..., 6:9]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    idet = 1.0 / det  # may be inf; comparisons below then fail -> miss
    tvec = o - p0
    u = jnp.sum(tvec * pvec, axis=-1) * idet
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * idet
    t = jnp.sum(e2 * qvec, axis=-1) * idet
    hit = (u > 0.0) & (u < 1.0) & (v > 0.0) & (u + v < 1.0) & (t > 0.0)
    return t, u, v, hit


def brute_force_closest_hit(tri_geom: jnp.ndarray, o: jnp.ndarray,
                            d: jnp.ndarray, t_max: jnp.ndarray,
                            block: int = 512):
    """O(T*N) reference traversal (role of IterateAllTriangles,
    src/shaders/common/BVH.glsl:401-408). Used by tests and tiny scenes.

    Returns (t, prim, u, v); prim = -1 on miss.
    """
    T = tri_geom.shape[0]
    pad = (-T) % block
    geom = jnp.pad(tri_geom, ((0, pad), (0, 0)))
    n_blocks = geom.shape[0] // block
    geom = geom.reshape(n_blocks, block, 9)
    base = jnp.arange(block, dtype=jnp.int32)

    def scan_block(carry, inp):
        t_best, prim, u_best, v_best = carry
        blk, blk_idx = inp
        # [B, N] lane-vs-triangle: broadcast triangles over rays.
        tt, uu, vv, hh = jax.vmap(
            lambda tri1: mt_intersect(tri1[None, :], o, d))(blk)
        tri_ids = blk_idx * block + base
        valid = hh & (tri_ids[:, None] < T)
        tt = jnp.where(valid, tt, jnp.inf)
        k = jnp.argmin(tt, axis=0)
        t_new = jnp.take_along_axis(tt, k[None, :], axis=0)[0]
        closer = t_new < t_best
        lane = jnp.arange(o.shape[0])
        t_best = jnp.where(closer, t_new, t_best)
        prim = jnp.where(closer, tri_ids[k], prim)
        u_best = jnp.where(closer, uu[k, lane], u_best)
        v_best = jnp.where(closer, vv[k, lane], v_best)
        return (t_best, prim, u_best, v_best), None

    n = o.shape[0]
    init = (t_max, jnp.full((n,), -1, jnp.int32),
            jnp.zeros((n,), o.dtype), jnp.zeros((n,), o.dtype))
    (t, prim, u, v), _ = jax.lax.scan(
        scan_block, init, (geom, jnp.arange(n_blocks, dtype=jnp.int32)))
    return t, prim, u, v
