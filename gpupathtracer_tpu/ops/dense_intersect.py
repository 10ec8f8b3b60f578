"""Dense (coherence-oblivious) ray x triangle intersection on the MXU.

VERDICT r3 #1: the packet traversal kernel's incoherent wall on SMALL
tables is the packet-union saturation — any 2048 diffuse rays in an
enclosed 563-row scene touch the whole tree, so pops/packet cannot fall
and the 460 ns/pop latency chain is the floor. This module tests the
designed escape: skip the tree entirely and intersect a ray block
against EVERY triangle as dense, branch-free, streaming work — cost
independent of coherence, no pops, no syncs.

The triangle test is the precomputed inverse-matrix form (the idea behind
the reference's unused IntersectTriangleArenberg alternate,
src/shaders/common/Geometry.glsl:279-310 — implemented here from the MT
semantics so u/v/t match ops/intersect.py's definitions): with
M = [e1 e2 n] (columns), n = e1 x e2, and rows A, B, C of M^-1,

    t = (C.p0 - C.o) / (C.d)
    u = (A.o - A.p0) + t (A.d)
    v = (B.o - B.p0) + t (B.d)
    hit iff u > 0, v > 0, u + v < 1, 0 < t < t_cur   (strict, as MT)

All six dot products batch into TWO matmuls per (ray block, tri tile):
[R,3] @ [3, 3T] for the direction terms and [R,4] @ [4, 3T] for the
origin terms (the homogeneous row folds the per-triangle constants), so
the MXU does 36 of the ~50 flops/pair and the VPU only runs the ~14-op
epilogue (t, u, v, validity, running argmin). K=3 cannot fill the
128-deep systolic array — the win is CONCURRENCY (MXU runs while the
VPU reduces), not MXU utilization; `use_mxu=False` keeps the dots on
the VPU for the A/B.

Numerical note: same hit SET as Moller-Trumbore in exact arithmetic,
different rounding — equivalence tests use tolerances, and the packet
kernel remains the default everywhere (this path is opt-in via
kernel_bench --dense / cfg.traversal="dense").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def inverse_rows(tri_geom):
    """Rows A/B/C of M^-1 (M = [e1 e2 n]) per triangle, f32.

    Returns (A, B, C, p0) each [T, 3]; degenerate triangles get all-zero
    rows (den = 0 => 0/0 = NaN fails every hit comparison).
    """
    tg = np.asarray(tri_geom, np.float64)  # f64 inverse for stability
    p0, e1, e2 = tg[:, 0:3], tg[:, 3:6], tg[:, 6:9]
    n = np.cross(e1, e2)
    # M columns = (e1, e2, n); det(M) = |n|^2 (n orthogonal to e1, e2).
    det = np.einsum("ij,ij->i", n, n)
    ok = det > 1e-30
    inv_det = np.where(ok, 1.0 / np.maximum(det, 1e-300), 0.0)
    # Rows of M^-1 via the adjugate: A = (e2 x n)/det, B = (n x e1)/det,
    # C = (e1 x e2)/det = n/det.
    A = np.cross(e2, n) * inv_det[:, None]
    B = np.cross(n, e1) * inv_det[:, None]
    C = n * inv_det[:, None]
    A[~ok] = 0.0
    B[~ok] = 0.0
    C[~ok] = 0.0
    return (A.astype(np.float32), B.astype(np.float32),
            C.astype(np.float32), p0.astype(np.float32))


def pack_dense_tris(tri_geom) -> tuple:
    """Precompute the inverse-matrix operands from (p0, e1, e2) rows.

    Returns (wd [3, 3*Tp], wo [4, 3*Tp]) with Tp = T padded to a 512
    multiple; the A/B/C blocks are laid out as [A | B | C] along lanes.
    Degenerate / padding triangles get all-zero columns => den = 0,
    t = inf, never valid.
    """
    T = np.asarray(tri_geom).shape[0]
    A, B, C, p0 = inverse_rows(tri_geom)
    A, B, C, p0 = (x.astype(np.float64) for x in (A, B, C, p0))

    Tp = -(-max(T, 1) // 512) * 512
    wd = np.zeros((3, 3 * Tp), np.float32)
    wo = np.zeros((4, 3 * Tp), np.float32)
    # Direction terms: A.d, B.d, C.d.
    wd[:, 0 * Tp:0 * Tp + T] = A.T
    wd[:, 1 * Tp:1 * Tp + T] = B.T
    wd[:, 2 * Tp:2 * Tp + T] = C.T
    # Origin terms with folded constants: (A.o - A.p0), (B.o - B.p0),
    # (C.p0 - C.o)  — note the C block is NEGATED so t = num/den directly.
    wo[0:3, 0 * Tp:0 * Tp + T] = A.T
    wo[3, 0 * Tp:0 * Tp + T] = -np.einsum("ij,ij->i", A, p0)
    wo[0:3, 1 * Tp:1 * Tp + T] = B.T
    wo[3, 1 * Tp:1 * Tp + T] = -np.einsum("ij,ij->i", B, p0)
    wo[0:3, 2 * Tp:2 * Tp + T] = -C.T
    wo[3, 2 * Tp:2 * Tp + T] = np.einsum("ij,ij->i", C, p0)
    return jnp.asarray(wd), jnp.asarray(wo)


def _kernel(o_ref, d_ref, tmax_ref, act_ref, wd_ref, wo_ref,
            t_out, prim_out, u_out, v_out,
            *, tile: int, n_tiles: int, any_hit: bool, use_mxu: bool,
            early_exit: bool):
    """One ray block [R] per grid step; loop over triangle tiles.

    o/d: [R, 4] (o has homogeneous 1 in col 3); tmax/act: [R, 1];
    wd: [3, 3*Tp]; wo: [4, 3*Tp]. Outputs [R, 1].
    """
    R = o_ref.shape[0]
    Tp = n_tiles * tile

    t_best = tmax_ref[...]                       # [R, 1]
    prim = jnp.full((R, 1), -1, jnp.int32)
    u_best = jnp.zeros((R, 1), jnp.float32)
    v_best = jnp.zeros((R, 1), jnp.float32)
    act = act_ref[...] > 0                       # [R, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, tile), 1)

    o4 = o_ref[...]                              # [R, 4]
    d3 = d_ref[:, 0:3]                           # [R, 3]

    def tile_body(c, carry):
        t_best, prim, u_best, v_best = carry
        base = c * tile
        if use_mxu:
            # Two matmuls: all six dot products for the whole tile.
            # K=3/K=4 — the MXU runs at a sliver of peak here, but it
            # runs CONCURRENTLY with the VPU epilogue of the previous
            # tile, which is the actual bet.
            wd_t = jnp.concatenate(
                [wd_ref[:, pl.ds(k * Tp + base, tile)] for k in range(3)],
                axis=1)                          # [3, 3*tile]
            wo_t = jnp.concatenate(
                [wo_ref[:, pl.ds(k * Tp + base, tile)] for k in range(3)],
                axis=1)                          # [4, 3*tile]
            md = jax.lax.dot_general(
                d3, wd_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # [R, 3*tile]
            mo = jax.lax.dot_general(
                o4, wo_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            da = md[:, 0 * tile:1 * tile]
            db = md[:, 1 * tile:2 * tile]
            dc = md[:, 2 * tile:3 * tile]
            oa = mo[:, 0 * tile:1 * tile]
            ob = mo[:, 1 * tile:2 * tile]
            num = mo[:, 2 * tile:3 * tile]
        else:
            # VPU fallback: the same dots as broadcast muls — 15 extra
            # el-ops/pair on the VPU (the concurrency A/B baseline).
            def dotx(v, ref, k, w):
                acc = None
                for a in range(v.shape[1]):
                    term = v[:, a:a + 1] * ref[a:a + 1,
                                               pl.ds(k * Tp + base, tile)]
                    acc = term if acc is None else acc + term
                return acc
            da = dotx(d3, wd_ref, 0, None)
            db = dotx(d3, wd_ref, 1, None)
            dc = dotx(d3, wd_ref, 2, None)
            oa = dotx(o4, wo_ref, 0, None)
            ob = dotx(o4, wo_ref, 1, None)
            num = dotx(o4, wo_ref, 2, None)

        t = num / dc                              # [R, tile]
        uu = oa + t * da
        vv = ob + t * db
        valid = ((uu > 0.0) & (vv > 0.0) & (uu + vv < 1.0)
                 & (t > 0.0) & (t < t_best) & act)
        if any_hit:
            hit_tile = jnp.sum(jnp.where(valid, 1, 0), axis=1,
                               keepdims=True) > 0   # [R, 1]
            prim = jnp.where(hit_tile & (prim < 0), base, prim)
            # t_best doubles as the live mask: a found hit freezes it.
            t_best = jnp.where(hit_tile, -1.0, t_best)
        else:
            score = jnp.where(valid, t, jnp.inf)
            tmin = jnp.min(score, axis=1, keepdims=True)       # [R, 1]
            improved = tmin < t_best
            idx = jnp.argmin(score, axis=1).reshape(R, 1)      # [R, 1]
            onehot = (lane == idx) & improved & (score < jnp.inf)
            t_best = jnp.where(improved, tmin, t_best)
            prim = jnp.where(improved, base + idx, prim)
            u_best = jnp.where(improved,
                               jnp.sum(jnp.where(onehot, uu, 0.0), axis=1,
                                       keepdims=True), u_best)
            v_best = jnp.where(improved,
                               jnp.sum(jnp.where(onehot, vv, 0.0), axis=1,
                                       keepdims=True), v_best)
        return t_best, prim, u_best, v_best

    if any_hit and early_exit:
        # Whole-block exit once every active ray found a hit: one scalar
        # sync per tile against a tile's worth of vector work.
        def cond(carry):
            c, (t_best, prim, _, _) = carry
            live = jnp.sum(jnp.where(act & (prim < 0), 1, 0))
            return (c < n_tiles) & (live > 0)

        def body(carry):
            c, st = carry
            return c + 1, tile_body(c, st)

        _, (t_best, prim, u_best, v_best) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), (t_best, prim, u_best, v_best)))
    else:
        (t_best, prim, u_best, v_best) = jax.lax.fori_loop(
            0, n_tiles, tile_body, (t_best, prim, u_best, v_best))

    if any_hit:
        t_out[...] = jnp.where(prim >= 0, 0.0, tmax_ref[...])
        prim_out[...] = prim
        u_out[...] = jnp.zeros((R, 1), jnp.float32)
        v_out[...] = jnp.zeros((R, 1), jnp.float32)
    else:
        t_out[...] = t_best
        prim_out[...] = prim
        u_out[...] = u_best
        v_out[...] = v_best


@functools.partial(jax.jit, static_argnames=("any_hit", "use_mxu",
                                             "block", "tile", "interpret",
                                             "early_exit"))
def dense_intersect(wd, wo, o, d, t_max, active, *, any_hit: bool = False,
                    use_mxu: bool = True, block: int = 1024,
                    tile: int = 512, interpret: bool = False,
                    early_exit: bool = True):
    """Brute-force closest/any-hit of [N] rays against the packed table.

    o, d: [N, 3]; t_max, active: [N]. Returns (t, prim, u, v) each [N]
    with the trace_closest contract (prim = -1 miss, t = t_max there).
    N must divide `block`; Tp (from pack_dense_tris) must divide `tile`.
    """
    N = o.shape[0]
    Tp = wd.shape[1] // 3
    if N % block != 0:
        raise ValueError(f"N={N} must be a multiple of block={block}")
    if Tp % tile != 0:
        raise ValueError(f"padded tris {Tp} must divide tile={tile}")
    P = N // block
    n_tiles = Tp // tile

    o4 = jnp.concatenate([o, jnp.ones((N, 1), o.dtype)], axis=1)
    d4 = jnp.concatenate([d, jnp.zeros((N, 1), d.dtype)], axis=1)

    kernel = functools.partial(_kernel, tile=tile, n_tiles=n_tiles,
                               any_hit=any_hit, use_mxu=use_mxu,
                               early_exit=early_exit)
    blk = lambda i: (i, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(P,),
        in_specs=[pl.BlockSpec((block, 4), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, 4), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, 1), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, 1), blk, memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((block, 1), blk, memory_space=pltpu.VMEM)
                   ] * 4,
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)],
        interpret=interpret,
    )(o4, d4, t_max.reshape(N, 1),
      active.astype(jnp.int32).reshape(N, 1), wd, wo)
    t, prim, u, v = (x.reshape(N) for x in outs)
    return t, prim, u, v
