"""Pallas packet-traversal kernel — traversal on-core.

The XLA packet path (ops/packet_traverse.py) pays ~40 us of loop overhead
per lockstep iteration and full-width dense work for every pop. This kernel
moves one packet's whole traversal into the TensorCore: the shared stack
lives in SMEM (scalar ops are ~free), rays stay resident in VMEM as [3, K]
vectors, and each pop DMAs exactly one 256-byte merged node/leaf row from
HBM. The grid walks packets sequentially (one TPU core), so throughput =
K / (pops x per-pop time); per-pop time is DMA latency (hidden partially by
the row double buffer) + ~40 [1, K] VPU ops.

Correctness contract: identical results to ops/traverse.py closest_hit
(exact same MT semantics); equivalence-tested in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY

_INVALID = INVALID_ENTRY


def _closest_kernel(o_ref, d_ref, inv_ref, tmax_ref, act_ref,
                    rows_ref,
                    t_out, prim_out, u_out, v_out,
                    stack, rowbuf, sem,
                    *, stack_depth: int, leaf_size: int, any_hit: bool):
    """One packet per grid step.

    o/d/inv: [3, K] VMEM; tmax/act: [1, K]; rows_ref: [M, 128] in ANY/HBM.
    outs: [1, K]. stack: SMEM (D,), rowbuf: VMEM (2, 128), sem: DMA (2,).
    """
    K = o_ref.shape[1]

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((1, K), -1, jnp.int32)
    u_out[...] = jnp.zeros((1, K), jnp.float32)
    v_out[...] = jnp.zeros((1, K), jnp.float32)

    stack[0] = 0  # root node
    any_active = jnp.sum(act_ref[...].astype(jnp.int32)) > 0

    def fetch(slot, ridx):
        return pltpu.make_async_copy(rows_ref.at[pl.ds(ridx, 1)],
                                     rowbuf.at[pl.ds(slot, 1)],
                                     sem.at[slot])

    def body(carry):
        sp, slot = carry
        entry = stack[sp - 1]
        sp = sp - 1
        is_leaf = entry < 0
        packed = jnp.where(is_leaf, -(entry + 1), 0)
        ridx = jnp.where(is_leaf, packed >> 4, jnp.maximum(entry, 0))

        cp = fetch(slot, ridx)
        cp.start()
        cp.wait()
        row = rowbuf[pl.ds(slot, 1), :]          # [1, 128]
        # One vector-wide bitcast (Mosaic rejects scalar bitcasts); integer
        # fields (child entries, prim ids) are read from this view.
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)

        o = o_ref[...]
        d = d_ref[...]
        inv = inv_ref[...]
        act = act_ref[...]
        t_cur = t_out[...]
        rays_on = act & (prim_out[...] < 0) if any_hit else act

        # ---- node phase ------------------------------------------------
        def node_phase(sp):
            new_sp = sp
            # children processed far-to-near would need a sort; v1 pushes in
            # slot order (correct; ordering only affects visit counts).
            for j in range(8):
                lo = [row[0, j * 6 + a] for a in range(3)]
                hi = [row[0, j * 6 + 3 + a] for a in range(3)]
                centry = row_i[0, 48 + j]
                tmin = jnp.full((1, K), -jnp.inf)
                tmax_ = jnp.full((1, K), jnp.inf)
                for a in range(3):
                    t0 = (lo[a] - o[a:a + 1, :]) * inv[a:a + 1, :]
                    t1 = (hi[a] - o[a:a + 1, :]) * inv[a:a + 1, :]
                    tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
                    tmax_ = jnp.minimum(tmax_, jnp.maximum(t0, t1))
                hit = ((tmin <= tmax_) & (tmax_ > 0.0)
                       & (tmin < t_cur) & rays_on)
                pushed = (jnp.sum(hit.astype(jnp.int32)) > 0) \
                    & (centry != _INVALID)
                # push (scalar-guarded SMEM store)
                idx = jnp.minimum(new_sp, stack_depth - 1)
                stack[idx] = jnp.where(pushed, centry, stack[idx])
                new_sp = new_sp + jnp.where(pushed, 1, 0)
            return new_sp

        # ---- leaf phase --------------------------------------------------
        def leaf_phase():
            count = packed & 15
            t_c = t_out[...]
            prim_c = prim_out[...]
            u_c = u_out[...]
            v_c = v_out[...]
            for k in range(leaf_size):
                b = k * 12
                p0 = [row[0, b + a] for a in range(3)]
                e1 = [row[0, b + 3 + a] for a in range(3)]
                e2 = [row[0, b + 6 + a] for a in range(3)]
                pid = row_i[0, b + 9]
                # Moller-Trumbore with scalar triangle, vector rays [1, K]
                px = d[1:2, :] * e2[2] - d[2:3, :] * e2[1]
                py = d[2:3, :] * e2[0] - d[0:1, :] * e2[2]
                pz = d[0:1, :] * e2[1] - d[1:2, :] * e2[0]
                det = e1[0] * px + e1[1] * py + e1[2] * pz
                idet = 1.0 / det
                tx = o[0:1, :] - p0[0]
                ty = o[1:2, :] - p0[1]
                tz = o[2:3, :] - p0[2]
                uu = (tx * px + ty * py + tz * pz) * idet
                qx = ty * e1[2] - tz * e1[1]
                qy = tz * e1[0] - tx * e1[2]
                qz = tx * e1[1] - ty * e1[0]
                vv = (d[0:1, :] * qx + d[1:2, :] * qy + d[2:3, :] * qz) * idet
                tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0) & (uu + vv < 1.0)
                      & (tt > 0.0) & (tt < t_c) & rays_on & (k < count))
                t_c = jnp.where(ok, tt, t_c)
                prim_c = jnp.where(ok, pid, prim_c)
                u_c = jnp.where(ok, uu, u_c)
                v_c = jnp.where(ok, vv, v_c)
            t_out[...] = t_c
            prim_out[...] = prim_c
            u_out[...] = u_c
            v_out[...] = v_c

        sp = jnp.where(is_leaf, sp, node_phase(sp))

        @pl.when(is_leaf)
        def _():
            leaf_phase()

        if any_hit:
            done = jnp.sum((act & (prim_out[...] < 0)).astype(jnp.int32)) == 0
            sp = jnp.where(done, 0, sp)

        return sp, 1 - slot

    sp0 = jnp.where(any_active, 1, 0)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (sp0, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("stack_depth", "leaf_size",
                                             "any_hit", "interpret"))
def traverse_pallas(rows, o, d, t_max, active,
                    stack_depth: int = 48, leaf_size: int = 4,
                    any_hit: bool = False, interpret: bool = False):
    """o, d: [P, K, 3]; t_max, active: [P, K]; rows [M, 128].
    Returns (t, prim, u, v) each [P, K]."""
    P, K, _ = o.shape
    oT = jnp.transpose(o, (0, 2, 1))   # [P, 3, K]
    dT = jnp.transpose(d, (0, 2, 1))
    eps = 1e-12
    invT = jnp.where(dT >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dT), eps)

    kernel = functools.partial(_closest_kernel, stack_depth=stack_depth,
                               leaf_size=leaf_size, any_hit=any_hit)
    grid = (P,)
    ray_spec = pl.BlockSpec((1, 3, K), lambda p: (p, 0, 0),
                            memory_space=pltpu.VMEM)
    # Lane arrays carry a singleton middle dim so the (sublane, lane) block
    # dims equal the array dims (Mosaic block-shape rule).
    lane_spec = pl.BlockSpec((1, 1, K), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM)

    def squeeze_spec(dtype):
        return jax.ShapeDtypeStruct((P, 1, K), dtype)

    t, prim, u, v = pl.pallas_call(
        lambda o_r, d_r, i_r, tm_r, ac_r, rows_r, t_o, p_o, u_o, v_o, st, rb, sm: kernel(
            o_r.at[0], d_r.at[0], i_r.at[0], tm_r.at[0], ac_r.at[0], rows_r,
            t_o.at[0], p_o.at[0], u_o.at[0], v_o.at[0], st, rb, sm),
        grid=grid,
        in_specs=[ray_spec, ray_spec, ray_spec, lane_spec, lane_spec,
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[lane_spec] * 4,
        out_shape=[squeeze_spec(jnp.float32), squeeze_spec(jnp.int32),
                   squeeze_spec(jnp.float32), squeeze_spec(jnp.float32)],
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32),
                        pltpu.VMEM((2, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(oT, dT, invT, t_max[:, None, :], active[:, None, :], rows)
    return (t[:, 0, :], prim[:, 0, :], u[:, 0, :], v[:, 0, :])
