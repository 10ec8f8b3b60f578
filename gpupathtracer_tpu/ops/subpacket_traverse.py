"""Sub-packet Pallas traversal: G independent 128-ray packets per kernel.

The single-stack packet kernel (ops/pallas_traverse.py) retires ONE pop per
~460 ns loop iteration, and that cost is G-flat for G <= 16 — the VPU sits
mostly idle while the scalar core walks the pop->sync->push chain (PERF.md
pop-cost ablations). For incoherent rays the packet union also grows with K
(only ~0.61x fewer pops per K halving), so big packets waste traversal and
small packets waste the iteration cost.

This kernel spends one iteration on G pops at once: each VPU sublane row
holds an independent 128-ray sub-packet with its own stacks, and an
iteration pops one entry from EVERY ready stack. Two design points keep the
iteration lean (v1 of this kernel ran both phases every iteration and
measured 3.1 us/iteration, PERF.md):

  * Split node/leaf stacks with PHASE-BATCHED iterations: node pops push
    leaf children onto a per-sub-packet leaf backlog; an iteration runs
    EITHER the 8-child slab phase OR the Moller-Trumbore phase for all
    sub-packets, chosen by a scalar heuristic (drain leaves when backlogs
    build up or nodes run out). Only one phase's vector work is issued per
    iteration.
  * All per-pop scalar traffic is batched: the per-(sub-packet, child) hit
    bits of the whole iteration pack into ceil(G/4) extracts (+ G/8 words
    of nearest-child indices), and child entries are read from SMEM copies
    of the node rows whose DMA latency hides under the slab vector work.

Per-sub-packet row fields are natural [G, 1] slices of the G fetched rows —
no sublane replication anywhere. Stack pointers live in SMEM so both
pl.when phases can update them; the loop carry is just the two totals.

Same semantics as ops/traverse.py closest_hit / any_hit (the if-if
traversal roles of BVH.glsl:634-767 and 769-854); equivalence-tested in
tests/test_subpacket.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY
from gpupathtracer_tpu.ops.pallas_traverse import LANES, VMEM_TABLE_LIMIT

_INVALID = INVALID_ENTRY

# Leaf backlog stack depth and the drain trigger. A node iteration adds at
# most 8 leaves per sub-packet, and the phase heuristic forces a leaf
# iteration once any backlog reaches LEAF_TRIG, so LEAF_DEPTH is never
# exceeded.
LEAF_DEPTH = 32
LEAF_TRIG = LEAF_DEPTH - 8


def _kernel(o_ref, d_ref, inv_ref, tmax_ref, act_ref,
            rows_ref,
            t_out, prim_out, u_out, v_out, stats_out,
            nstack, lstack, nsp_ref, lsp_ref, rowsm, sems,
            *, stack_depth: int, leaf_size: int, any_hit: bool,
            ordered: bool):
    """o/d/inv: [3, G, 128]; tmax/act: [G, 128]; rows_ref: [M, 128] int32.
    nstack: SMEM (G, D); lstack: SMEM (G, LEAF_DEPTH); nsp/lsp: SMEM (G,);
    rowsm: SMEM (G, 128) i32; sems: DMA (G,)."""
    G = o_ref.shape[1]
    sub = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((G, LANES), jnp.float32)
    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0  # node pops
        ctr_ref[1] = 0  # leaf pops

    def pack_word(vals, mask):
        """Sum a masked [G, 1] int vector into one scalar via ONE extract."""
        w = jnp.sum(jnp.where(mask, vals, 0), axis=0, keepdims=True)
        return w[0, 0]

    def sub_mask(scalars):
        """[G, 1] i32 mask from G per-sub-packet scalars."""
        m = jnp.zeros((G, 1), jnp.int32)
        for b in range(G):
            m = jnp.where(sub == b, scalars[b].astype(jnp.int32), m)
        return m

    # Initial stacks: root for every sub-packet that has an active ray.
    av = jnp.sum(act_ref[...].astype(jnp.int32), axis=1, keepdims=True)
    w_act = pack_word(jnp.left_shift(1, sub), av > 0)
    tot_n = jnp.int32(0)
    for b in range(G):
        nstack[b, 0] = 0
        on = jax.lax.shift_right_logical(w_act, b) & 1
        nsp_ref[b] = on
        lsp_ref[b] = 0
        tot_n = tot_n + on

    def fetch_rows(ridx):
        rows_i = jnp.concatenate(
            [rows_ref[pl.ds(ridx[b], 1), :] for b in range(G)], axis=0)
        return rows_i, jax.lax.bitcast_convert_type(rows_i, jnp.float32)

    def body(carry):
        tot_n, tot_l = carry
        nsps = [nsp_ref[b] for b in range(G)]
        lsps = [lsp_ref[b] for b in range(G)]
        hi_l = lsps[0] >= LEAF_TRIG
        for b in range(1, G):
            hi_l = hi_l | (lsps[b] >= LEAF_TRIG)
        leaf_phase = (tot_l > 0) & ((tot_n == 0) | (tot_l >= G) | hi_l)

        act = act_ref[...]
        rays_on = act & (prim_out[...] < 0) if any_hit else act

        # ---- leaf iteration: one MT leaf per backlogged sub-packet --------
        @pl.when(leaf_phase)
        def _():
            haves, ridx, counts = [], [], []
            n_pop = jnp.int32(0)
            for b in range(G):
                h = lsps[b] > 0
                top = jnp.maximum(lsps[b] - 1, 0)
                entry = lstack[b, top]
                packed = -(entry + 1)
                haves.append(h)
                ridx.append(jnp.where(h, packed >> 4, 0))
                counts.append(jnp.where(h, packed & 15, 0))
                lsp_ref[b] = top
                n_pop = n_pop + h
            if stats_out is not None:
                ctr_ref[1] = ctr_ref[1] + n_pop
            rows_i, rows_f = fetch_rows(ridx)

            def bv(l):
                return rows_f[:, l:l + 1]

            leaf_m = sub_mask(haves)
            count_m = sub_mask(counts)
            on_leaf = rays_on & (leaf_m > 0)
            o = o_ref[...]
            d = d_ref[...]
            t_c = t_out[...]
            prim_c = prim_out[...]
            u_c = u_out[...]
            v_c = v_out[...]
            for k in range(leaf_size):
                base = k * 12
                p0 = [bv(base + a) for a in range(3)]
                e1 = [bv(base + 3 + a) for a in range(3)]
                e2 = [bv(base + 6 + a) for a in range(3)]
                pid = rows_i[:, base + 9:base + 10]
                px = d[1] * e2[2] - d[2] * e2[1]
                py = d[2] * e2[0] - d[0] * e2[2]
                pz = d[0] * e2[1] - d[1] * e2[0]
                det = e1[0] * px + e1[1] * py + e1[2] * pz
                idet = 1.0 / det
                tx = o[0] - p0[0]
                ty = o[1] - p0[1]
                tz = o[2] - p0[2]
                uu = (tx * px + ty * py + tz * pz) * idet
                qx = ty * e1[2] - tz * e1[1]
                qy = tz * e1[0] - tx * e1[2]
                qz = tx * e1[1] - ty * e1[0]
                vv = (d[0] * qx + d[1] * qy + d[2] * qz) * idet
                tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0) & (uu + vv < 1.0)
                      & (tt > 0.0) & (tt < t_c) & on_leaf & (k < count_m))
                t_c = jnp.where(ok, tt, t_c)
                prim_c = jnp.where(ok, pid, prim_c)
                u_c = jnp.where(ok, uu, u_c)
                v_c = jnp.where(ok, vv, v_c)
            t_out[...] = t_c
            prim_out[...] = prim_c
            u_out[...] = u_c
            v_out[...] = v_c

            if any_hit:
                # A sub-packet whose live rays are all occluded stops.
                live = jnp.sum((act & (prim_c < 0)).astype(jnp.int32),
                               axis=1, keepdims=True)
                w_done = pack_word(jnp.left_shift(1, sub), live == 0)
                for b in range(G):
                    done = jax.lax.shift_right_logical(w_done, b) & 1 > 0
                    nsp_ref[b] = jnp.where(done, 0, nsp_ref[b])
                    lsp_ref[b] = jnp.where(done, 0, lsp_ref[b])

        # ---- node iteration: one slab pop per ready sub-packet ------------
        @pl.when(jnp.logical_not(leaf_phase) & (tot_n > 0))
        def _():
            haves, ridx = [], []
            n_pop = jnp.int32(0)
            for b in range(G):
                h = nsps[b] > 0
                top = jnp.maximum(nsps[b] - 1, 0)
                haves.append(h)
                ridx.append(jnp.where(h, nstack[b, top], 0))
                nsp_ref[b] = top
                n_pop = n_pop + h
            if stats_out is not None:
                ctr_ref[0] = ctr_ref[0] + n_pop
            cps = []
            for b in range(G):
                cp = pltpu.make_async_copy(rows_ref.at[pl.ds(ridx[b], 1)],
                                           rowsm.at[pl.ds(b, 1)], sems.at[b])
                cps.append(cp)

                @pl.when(haves[b])
                def _(cp=cp):
                    cp.start()

            rows_i, rows_f = fetch_rows(ridx)

            def bv(l):
                return rows_f[:, l:l + 1]

            node_m = sub_mask(haves)
            on_node = rays_on & (node_m > 0)
            o = o_ref[...]
            inv = inv_ref[...]
            t_cur = t_out[...]
            oi = [o[a] * inv[a] for a in range(3)]
            hits = []
            tmins = []
            for j in range(8):
                tmin = None
                tmax_ = None
                for a in range(3):
                    lo = bv(j * 6 + a)
                    hi = bv(j * 6 + 3 + a)
                    t0 = lo * inv[a] - oi[a]
                    t1 = hi * inv[a] - oi[a]
                    lo_t = jnp.minimum(t0, t1)
                    hi_t = jnp.maximum(t0, t1)
                    tmin = lo_t if tmin is None else jnp.maximum(tmin, lo_t)
                    tmax_ = (hi_t if tmax_ is None
                             else jnp.minimum(tmax_, hi_t))
                valid = rows_i[:, 48 + j:49 + j] != _INVALID
                hits.append((tmin <= tmax_) & (tmax_ > 0.0) & (tmin < t_cur)
                            & on_node & valid)
                tmins.append(tmin)

            # Per-(sub-packet, child) hit bits -> ceil(G/4) packed words.
            bits_v = jnp.zeros((G, 1), jnp.int32)
            for j in range(8):
                anyh = jnp.sum(hits[j].astype(jnp.int32), axis=1,
                               keepdims=True)
                bits_v = bits_v | jnp.where(anyh > 0, 1 << j, 0)
            shift8 = 8 * (sub & 3)
            words = [pack_word(jnp.left_shift(bits_v, shift8),
                               (sub >> 2) == c) for c in range((G + 3) // 4)]
            if ordered:
                # Nearest hit child pops first (ordered-descent role,
                # BVH.glsl:700-726): 4-bit indices, 8 sub-packets per word.
                keymin = None
                keys = []
                for j in range(8):
                    kj = jnp.min(jnp.where(hits[j], tmins[j], jnp.inf),
                                 axis=1, keepdims=True)     # [G, 1]
                    keys.append(kj)
                    keymin = kj if keymin is None else jnp.minimum(keymin,
                                                                   kj)
                near_v = jnp.full((G, 1), 8, jnp.int32)
                for j in range(7, -1, -1):
                    near_v = jnp.where((keys[j] == keymin)
                                       & (keymin < jnp.inf), j, near_v)
                shift4 = 4 * (sub & 7)
                nwords = [pack_word(jnp.left_shift(near_v, shift4),
                                    (sub >> 3) == c)
                          for c in range((G + 7) // 8)]

            # Scalar pushes: node children -> nstack, leaf children -> the
            # leaf backlog. Unconditional (bits are 0 for idle sub-packets);
            # only the row-DMA wait branches.
            for b in range(G):
                @pl.when(haves[b])
                def _(b=b):
                    cps[b].wait()

                word = words[b // 4]
                bits = jax.lax.shift_right_logical(word, 8 * (b % 4)) & 255
                nsp = nsp_ref[b]
                lsp = lsp_ref[b]
                nentry = jnp.int32(0)
                npush = jnp.bool_(False)
                if ordered:
                    nw = nwords[b // 8]
                    near = jax.lax.shift_right_logical(nw, 4 * (b % 8)) & 15
                for j in range(8):
                    centry = rowsm[b, 48 + j]
                    pushed = jax.lax.shift_right_logical(bits, j) & 1 > 0
                    if ordered:
                        is_near = j == near
                        nentry = jnp.where(is_near, centry, nentry)
                        npush = npush | (is_near & pushed)
                        pushed = pushed & jnp.logical_not(is_near)
                    to_leaf = pushed & (centry < 0)
                    to_node = pushed & (centry >= 0)
                    nidx = jnp.minimum(nsp, stack_depth - 1)
                    nstack[b, nidx] = jnp.where(to_node, centry,
                                                nstack[b, nidx])
                    nsp = nsp + jnp.where(to_node, 1, 0)
                    lidx = jnp.minimum(lsp, LEAF_DEPTH - 1)
                    lstack[b, lidx] = jnp.where(to_leaf, centry,
                                                lstack[b, lidx])
                    lsp = lsp + jnp.where(to_leaf, 1, 0)
                if ordered:
                    to_leaf = npush & (nentry < 0)
                    to_node = npush & (nentry >= 0)
                    nidx = jnp.minimum(nsp, stack_depth - 1)
                    nstack[b, nidx] = jnp.where(to_node, nentry,
                                                nstack[b, nidx])
                    nsp = nsp + jnp.where(to_node, 1, 0)
                    lidx = jnp.minimum(lsp, LEAF_DEPTH - 1)
                    lstack[b, lidx] = jnp.where(to_leaf, nentry,
                                                lstack[b, lidx])
                    lsp = lsp + jnp.where(to_leaf, 1, 0)
                nsp_ref[b] = nsp
                lsp_ref[b] = lsp

        new_n = nsp_ref[0]
        new_l = lsp_ref[0]
        for b in range(1, G):
            new_n = new_n + nsp_ref[b]
            new_l = new_l + lsp_ref[b]
        return new_n, new_l

    jax.lax.while_loop(lambda c: c[0] + c[1] > 0, body,
                       (tot_n, jnp.int32(0)))
    if stats_out is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0))


@functools.partial(jax.jit, static_argnames=("stack_depth", "leaf_size",
                                             "any_hit", "interpret",
                                             "with_stats", "ordered"))
def traverse_subpacket(rows, o, d, t_max, active,
                       stack_depth: int = 48, leaf_size: int = 4,
                       any_hit: bool = False, interpret: bool = False,
                       with_stats: bool = False, ordered: bool = True):
    """Drop-in for traverse_pallas: o, d [P, K, 3]; K = G*128 becomes G
    independent 128-ray sub-packets per kernel instance. Requires the
    merged table to fit VMEM (no HBM fallback here)."""
    P, K, _ = o.shape
    if K % LANES != 0:
        raise ValueError(f"packet size K={K} must be a multiple of {LANES}")
    if leaf_size > 10:
        raise ValueError("sub-packet kernel reads single-row leaves only")
    G = K // LANES
    if rows.size * rows.dtype.itemsize > VMEM_TABLE_LIMIT:
        raise ValueError("sub-packet kernel requires the node table in "
                         "VMEM; use traverse_pallas for the HBM fallback")
    if rows.dtype != jnp.int32:
        rows = jax.lax.bitcast_convert_type(rows, jnp.int32)

    oT = jnp.transpose(o, (0, 2, 1)).reshape(P, 3, G, LANES)
    dT = jnp.transpose(d, (0, 2, 1)).reshape(P, 3, G, LANES)
    eps = 1e-12
    invT = jnp.where(dT >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dT), eps)

    kernel = functools.partial(_kernel, stack_depth=stack_depth,
                               leaf_size=leaf_size, any_hit=any_hit,
                               ordered=ordered)
    grid = (P,)
    ray_spec = pl.BlockSpec((1, 3, G, LANES), lambda p: (p, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, G, LANES), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM)

    def out_sds(dtype):
        return jax.ShapeDtypeStruct((P, G, LANES), dtype)

    out_specs = [lane_spec] * 4
    out_shape = [out_sds(jnp.float32), out_sds(jnp.int32),
                 out_sds(jnp.float32), out_sds(jnp.float32)]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 1, LANES), lambda p: (p, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((P, 1, LANES), jnp.int32))

    def entry(o_r, d_r, i_r, tm_r, ac_r, rows_r, t_o, p_o, u_o, v_o,
              *rest):
        if with_stats:
            st_o, nst, lst, nsp, lsp, rowsm, sems, ctr = rest
            st_view = (st_o.at[0], ctr)
        else:
            nst, lst, nsp, lsp, rowsm, sems = rest
            st_view = None
        kernel(o_r.at[0], d_r.at[0], i_r.at[0], tm_r.at[0], ac_r.at[0],
               rows_r, t_o.at[0], p_o.at[0], u_o.at[0], v_o.at[0], st_view,
               nst, lst, nsp, lsp, rowsm, sems)

    outs = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=[ray_spec, ray_spec, ray_spec, lane_spec, lane_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((G, stack_depth), jnp.int32),
                        pltpu.SMEM((G, LEAF_DEPTH), jnp.int32),
                        pltpu.SMEM((G,), jnp.int32),
                        pltpu.SMEM((G,), jnp.int32),
                        pltpu.SMEM((G, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA((G,))]
                   + ([pltpu.SMEM((2,), jnp.int32)] if with_stats else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                rows.size * rows.dtype.itemsize
                + 64 * G * LANES * 4 + 4 * 1024 * 1024,
                120 * 1024 * 1024)),
        interpret=interpret,
    )(oT, dT, invT, t_max.reshape(P, G, LANES),
      active.reshape(P, G, LANES), rows)
    t, prim, u, v = outs[:4]
    result = (t.reshape(P, K), prim.reshape(P, K),
              u.reshape(P, K), v.reshape(P, K))
    if with_stats:
        return result + (outs[4][:, 0, 0:2],)
    return result
