"""Pallas packet-traversal kernel — traversal on-core.

The XLA packet path (ops/packet_traverse.py) pays ~40 us of loop overhead
per lockstep iteration and full-width dense work for every pop. This kernel
moves one packet's whole traversal into the TensorCore: the shared stack
lives in SMEM (scalar ops are ~free), rays stay resident in VMEM shaped
[G, 128] (G vector sublane-rows of 128 lanes — full VPU tiles), and the
merged node/leaf table is pinned whole into VMEM (v5e has ~128 MB) so a pop
is one dynamic-slice row read. Tables too big for VMEM fall back to a
per-pop 512-byte DMA from HBM.

Per-pop structure (the traversal inner loop the reference runs per-thread in
src/shaders/common/BVH.glsl:634-767, redesigned packet-wide for the VPU):

  pop entry (SMEM scalar) -> fetch row -> EITHER node phase (8 child slab
  tests as [G,128] VPU ops, ONE vector->scalar sync returning an 8-bit
  hit mask, scalar push loop) OR leaf phase (up to `leaf_size` unrolled
  Moller-Trumbore tests, no sync). pl.when makes the phases real branches,
  so leaf pops skip the node work entirely and vice versa.

Correctness contract: identical results to ops/traverse.py closest_hit
(exact same MT semantics); equivalence-tested in tests/test_pallas.py and
on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY

_INVALID = INVALID_ENTRY

# Tables up to this many bytes are pinned whole into VMEM (v5e has ~128 MB;
# leave room for ray blocks + outputs). Bigger tables fall back to per-pop
# DMA from HBM/ANY.
VMEM_TABLE_LIMIT = 100 * 1024 * 1024

LANES = 128

# Hand-kept 19-comparator network for 8 keys (the measured round-2 kernel);
# other arities use Batcher's odd-even mergesort (63 comparators at 16).
_NET8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
         (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
         (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
         (3, 4)]


def _sort_net(n: int):
    """Compare-exchange pairs sorting n keys (n a power of 2)."""
    if n == 8:
        return _NET8
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (p * 2) == (i + j + k) // (p * 2):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def _kernel(root_ref, o_ref, d_ref, inv_ref, tmax_ref, act_ref,
            rows_ref,
            t_out, prim_out, u_out, v_out, stats_out,
            stack, sp_ref, rowbuf, sem,
            *, stack_depth: int, leaf_size: int, any_hit: bool,
            table_in_vmem: bool, ordered: bool, arity: int = 8):
    """One packet per grid step.

    root_ref: SMEM (P,) initial stack entry per packet (0 = whole-tree
    root; treelet binning passes subtree roots, incl. leaf-encoded
    entries).
    o/d/inv: [3, G, 128] VMEM; tmax/act: [G, 128]; rows_ref: [M, 128]
    (VMEM when table_in_vmem else ANY). outs: [G, 128]. stack: SMEM (D,),
    sp_ref: SMEM (1,), rowbuf: VMEM (2, 128), sem: DMA (2,).
    """
    G = o_ref.shape[1]
    tris_per_row = LANES // 12
    R = -(-leaf_size // tris_per_row)  # rows per leaf block (>1: fat leaves)

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((G, LANES), jnp.float32)

    root = root_ref[pl.program_id(0)]
    stack[0] = root
    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0  # node pops
        ctr_ref[1] = 0  # leaf pops
    any_active = ((jnp.sum(act_ref[...].astype(jnp.int32)) > 0)
                  & (root != _INVALID))

    def fetch(slot, ridx):
        # R-row blocks never read out of bounds: nodes precede the
        # R-aligned leaf region, which holds >= R rows.
        return pltpu.make_async_copy(rows_ref.at[pl.ds(ridx, R)],
                                     rowbuf.at[pl.ds(slot * R, R)],
                                     sem.at[slot])

    def body(carry):
        sp, slot = carry
        entry = stack[sp - 1]
        sp = sp - 1
        is_leaf = entry < 0
        packed = jnp.where(is_leaf, -(entry + 1), 0)
        ridx = jnp.where(is_leaf, packed >> 4, jnp.maximum(entry, 0))

        if table_in_vmem:
            rowR = rows_ref[pl.ds(ridx, R), :]   # [R, 128]
        else:
            cp = fetch(slot, ridx)
            cp.start()
            cp.wait()
            rowR = rowbuf[pl.ds(slot * R, R), :]
        row = rowR[0:1] if R > 1 else rowR       # [1, 128]
        # One vector-wide bitcast (Mosaic rejects scalar bitcasts); integer
        # fields (child entries, prim ids) are read from this view.
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)

        act = act_ref[...]
        rays_on = act & (prim_out[...] < 0) if any_hit else act

        sp_ref[0] = sp
        if stats_out is not None:
            which = jnp.where(is_leaf, 1, 0)
            ctr_ref[which] = ctr_ref[which] + 1

        # Field values broadcast vector-side as [G, 1] slices of the
        # sublane-replicated row: lane extracts to the scalar unit cost ~10x
        # more than in-vector broadcasts, and the values are only ever used
        # vector-side. (Mosaic can't broadcast [1,1]->[G,128] in one op —
        # "Broadcast in both sublanes and lanes" — so replicate sublanes
        # once per pop, then every field is a lane-only broadcast. The
        # replication uses pltpu.repeat, which XLA can't fold back into a
        # [1,1] broadcast the way it does with jnp.broadcast_to+slice.)
        if G > 1:
            rowG = pltpu.repeat(row, G, axis=0)
            rowGi = pltpu.repeat(row_i, G, axis=0)
        else:
            rowG, rowGi = row, row_i

        def bv(l):
            return rowG[:, l:l + 1]

        def bvi(l):
            return rowGi[:, l:l + 1]

        # ---- node phase --------------------------------------------------
        @pl.when(jnp.logical_not(is_leaf))
        def _():
            o = o_ref[...]
            inv = inv_ref[...]
            t_cur = t_out[...]
            on = rays_on
            # o*inv is child-independent: hoisted out of the 8-child loop.
            oi = [o[a] * inv[a] for a in range(3)]
            hits = []
            tmins = []
            for j in range(arity):
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
                    tmax_ = hi_t if tmax_ is None else jnp.minimum(tmax_, hi_t)
                hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                            & (tmin < t_cur) & on)
                tmins.append(tmin)
            if not ordered:
                # ONE vector->scalar sync: arity-bit packed any-hit mask.
                # (Keep intermediates rank >= 2 — rank-1 crashes Mosaic.)
                h8 = jnp.stack(hits).astype(jnp.int32)      # [A, G, 128]
                cnt = jnp.sum(jnp.sum(h8, axis=2), axis=1,
                              keepdims=True)                # [A, 1]
                w = jnp.left_shift(1, jax.lax.broadcasted_iota(
                    jnp.int32, (arity, 1), 0))
                bits = jnp.sum(jnp.where(cnt > 0, w, 0))    # scalar
                # Scalar push loop (entries from the int row view).
                new_sp = sp
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    pushed = (jax.lax.shift_right_logical(bits, j) & 1 > 0) \
                        & (centry != _INVALID)
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp
            else:
                # Near-first ordering: packet-min entry distance per child
                # (inf when no ray hits), children pushed far-to-near so the
                # nearest pops first — t_cur shrinks sooner and prunes more
                # (role of the ordered descent in BVH.glsl:700-726).
                h8 = jnp.stack(hits)                        # [A, G, 128]
                t8 = jnp.stack(tmins)
                keyv = jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                               axis=1, keepdims=True)       # [A, 1]
                keys = [keyv[j, 0] for j in range(arity)]   # A extracts
                pairs = []
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    k = jnp.where(centry == _INVALID, jnp.inf, keys[j])
                    pairs.append((k, centry))
                # Batcher-style fixed network, DESCENDING by key (nearest
                # pushed last = popped first).
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb  # descending
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
                new_sp = sp
                for k, centry in pairs:
                    pushed = k < jnp.inf
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp

        # ---- leaf phase --------------------------------------------------
        @pl.when(is_leaf)
        def _():
            o = o_ref[...]
            d = d_ref[...]
            count = packed & 15
            t_c = t_out[...]
            prim_c = prim_out[...]
            u_c = u_out[...]
            v_c = v_out[...]
            # Sublane-replicated views of the block's extra rows (row 0
            # reuses the shared node-phase broadcast).
            rowGs, rowGis = [rowG], [rowGi]
            for r in range(1, R):
                rr = rowR[r:r + 1]
                rri = jax.lax.bitcast_convert_type(rr, jnp.int32)
                rowGs.append(pltpu.repeat(rr, G, axis=0) if G > 1 else rr)
                rowGis.append(pltpu.repeat(rri, G, axis=0) if G > 1 else rri)
            for k in range(leaf_size):
                r, b = divmod(k, tris_per_row)
                b *= 12
                rG, rGi = rowGs[r], rowGis[r]
                p0 = [rG[:, b + a:b + a + 1] for a in range(3)]
                e1 = [rG[:, b + 3 + a:b + 4 + a] for a in range(3)]
                e2 = [rG[:, b + 6 + a:b + 7 + a] for a in range(3)]
                pid = rGi[:, b + 9:b + 10]
                # Moller-Trumbore: scalar triangle vs [G, 128] rays.
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
                      & (tt > 0.0) & (tt < t_c) & rays_on & (k < count))
                t_c = jnp.where(ok, tt, t_c)
                prim_c = jnp.where(ok, pid, prim_c)
                u_c = jnp.where(ok, uu, u_c)
                v_c = jnp.where(ok, vv, v_c)
            t_out[...] = t_c
            prim_out[...] = prim_c
            u_out[...] = u_c
            v_out[...] = v_c

        sp = sp_ref[0]
        if any_hit:
            done = jnp.sum((act & (prim_out[...] < 0))
                           .astype(jnp.int32)) == 0
            sp = jnp.where(done, 0, sp)

        return sp, 1 - slot

    sp0 = jnp.where(any_active, 1, 0)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (sp0, jnp.int32(0)))
    if stats_out is not None:
        # Publish the SMEM counters as lanes 0/1 of a [1, 128] VMEM row.
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0))


def _kernel_cluster(root_ref, o_ref, d_ref, inv_ref, tmax_ref, act_ref,
                    rows_ref, cl_ref,
                    t_out, prim_out, u_out, v_out, stats_out,
                    stack, sp_ref, clbuf, sem, kstack, tmax_pk,
                    *, stack_depth: int, tc: int, any_hit: bool,
                    table_in_vmem: bool, cl_in_vmem: bool, ordered: bool,
                    arity: int = 8, pop_skip: bool = False):
    """Single-pop traversal with DENSE CLUSTER leaves on the MXU.

    Node phase = _kernel's (8-child slab tests, ordered or packed-bits
    push). Leaf phase: the entry encodes a CLUSTER index (bvh/cluster.py);
    its [8, 3*tc] inverse-matrix block is fetched and the whole packet is
    intersected against all tc triangles as two K=3/K=4 matmuls per
    128-ray tile (MXU) + a ~20-op VPU epilogue with a running argmin —
    one pop replaces the subtree's ~tc/leaf_size Moller-Trumbore leaf
    pops and its internal-node pops (VERDICT r3 #1/#3; the reference's
    unused Arenberg form, src/shaders/common/Geometry.glsl:279-310).

    t-pruned pop SKIP (pop_skip=True, ordered closest only): pushes
    record the packet-min entry distance in a parallel key stack; tmax_pk
    tracks an upper bound of the packet's per-ray t (one reduce+extract
    per cluster pop). Exact and conservative — but MEASURED 0 skips on
    both sponza (open scene: any miss ray pins the bound at t_max) and
    bathroom (the slowest ray's t exceeds every cluster's entry key)
    incoherent sets (tools/cluster_pops.py, PERF.md round-4 s2), so the
    default is OFF: the refresh sync would cost ~0.1-0.2 us per cluster
    pop for nothing. Kept behind the flag per the perf protocol.

    prim_out is cluster-LOCAL: cidx * tc + slot. Callers remap through
    cluster_refs (one [N] gather per trace).
    """
    G = o_ref.shape[1]

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((G, LANES), jnp.float32)

    root = root_ref[pl.program_id(0)]
    stack[0] = root
    if pop_skip:
        kstack[0] = -jnp.inf  # root always runs
        tmax_pk[0] = jnp.max(tmax_ref[...])
    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0  # node pops
        ctr_ref[1] = 0  # cluster pops RUN
        ctr_ref[2] = 0  # cluster pops SKIPPED (t-pruned)
    any_active = ((jnp.sum(act_ref[...].astype(jnp.int32)) > 0)
                  & (root != _INVALID))

    def body(carry):
        sp, slot = carry
        entry = stack[sp - 1]
        ekey = kstack[sp - 1] if pop_skip else None
        sp = sp - 1
        is_leaf = entry < 0
        packed = jnp.where(is_leaf, -(entry + 1), 0)
        cidx = packed >> 4
        nidx = jnp.maximum(entry, 0)
        # Skip decision (scalar): a cluster whose packet-min entry
        # distance is beyond every ray's current t cannot improve a hit.
        if pop_skip:
            run_cl = jnp.logical_not(is_leaf) | (ekey < tmax_pk[0])
        else:
            run_cl = True

        act = act_ref[...]
        rays_on = act & (prim_out[...] < 0) if any_hit else act

        sp_ref[0] = sp
        if stats_out is not None:
            which = jnp.where(is_leaf,
                              1 if not pop_skip
                              else jnp.where(run_cl, 1, 2), 0)
            ctr_ref[which] = ctr_ref[which] + 1

        # ---- node phase (identical to _kernel's) -------------------------
        @pl.when(jnp.logical_not(is_leaf))
        def _():
            row = rows_ref[pl.ds(nidx, 1), :]        # top trees stay tiny
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rowG = pltpu.repeat(row, G, axis=0) if G > 1 else row

            def bv(l):
                return rowG[:, l:l + 1]

            o = o_ref[...]
            inv = inv_ref[...]
            t_cur = t_out[...]
            on = rays_on
            oi = [o[a] * inv[a] for a in range(3)]
            hits = []
            tmins = []
            for j in range(arity):
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
                    tmax_ = hi_t if tmax_ is None else jnp.minimum(tmax_,
                                                                   hi_t)
                hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                            & (tmin < t_cur) & on)
                tmins.append(tmin)
            if not ordered:
                h8 = jnp.stack(hits).astype(jnp.int32)      # [A, G, 128]
                cnt = jnp.sum(jnp.sum(h8, axis=2), axis=1,
                              keepdims=True)                # [A, 1]
                w = jnp.left_shift(1, jax.lax.broadcasted_iota(
                    jnp.int32, (arity, 1), 0))
                bits = jnp.sum(jnp.where(cnt > 0, w, 0))    # scalar
                new_sp = sp
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    pushed = (jax.lax.shift_right_logical(bits, j) & 1 > 0) \
                        & (centry != _INVALID)
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    if pop_skip:
                        # No keys on the unordered path: never skip.
                        kstack[idx] = jnp.where(pushed, -jnp.inf,
                                                kstack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp
            else:
                h8 = jnp.stack(hits)                        # [A, G, 128]
                t8 = jnp.stack(tmins)
                keyv = jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                               axis=1, keepdims=True)       # [A, 1]
                keys = [keyv[j, 0] for j in range(arity)]
                pairs = []
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    k = jnp.where(centry == _INVALID, jnp.inf, keys[j])
                    pairs.append((k, centry))
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb  # descending: nearest pushed last
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
                new_sp = sp
                for k, centry in pairs:
                    pushed = k < jnp.inf
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    if pop_skip:
                        kstack[idx] = jnp.where(pushed, k, kstack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp

        # ---- cluster phase ------------------------------------------------
        @pl.when((is_leaf & run_cl) if pop_skip else is_leaf)
        def _():
            if cl_in_vmem:
                blk = cl_ref[pl.ds(cidx * 8, 8), :]      # [8, 3*tc]
            else:
                cp = pltpu.make_async_copy(cl_ref.at[pl.ds(cidx * 8, 8)],
                                           clbuf, sem)
                cp.start()
                cp.wait()
                blk = clbuf[...]
            wd = blk[0:3, :]                             # [3, 3*tc]
            wo4 = blk[3:7, :]                            # [4, 3*tc]
            # Winner-capture operand: the A and B rows + folded constants
            # (wo4's first two thirds) — a one-hot matmul then returns the
            # winning triangle's coefficients so u/v are RECOMPUTED per
            # lane (~22 ops on [1,128]) instead of captured via two
            # [tc,128] one-hot sum passes (~20% of the epilogue).
            capop = jnp.concatenate([wo4[:, 0:tc], wo4[:, tc:2 * tc]],
                                    axis=0)              # [8, tc]
            o = o_ref[...]
            d = d_ref[...]
            ones = jnp.ones((1, LANES), jnp.float32)
            subi = jax.lax.broadcasted_iota(jnp.int32, (tc, LANES), 0)
            dn = (((0,), (0,)), ((), ()))  # contract sublane dim of both
            dnc = (((1,), (0,)), ((), ()))
            for g in range(G):
                dg = d[:, g, :]                          # [3, 128]
                og = o[:, g, :]
                og4 = jnp.concatenate([og, ones], axis=0)   # [4, 128]
                # All six dot products for every (ray, tri) pair in two
                # matmuls; K=3/4 caps MXU utilization (~2%) — the win is
                # pop-count collapse + MXU/VPU concurrency, not peak.
                md = jax.lax.dot_general(
                    wd, dg, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                mo = jax.lax.dot_general(
                    wo4, og4, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                da, db, dc = md[0:tc], md[tc:2 * tc], md[2 * tc:3 * tc]
                oa, ob, num = mo[0:tc], mo[tc:2 * tc], mo[2 * tc:3 * tc]
                t = num / dc                             # [tc, 128]
                uu = oa + t * da
                vv = ob + t * db
                tb = t_out[g:g + 1, :]                   # [1, 128]
                on_g = rays_on[g:g + 1, :]
                # Padding columns: dc = num = 0 => t = NaN, all False.
                # t<tb and the activity mask apply to the [1,128] REDUCED
                # result, not per (ray, tri) pair: the argmin over t picks
                # the same winner either way (if min t >= tb then no
                # closer triangle existed at all), and masked lanes never
                # write — two fewer [tc,128] passes per pop.
                valid = ((uu > 0.0) & (vv > 0.0) & (uu + vv < 1.0)
                         & (t > 0.0))
                score = jnp.where(valid, t, jnp.inf)
                tmin = jnp.min(score, axis=0, keepdims=True)   # [1, 128]
                improved = (tmin < tb) & on_g
                if any_hit:
                    # Occlusion queries: every consumer reads only
                    # prim >= 0 (traverse.py trace_occluded et al.), so
                    # the winner argmin / one-hot capture matmul / u,v
                    # recompute below are dead work — skip them. Roughly
                    # halves the epilogue passes on shadow pops.
                    prim_out[g:g + 1, :] = jnp.where(
                        improved, cidx * tc, prim_out[g:g + 1, :])
                    continue
                # Winner selection: rows with score == tmin are valid by
                # construction when tmin is finite (invalid rows hold
                # inf); all-invalid columns select every row but the
                # write is masked by `improved`.
                sel = score <= tmin
                idx = jnp.min(jnp.where(sel, subi, tc), axis=0,
                              keepdims=True)             # [1, 128]
                onef = jnp.where(sel & (subi == idx), 1.0, 0.0)
                cap = jax.lax.dot_general(
                    capop, onef, dnc,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [8, 128]
                da_w = (cap[0:1] * dg[0:1] + cap[1:2] * dg[1:2]
                        + cap[2:3] * dg[2:3])
                oa_w = (cap[0:1] * og[0:1] + cap[1:2] * og[1:2]
                        + cap[2:3] * og[2:3] + cap[3:4])
                db_w = (cap[4:5] * dg[0:1] + cap[5:6] * dg[1:2]
                        + cap[6:7] * dg[2:3])
                ob_w = (cap[4:5] * og[0:1] + cap[5:6] * og[1:2]
                        + cap[6:7] * og[2:3] + cap[7:8])
                uw = oa_w + tmin * da_w
                vw = ob_w + tmin * db_w
                t_out[g:g + 1, :] = jnp.where(improved, tmin, tb)
                prim_out[g:g + 1, :] = jnp.where(
                    improved, cidx * tc + idx, prim_out[g:g + 1, :])
                u_out[g:g + 1, :] = jnp.where(improved, uw,
                                              u_out[g:g + 1, :])
                v_out[g:g + 1, :] = jnp.where(improved, vw,
                                              v_out[g:g + 1, :])
            # Refresh the packet t bound (one reduce+extract against the
            # ~us epilogue just paid; enables skipping later clusters).
            if pop_skip and not any_hit:
                tmax_pk[0] = jnp.min(jnp.stack(
                    [tmax_pk[0], jnp.max(t_out[...])]))

        sp = sp_ref[0]
        if any_hit:
            done = jnp.sum((act & (prim_out[...] < 0))
                           .astype(jnp.int32)) == 0
            sp = jnp.where(done, 0, sp)

        return sp, 1 - slot

    sp0 = jnp.where(any_active, 1, 0)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (sp0, jnp.int32(0)))
    if stats_out is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0)
                             + jnp.where(lane == 2, ctr_ref[2], 0))


def _kernel_multi(root_ref, o_ref, d_ref, inv_ref, tmax_ref, act_ref,
                  rows_ref,
                  t_out, prim_out, u_out, v_out, stats_out,
                  stack, sp_ref, rowbuf, sem,
                  *, stack_depth: int, leaf_size: int, any_hit: bool,
                  table_in_vmem: bool, ordered: bool, multi_pop: int,
                  arity: int = 8):
    """Q-pop variant of _kernel: each iteration pops up to Q = multi_pop
    entries from the SAME shared stack and overlaps their latency chains.

    The 460 ns single-pop cost is the serial pop->fetch->sync->push chain,
    not instruction count (PERF.md sentinel-push ablation), and it is
    G-flat — the VPU idles during a pop. Here ALL Q pops' vector work
    (8-child slabs AND leaf Moller-Trumbore) is issued unconditionally up
    front, masked by scalar node/leaf flags (pl.when branches would
    serialize the regions); the Q scalar push blocks then run while later
    pops' vector results are still in flight. Unlike the sub-packet kernel
    (independent stacks -> 2.3x pop inflation) the shared stack keeps the
    pop COUNT identical to single-pop; only the retire rate changes.
    """
    G = o_ref.shape[1]
    Q = multi_pop

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((G, LANES), jnp.float32)

    root = root_ref[pl.program_id(0)]
    stack[0] = root
    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0
        ctr_ref[1] = 0
        ctr_ref[2] = 0  # stack-overflow events (pushes clamped at the top)

    any_active = ((jnp.sum(act_ref[...].astype(jnp.int32)) > 0)
                  & (root != _INVALID))

    def body(carry):
        sp0, slot = carry
        # ---- pop up to Q entries (scalar) --------------------------------
        entries, metas = [], []
        sps = sp0
        for q in range(Q):
            have = sps > 0
            e = jnp.where(have, stack[jnp.maximum(sps - 1, 0)], _INVALID)
            sps = jnp.where(have, sps - 1, sps)
            is_leaf = e < 0
            is_node = (e >= 0) & (e != _INVALID)
            packed = jnp.where(is_leaf, -(e + 1), 0)
            ridx = jnp.where(is_leaf, packed >> 4, jnp.where(is_node, e, 0))
            entries.append(e)
            metas.append((is_node, is_leaf, packed, ridx))
        sp_ref[0] = sps
        if stats_out is not None:
            n_node = jnp.int32(0)
            n_leaf = jnp.int32(0)
            for is_node, is_leaf, _, _ in metas:
                n_node = n_node + is_node.astype(jnp.int32)
                n_leaf = n_leaf + is_leaf.astype(jnp.int32)
            ctr_ref[0] = ctr_ref[0] + n_node
            ctr_ref[1] = ctr_ref[1] + n_leaf

        # ---- fetch all Q rows --------------------------------------------
        rows_q = []
        for q, (is_node, is_leaf, packed, ridx) in enumerate(metas):
            if table_in_vmem:
                row = rows_ref[pl.ds(ridx, 1), :]
            else:
                cp = pltpu.make_async_copy(rows_ref.at[pl.ds(ridx, 1)],
                                           rowbuf.at[pl.ds(q, 1)],
                                           sem.at[q])
                cp.start()
                rows_q.append(cp)
                continue
            rows_q.append(row)
        if not table_in_vmem:
            waited = []
            for q, cp in enumerate(rows_q):
                cp.wait()
                waited.append(rowbuf[pl.ds(q, 1), :])
            rows_q = waited

        act = act_ref[...]
        rays_on = act & (prim_out[...] < 0) if any_hit else act
        o = o_ref[...]
        d = d_ref[...]
        inv = inv_ref[...]
        oi = [o[a] * inv[a] for a in range(3)]
        t_entry = t_out[...]  # pre-iteration t for node pruning

        views = []
        for row in rows_q:
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            if G > 1:
                rowG = pltpu.repeat(row, G, axis=0)
            else:
                rowG = row
            views.append((row_i, rowG))

        # ---- node slab tests for ALL pops (masked, unconditional) --------
        keyvs = []
        for q, (is_node, is_leaf, packed, ridx) in enumerate(metas):
            row_i, rowG = views[q]

            def bv(l, rowG=rowG):
                return rowG[:, l:l + 1]

            on = rays_on & is_node
            hits, tmins = [], []
            for j in range(arity):
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
                hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                            & (tmin < t_entry) & on)
                tmins.append(tmin)
            h8 = jnp.stack(hits)
            t8 = jnp.stack(tmins)
            keyvs.append(jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                                 axis=1, keepdims=True))  # [A, 1]

        # ---- scalar pushes per pop (overlaps later pops' vector work) ----
        new_sp = sps
        for q, (is_node, is_leaf, packed, ridx) in enumerate(metas):
            row_i, _ = views[q]
            keyv = keyvs[q]
            keys = [keyv[j, 0] for j in range(arity)]
            pairs = []
            for j in range(arity):
                centry = row_i[0, 6 * arity + j]
                k = jnp.where(centry == _INVALID, jnp.inf, keys[j])
                pairs.append((k, centry))
            if ordered:
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb  # descending: nearest pushed last
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
            for k, centry in pairs:
                pushed = k < jnp.inf
                idx = jnp.minimum(new_sp, stack_depth - 1)
                stack[idx] = jnp.where(pushed, centry, stack[idx])
                if stats_out is not None:
                    # Q-pop's depth bound is the single-pop analytic bound
                    # scaled by Q (LIFO pops keep at most Q concurrent DFS
                    # branches); latch any clamped push so silent hit loss
                    # is visible in the A/B harness (ADVICE r2).
                    ctr_ref[2] = ctr_ref[2] + jnp.where(
                        pushed & (new_sp >= stack_depth), 1, 0)
                new_sp = new_sp + jnp.where(pushed, 1, 0)

        # ---- leaf Moller-Trumbore for ALL pops (masked, chained) ---------
        t_c = t_out[...]
        prim_c = prim_out[...]
        u_c = u_out[...]
        v_c = v_out[...]
        for q, (is_node, is_leaf, packed, ridx) in enumerate(metas):
            row_i, rowG = views[q]
            rowGi = jax.lax.bitcast_convert_type(rowG, jnp.int32)

            def bv(l, rowG=rowG):
                return rowG[:, l:l + 1]

            count = packed & 15
            on_leaf = rays_on & is_leaf
            for k in range(leaf_size):
                b = k * 12
                p0 = [bv(b + a) for a in range(3)]
                e1 = [bv(b + 3 + a) for a in range(3)]
                e2 = [bv(b + 6 + a) for a in range(3)]
                pid = rowGi[:, b + 9:b + 10]
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
                      & (tt > 0.0) & (tt < t_c) & on_leaf & (k < count))
                t_c = jnp.where(ok, tt, t_c)
                prim_c = jnp.where(ok, pid, prim_c)
                u_c = jnp.where(ok, uu, u_c)
                v_c = jnp.where(ok, vv, v_c)
        t_out[...] = t_c
        prim_out[...] = prim_c
        u_out[...] = u_c
        v_out[...] = v_c

        sp = new_sp
        if any_hit:
            done = jnp.sum((act & (prim_c < 0)).astype(jnp.int32)) == 0
            sp = jnp.where(done, 0, sp)
        return sp, 1 - slot

    sp0 = jnp.where(any_active, 1, 0)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (sp0, jnp.int32(0)))
    if stats_out is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0)
                             + jnp.where(lane == 2, ctr_ref[2], 0))


def _kernel_ilv(root_ref, o_ref, d_ref, inv_ref, tmax_ref, act_ref,
                rows_ref,
                t_out, prim_out, u_out, v_out, stats_out,
                stack, sp_ref, kbuf, rowbuf, sem,
                *, stack_depth: int, leaf_size: int, any_hit: bool,
                table_in_vmem: bool, ordered: bool, interleave: int,
                arity: int = 8):
    """W = interleave independent FULL-SIZE packets co-scheduled per grid
    step, one branched pop each per iteration.

    Why this beats both prior attempts (PERF.md): the single-pop kernel's
    460 ns is the serial pop->vector->sync->push latency chain with the VPU
    ~50% idle at G=16; multi_pop overlapped Q pops of the SAME packet but
    had to issue BOTH phases' vector work unconditionally (VPU saturation),
    and the sub-packet kernel reached ~190 ns/pop but paid 2.3x more pops
    from 128-ray unions. Here each packet keeps the full-K union sharing
    AND each pop issues only its own phase (pl.when branches); the node
    phase is split into two regions — slab tests writing the 8 child keys
    to a VMEM scratch, then a separate sync+push region — so the scalar
    core issues ALL W packets' vector work before the first key extract
    stalls on it. Independent chains overlap; the VPU fills up.

    Layouts: o/d/inv [W, 3, G, 128]; tmax/act/outs [W, G, 128];
    stack SMEM (W, D); sp_ref SMEM (W,); kbuf VMEM (8*W, 1) f32;
    rowbuf VMEM (max(2, W), 128); sem DMA (max(2, W),).
    """
    W = interleave
    G = o_ref.shape[2]

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((W, G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((W, G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((W, G, LANES), jnp.float32)

    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0  # node pops (all W packets)
        ctr_ref[1] = 0  # leaf pops

    total0 = jnp.int32(0)
    for w in range(W):
        root = root_ref[pl.program_id(0) * W + w]
        stack[w, 0] = root
        act_w = jnp.sum(act_ref[w].astype(jnp.int32)) > 0
        on = ((act_w & (root != _INVALID))).astype(jnp.int32)
        sp_ref[w] = on
        total0 = total0 + on

    def body(total):
        del total
        haves, leafs, packeds, ridxs = [], [], [], []
        n_node = jnp.int32(0)
        n_leaf = jnp.int32(0)
        for w in range(W):
            sp = sp_ref[w]
            have = sp > 0
            top = jnp.maximum(sp - 1, 0)
            entry = stack[w, top]
            sp_ref[w] = jnp.where(have, sp - 1, sp)
            is_leaf = have & (entry < 0)
            is_node = have & (entry >= 0)
            packed = jnp.where(is_leaf, -(entry + 1), 0)
            ridx = jnp.where(is_leaf, packed >> 4, jnp.maximum(entry, 0))
            haves.append(have)
            leafs.append(is_leaf)
            packeds.append(packed)
            ridxs.append(jnp.where(have, ridx, 0))
            n_node = n_node + is_node.astype(jnp.int32)
            n_leaf = n_leaf + is_leaf.astype(jnp.int32)
        if stats_out is not None:
            ctr_ref[0] = ctr_ref[0] + n_node
            ctr_ref[1] = ctr_ref[1] + n_leaf

        # Fetch all W rows up front (VMEM dynamic slices are cheap; the
        # HBM fallback overlaps the W DMAs before the first wait).
        rows_w = []
        if table_in_vmem:
            for w in range(W):
                rows_w.append(rows_ref[pl.ds(ridxs[w], 1), :])
        else:
            cps = []
            for w in range(W):
                cp = pltpu.make_async_copy(rows_ref.at[pl.ds(ridxs[w], 1)],
                                           rowbuf.at[pl.ds(w, 1)],
                                           sem.at[w])
                cp.start()
                cps.append(cp)
            for w, cp in enumerate(cps):
                cp.wait()
                rows_w.append(rowbuf[pl.ds(w, 1), :])

        views = []
        for w in range(W):
            row = rows_w[w]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rowG = pltpu.repeat(row, G, axis=0) if G > 1 else row
            views.append((row, row_i, rowG))

        # ---- region A: per-packet vector work (no scalar syncs) ----------
        for w in range(W):
            _, row_i, rowG = views[w]

            def bv(l, rowG=rowG):
                return rowG[:, l:l + 1]

            @pl.when(haves[w] & jnp.logical_not(leafs[w]))
            def _(w=w, bv=bv, row_i=row_i):
                o = o_ref[w]
                inv = inv_ref[w]
                act = act_ref[w]
                on = act & (prim_out[w] < 0) if any_hit else act
                t_cur = t_out[w]
                oi = [o[a] * inv[a] for a in range(3)]
                hits, tmins = [], []
                for j in range(arity):
                    tmin = None
                    tmax_ = None
                    for a in range(3):
                        lo = bv(j * 6 + a)
                        hi = bv(j * 6 + 3 + a)
                        t0 = lo * inv[a] - oi[a]
                        t1 = hi * inv[a] - oi[a]
                        lo_t = jnp.minimum(t0, t1)
                        hi_t = jnp.maximum(t0, t1)
                        tmin = (lo_t if tmin is None
                                else jnp.maximum(tmin, lo_t))
                        tmax_ = (hi_t if tmax_ is None
                                 else jnp.minimum(tmax_, hi_t))
                    hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                                & (tmin < t_cur) & on)
                    tmins.append(tmin)
                h8 = jnp.stack(hits)                       # [A, G, 128]
                t8 = jnp.stack(tmins)
                keyv = jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                               axis=1, keepdims=True)      # [A, 1]
                kbuf[pl.ds(w * arity, arity), :] = keyv

            @pl.when(leafs[w])
            def _(w=w, bv=bv, row_i=row_i, packed=packeds[w]):
                o = o_ref[w]
                d = d_ref[w]
                act = act_ref[w]
                on = act & (prim_out[w] < 0) if any_hit else act
                count = packed & 15
                t_c = t_out[w]
                prim_c = prim_out[w]
                u_c = u_out[w]
                v_c = v_out[w]
                for k in range(leaf_size):
                    b = k * 12
                    p0 = [bv(b + a) for a in range(3)]
                    e1 = [bv(b + 3 + a) for a in range(3)]
                    e2 = [bv(b + 6 + a) for a in range(3)]
                    pid = jax.lax.bitcast_convert_type(bv(b + 9), jnp.int32)
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
                    ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                          & (uu + vv < 1.0) & (tt > 0.0) & (tt < t_c)
                          & on & (k < count))
                    t_c = jnp.where(ok, tt, t_c)
                    prim_c = jnp.where(ok, pid, prim_c)
                    u_c = jnp.where(ok, uu, u_c)
                    v_c = jnp.where(ok, vv, v_c)
                t_out[w] = t_c
                prim_out[w] = prim_c
                u_out[w] = u_c
                v_out[w] = v_c

        # ---- region B: per-packet scalar sync + push ---------------------
        for w in range(W):
            _, row_i, _ = views[w]

            @pl.when(haves[w] & jnp.logical_not(leafs[w]))
            def _(w=w, row_i=row_i):
                pairs = []
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    k = kbuf[w * arity + j, 0]
                    k = jnp.where(centry == _INVALID, jnp.inf, k)
                    pairs.append((k, centry))
                if ordered:
                    for a, b in _sort_net(arity):
                        ka, ea = pairs[a]
                        kb, eb = pairs[b]
                        swap = ka < kb  # descending: nearest pushed last
                        pairs[a] = (jnp.where(swap, kb, ka),
                                    jnp.where(swap, eb, ea))
                        pairs[b] = (jnp.where(swap, ka, kb),
                                    jnp.where(swap, ea, eb))
                new_sp = sp_ref[w]
                for k, centry in pairs:
                    pushed = k < jnp.inf
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[w, idx] = jnp.where(pushed, centry, stack[w, idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[w] = new_sp

        total = jnp.int32(0)
        for w in range(W):
            sp = sp_ref[w]
            if any_hit:
                done = jnp.sum((act_ref[w] & (prim_out[w] < 0))
                               .astype(jnp.int32)) == 0
                sp = jnp.where(done, 0, sp)
                sp_ref[w] = sp
            total = total + sp
        return total

    jax.lax.while_loop(lambda t: t > 0, body, total0)
    if stats_out is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0))


def _kernel_pair(root_ref, o_ref, d_ref, inv_ref, tmax_ref, act_ref,
                 rows_ref,
                 t_out, prim_out, u_out, v_out, stats_out,
                 stack, sp_ref, kbuf, rowbuf, sem,
                 *, stack_depth: int, leaf_size: int, any_hit: bool,
                 table_in_vmem: bool, ordered: bool, interleave: int,
                 arity: int = 8):
    """TWO independent packets, one branched pop each per iteration, both
    pops fused into a SINGLE pl.when region per (phase_A, phase_B)
    combination.

    Why this differs from the two measured losses (PERF.md): the
    interleaved kernel (_kernel_ilv) used one pl.when region per packet
    and Mosaic does not run ahead across region boundaries, so the W
    chains serialized; multi_pop avoided regions by issuing BOTH phases'
    vector work unconditionally for every pop, which saturated the VPU.
    Here the region is selected by the (is_leaf_A, is_leaf_B) pair, so
    each pop issues only its own phase AND both pops' instruction streams
    live in one region — packet A's vector->scalar sync (~100-200 serial
    cycles, the chain's wall) can retire under packet B's slab/MT vector
    work. Algorithmically identical to two _kernel runs: same pops, same
    order, same results; only the schedule changes.

    A packet whose stack empties keeps issuing masked (rays_on = 0)
    phase work while the other drains — the tail waste is bounded by the
    pop-count imbalance of the pair, small for union-saturated
    incoherent packets. Layouts as _kernel_ilv with W = 2; kbuf unused
    (kept for plumbing parity).
    """
    del kbuf
    G = o_ref.shape[2]
    W = 2
    assert interleave == 2

    t_out[...] = tmax_ref[...]
    prim_out[...] = jnp.full((W, G, LANES), -1, jnp.int32)
    u_out[...] = jnp.zeros((W, G, LANES), jnp.float32)
    v_out[...] = jnp.zeros((W, G, LANES), jnp.float32)

    if stats_out is not None:
        ctr_ref = stats_out[1]
        ctr_ref[0] = 0
        ctr_ref[1] = 0

    total0 = jnp.int32(0)
    for w in range(W):
        root = root_ref[pl.program_id(0) * W + w]
        stack[w, 0] = root
        act_w = jnp.sum(act_ref[w].astype(jnp.int32)) > 0
        on = (act_w & (root != _INVALID)).astype(jnp.int32)
        sp_ref[w] = on
        total0 = total0 + on

    def body(total):
        del total
        haves, leafs, packeds, ridxs = [], [], [], []
        n_node = jnp.int32(0)
        n_leaf = jnp.int32(0)
        for w in range(W):
            sp = sp_ref[w]
            have = sp > 0
            entry = stack[w, jnp.maximum(sp - 1, 0)]
            sp_ref[w] = jnp.where(have, sp - 1, sp)
            is_leaf = have & (entry < 0)
            is_node = have & (entry >= 0)
            packed = jnp.where(is_leaf, -(entry + 1), 0)
            ridx = jnp.where(is_leaf, packed >> 4, jnp.maximum(entry, 0))
            haves.append(have)
            leafs.append(is_leaf)
            packeds.append(packed)
            ridxs.append(jnp.where(have, ridx, 0))
            n_node = n_node + is_node.astype(jnp.int32)
            n_leaf = n_leaf + is_leaf.astype(jnp.int32)
        if stats_out is not None:
            ctr_ref[0] = ctr_ref[0] + n_node
            ctr_ref[1] = ctr_ref[1] + n_leaf

        rows_w = []
        if table_in_vmem:
            for w in range(W):
                rows_w.append(rows_ref[pl.ds(ridxs[w], 1), :])
        else:
            cps = []
            for w in range(W):
                cp = pltpu.make_async_copy(rows_ref.at[pl.ds(ridxs[w], 1)],
                                           rowbuf.at[pl.ds(w, 1)],
                                           sem.at[w])
                cp.start()
                cps.append(cp)
            for w, cp in enumerate(cps):
                cp.wait()
                rows_w.append(rowbuf[pl.ds(w, 1), :])

        views = []
        for w in range(W):
            row = rows_w[w]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rowG = pltpu.repeat(row, G, axis=0) if G > 1 else row
            views.append((row_i, rowG))

        def node_vec(w):
            """Slab tests -> per-child packet-min key vector [A, 1]."""
            _, rowG = views[w]
            o = o_ref[w]
            inv = inv_ref[w]
            act = act_ref[w]
            on = (act & (prim_out[w] < 0) if any_hit else act) & haves[w]
            t_cur = t_out[w]
            oi = [o[a] * inv[a] for a in range(3)]
            hits, tmins = [], []
            for j in range(arity):
                tmin = None
                tmax_ = None
                for a in range(3):
                    lo = rowG[:, j * 6 + a:j * 6 + a + 1]
                    hi = rowG[:, j * 6 + 3 + a:j * 6 + 4 + a]
                    t0 = lo * inv[a] - oi[a]
                    t1 = hi * inv[a] - oi[a]
                    lo_t = jnp.minimum(t0, t1)
                    hi_t = jnp.maximum(t0, t1)
                    tmin = lo_t if tmin is None else jnp.maximum(tmin, lo_t)
                    tmax_ = (hi_t if tmax_ is None
                             else jnp.minimum(tmax_, hi_t))
                hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                            & (tmin < t_cur) & on)
                tmins.append(tmin)
            h8 = jnp.stack(hits)
            t8 = jnp.stack(tmins)
            return jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                           axis=1, keepdims=True)  # [A, 1]

        def node_scalar(w, keyv):
            """Key extracts (the sync) + sort network + stack pushes."""
            row_i, _ = views[w]
            pairs = []
            for j in range(arity):
                centry = row_i[0, 6 * arity + j]
                k = jnp.where(centry == _INVALID, jnp.inf, keyv[j, 0])
                pairs.append((k, centry))
            if ordered:
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb  # descending: nearest pushed last
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
            new_sp = sp_ref[w]
            for k, centry in pairs:
                pushed = (k < jnp.inf) & haves[w]
                idx = jnp.minimum(new_sp, stack_depth - 1)
                stack[w, idx] = jnp.where(pushed, centry, stack[w, idx])
                new_sp = new_sp + jnp.where(pushed, 1, 0)
            sp_ref[w] = new_sp

        def leaf_body(w):
            _, rowG = views[w]
            rowGi = jax.lax.bitcast_convert_type(rowG, jnp.int32)
            o = o_ref[w]
            d = d_ref[w]
            act = act_ref[w]
            on = (act & (prim_out[w] < 0) if any_hit else act) & haves[w]
            count = packeds[w] & 15
            t_c = t_out[w]
            prim_c = prim_out[w]
            u_c = u_out[w]
            v_c = v_out[w]
            for k in range(leaf_size):
                b = k * 12
                p0 = [rowG[:, b + a:b + a + 1] for a in range(3)]
                e1 = [rowG[:, b + 3 + a:b + 4 + a] for a in range(3)]
                e2 = [rowG[:, b + 6 + a:b + 7 + a] for a in range(3)]
                pid = rowGi[:, b + 9:b + 10]
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
                ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                      & (uu + vv < 1.0) & (tt > 0.0) & (tt < t_c)
                      & on & (k < count))
                t_c = jnp.where(ok, tt, t_c)
                prim_c = jnp.where(ok, pid, prim_c)
                u_c = jnp.where(ok, uu, u_c)
                v_c = jnp.where(ok, vv, v_c)
            t_out[w] = t_c
            prim_out[w] = prim_c
            u_out[w] = u_c
            v_out[w] = v_c

        # ONE region per phase combination: both packets' streams fused so
        # Mosaic can overlap A's sync with B's vector work. A drained
        # packet (have = False) flows through whichever branch its stale
        # top-of-stack selects, fully masked.
        for la in (False, True):
            for lb in (False, True):
                cond = ((leafs[0] == la) & (leafs[1] == lb))

                @pl.when(cond)
                def _(la=la, lb=lb):
                    kvs = {}
                    for w, lf in ((0, la), (1, lb)):
                        if lf:
                            leaf_body(w)
                        else:
                            kvs[w] = node_vec(w)
                    for w, lf in ((0, la), (1, lb)):
                        if not lf:
                            node_scalar(w, kvs[w])

        total = jnp.int32(0)
        for w in range(W):
            sp = sp_ref[w]
            if any_hit:
                done = jnp.sum((act_ref[w] & (prim_out[w] < 0))
                               .astype(jnp.int32)) == 0
                sp = jnp.where(done, 0, sp)
                sp_ref[w] = sp
            total = total + sp
        return total

    jax.lax.while_loop(lambda t: t > 0, body, total0)
    if stats_out is not None:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        stats_out[0][...] = (jnp.where(lane == 0, ctr_ref[0], 0)
                             + jnp.where(lane == 1, ctr_ref[1], 0))


@functools.partial(jax.jit, static_argnames=("stack_depth", "leaf_size",
                                             "any_hit", "interpret",
                                             "with_stats", "ordered",
                                             "multi_pop", "interleave",
                                             "arity", "fused_pair",
                                             "pop_skip"))
def traverse_pallas(rows, o, d, t_max, active, roots=None,
                    stack_depth: int = 48, leaf_size: int = 4,
                    any_hit: bool = False, interpret: bool = False,
                    with_stats: bool = False, ordered: bool = True,
                    multi_pop: int = 1, interleave: int = 1,
                    arity: int = 8, fused_pair: bool = False,
                    cluster_rows=None, pop_skip: bool = False):
    """o, d: [P, K, 3]; t_max, active: [P, K]; rows [M, 128].
    K must be a multiple of 128 (rays are shaped into full VPU tiles).
    roots: optional [P] i32 initial stack entry per packet (default: the
    whole-tree root, entry 0); treelet binning passes subtree roots.
    multi_pop: entries retired per kernel iteration (Q latency chains
    overlapped; see _kernel_multi).
    interleave: W independent packets co-scheduled per grid step (their
    pop latency chains overlap; see _kernel_ilv). Requires P % W == 0.
    cluster_rows: optional [Ncl*8, 3*Tc] dense cluster-leaf table
    (bvh/cluster.py) — `rows` must then be the cluster TOP tree and the
    returned prim ids are cluster-local (cidx * Tc + slot; remap through
    cluster_refs). Single-pop kernel only.
    Returns (t, prim, u, v) each [P, K]; with_stats appends a [P, 2] i32
    (node pops, leaf pops) per packet — the profiling counter behind the
    PERF.md pop-cost model (with interleave > 1 the counters aggregate the
    W packets of each grid step: shape [P // W, 2])."""
    P, K, _ = o.shape
    if roots is None:
        roots = jnp.zeros((P,), jnp.int32)
    if K % LANES != 0:
        raise ValueError(f"packet size K={K} must be a multiple of {LANES}")
    G = K // LANES
    oT = jnp.transpose(o, (0, 2, 1)).reshape(P, 3, G, LANES)
    dT = jnp.transpose(d, (0, 2, 1)).reshape(P, 3, G, LANES)
    eps = 1e-12
    invT = jnp.where(dT >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(dT), eps)

    table_in_vmem = rows.size * rows.dtype.itemsize <= VMEM_TABLE_LIMIT
    leaf_block_rows = -(-leaf_size // (LANES // 12))
    if leaf_block_rows > 1 and (multi_pop > 1 or interleave > 1):
        raise ValueError("multi-row leaves (leaf_size > 10) are supported "
                         "by the single-pop kernel only")
    if fused_pair and interleave != 2:
        raise ValueError("fused_pair requires interleave=2")
    if cluster_rows is not None:
        if multi_pop > 1 or interleave > 1 or fused_pair:
            raise ValueError("cluster leaves are single-pop kernel only")
        return _traverse_cluster(rows, cluster_rows, oT, dT, invT, t_max,
                                 active, roots, P=P, K=K, G=G,
                                 stack_depth=stack_depth, any_hit=any_hit,
                                 interpret=interpret, with_stats=with_stats,
                                 ordered=ordered, arity=arity,
                                 pop_skip=pop_skip)
    if interleave > 1:
        return _traverse_ilv(rows, oT, dT, invT, t_max, active, roots,
                             P=P, K=K, G=G, stack_depth=stack_depth,
                             leaf_size=leaf_size, any_hit=any_hit,
                             interpret=interpret, with_stats=with_stats,
                             ordered=ordered, interleave=interleave,
                             table_in_vmem=table_in_vmem, arity=arity,
                             fused_pair=fused_pair)
    if multi_pop > 1:
        # Q-pop expands up to Q subtrees at once: the single-pop DFS depth
        # bound (arity-1 entries/level) scales by the lookahead width.
        stack_depth = stack_depth * multi_pop
        kernel = functools.partial(_kernel_multi, stack_depth=stack_depth,
                                   leaf_size=leaf_size, any_hit=any_hit,
                                   table_in_vmem=table_in_vmem,
                                   ordered=ordered, multi_pop=multi_pop,
                                   arity=arity)
    else:
        kernel = functools.partial(_kernel, stack_depth=stack_depth,
                                   leaf_size=leaf_size, any_hit=any_hit,
                                   table_in_vmem=table_in_vmem,
                                   ordered=ordered, arity=arity)
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

    def entry(root_r, o_r, d_r, i_r, tm_r, ac_r, rows_r, t_o, p_o, u_o,
              v_o, *rest):
        if with_stats:
            st_o, stack, spr, rb, sm, ctr = rest
            st_view = (st_o.at[0], ctr)
        else:
            stack, spr, rb, sm = rest
            st_view = None
        kernel(root_r, o_r.at[0], d_r.at[0], i_r.at[0], tm_r.at[0],
               ac_r.at[0], rows_r, t_o.at[0], p_o.at[0], u_o.at[0],
               v_o.at[0], st_view, stack, spr, rb, sm)

    outs = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, lane_spec, lane_spec,
                  pl.BlockSpec(memory_space=(pltpu.VMEM if table_in_vmem
                                             else pl.ANY))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((max(2, multi_pop) * leaf_block_rows,
                                    LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((max(2, multi_pop),))]
                   + ([pltpu.SMEM((3,), jnp.int32)] if with_stats else []),
        # The table blows the default 16 MB scoped-VMEM budget; size the
        # limit to table + double-buffered ray/output blocks + slack.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (rows.size * rows.dtype.itemsize if table_in_vmem else 0)
                + 64 * G * LANES * 4 + 4 * 1024 * 1024,
                120 * 1024 * 1024)),
        interpret=interpret,
    )(roots.astype(jnp.int32), oT, dT, invT,
      t_max.reshape(P, G, LANES),
      active.reshape(P, G, LANES), rows)
    t, prim, u, v = outs[:4]
    result = (t.reshape(P, K), prim.reshape(P, K),
              u.reshape(P, K), v.reshape(P, K))
    if with_stats:
        # multi_pop appends its overflow-event latch as a third column.
        ncol = 3 if multi_pop > 1 else 2
        return result + (outs[4][:, 0, 0:ncol],)
    return result


def _traverse_ilv(rows, oT, dT, invT, t_max, active, roots, *,
                  P, K, G, stack_depth, leaf_size, any_hit, interpret,
                  with_stats, ordered, interleave, table_in_vmem,
                  arity: int = 8, fused_pair: bool = False):
    """pallas_call plumbing for the interleaved W-packet kernel."""
    W = interleave
    if P % W != 0:
        raise ValueError(f"packet count P={P} must divide interleave={W}")
    kernel = functools.partial(_kernel_pair if fused_pair else _kernel_ilv,
                               stack_depth=stack_depth,
                               leaf_size=leaf_size, any_hit=any_hit,
                               table_in_vmem=table_in_vmem,
                               ordered=ordered, interleave=W, arity=arity)
    grid = (P // W,)
    ray_spec = pl.BlockSpec((W, 3, G, LANES), lambda p: (p, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((W, G, LANES), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM)

    def out_sds(dtype):
        return jax.ShapeDtypeStruct((P, G, LANES), dtype)

    out_specs = [lane_spec] * 4
    out_shape = [out_sds(jnp.float32), out_sds(jnp.int32),
                 out_sds(jnp.float32), out_sds(jnp.float32)]
    if with_stats:
        out_specs.append(pl.BlockSpec((1, 1, LANES), lambda p: (p, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((P // W, 1, LANES), jnp.int32))

    def entry(root_r, o_r, d_r, i_r, tm_r, ac_r, rows_r, t_o, p_o, u_o,
              v_o, *rest):
        if with_stats:
            st_o, stack, spr, kbuf, rb, sm, ctr = rest
            st_view = (st_o.at[0], ctr)
        else:
            stack, spr, kbuf, rb, sm = rest
            st_view = None
        kernel(root_r, o_r, d_r, i_r, tm_r, ac_r, rows_r, t_o, p_o, u_o,
               v_o, st_view, stack, spr, kbuf, rb, sm)

    outs = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, lane_spec, lane_spec,
                  pl.BlockSpec(memory_space=(pltpu.VMEM if table_in_vmem
                                             else pl.ANY))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((W, stack_depth), jnp.int32),
                        pltpu.SMEM((W,), jnp.int32),
                        pltpu.VMEM((arity * W, 1), jnp.float32),
                        pltpu.VMEM((max(2, W), LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((max(2, W),))]
                   + ([pltpu.SMEM((2,), jnp.int32)] if with_stats else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                (rows.size * rows.dtype.itemsize if table_in_vmem else 0)
                + W * 64 * G * LANES * 4 + 4 * 1024 * 1024,
                120 * 1024 * 1024)),
        interpret=interpret,
    )(roots.astype(jnp.int32), oT.reshape(P, 3, G, LANES),
      dT.reshape(P, 3, G, LANES), invT.reshape(P, 3, G, LANES),
      t_max.reshape(P, G, LANES), active.reshape(P, G, LANES), rows)
    t, prim, u, v = outs[:4]
    result = (t.reshape(P, K), prim.reshape(P, K),
              u.reshape(P, K), v.reshape(P, K))
    if with_stats:
        return result + (outs[4][:, 0, 0:2],)
    return result


def _traverse_cluster(rows, cluster_rows, oT, dT, invT, t_max, active,
                      roots, *, P, K, G, stack_depth, any_hit, interpret,
                      with_stats, ordered, arity: int = 8,
                      pop_skip: bool = False):
    """pallas_call plumbing for the dense cluster-leaf kernel.

    with_stats appends [P, 3]: node pops, cluster pops RUN, cluster pops
    SKIPPED by the t-pruned pop skip."""
    tc3 = cluster_rows.shape[1]
    if tc3 % (3 * LANES) != 0:
        raise ValueError(f"cluster row width {tc3} must be 3*Tc, "
                         f"Tc a multiple of {LANES}")
    tc = tc3 // 3
    node_bytes = rows.size * rows.dtype.itemsize
    cl_bytes = cluster_rows.size * cluster_rows.dtype.itemsize
    if node_bytes > VMEM_TABLE_LIMIT:
        raise ValueError("cluster top tree exceeds the VMEM table budget")
    cl_in_vmem = node_bytes + cl_bytes <= VMEM_TABLE_LIMIT

    kernel = functools.partial(_kernel_cluster, stack_depth=stack_depth,
                               tc=tc, any_hit=any_hit, table_in_vmem=True,
                               cl_in_vmem=cl_in_vmem, ordered=ordered,
                               arity=arity, pop_skip=pop_skip)
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

    def entry(root_r, o_r, d_r, i_r, tm_r, ac_r, rows_r, cl_r, t_o, p_o,
              u_o, v_o, *rest):
        if with_stats:
            st_o, stack, spr, clb, sm, kst, tpk, ctr = rest
            st_view = (st_o.at[0], ctr)
        else:
            stack, spr, clb, sm, kst, tpk = rest
            st_view = None
        kernel(root_r, o_r.at[0], d_r.at[0], i_r.at[0], tm_r.at[0],
               ac_r.at[0], rows_r, cl_r, t_o.at[0], p_o.at[0], u_o.at[0],
               v_o.at[0], st_view, stack, spr, clb, sm, kst, tpk)

    outs = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  ray_spec, ray_spec, ray_spec, lane_spec, lane_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=(pltpu.VMEM if cl_in_vmem
                                             else pl.ANY))],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.VMEM((8, 3 * tc), jnp.float32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SMEM((stack_depth,), jnp.float32),
                        pltpu.SMEM((1,), jnp.float32)]
                   + ([pltpu.SMEM((3,), jnp.int32)] if with_stats else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                node_bytes + (cl_bytes if cl_in_vmem else 0)
                # per-pop intermediates: two [3*tc, 128] matmul results
                # + epilogue temporaries, plus ray/output blocks + slack.
                + 2 * 3 * tc * LANES * 4 * 4
                + 64 * G * LANES * 4 + 4 * 1024 * 1024,
                120 * 1024 * 1024)),
        interpret=interpret,
    )(roots.astype(jnp.int32), oT, dT, invT,
      t_max.reshape(P, G, LANES),
      active.reshape(P, G, LANES), rows, cluster_rows)
    t, prim, u, v = outs[:4]
    result = (t.reshape(P, K), prim.reshape(P, K),
              u.reshape(P, K), v.reshape(P, K))
    if with_stats:
        return result + (outs[4][:, 0, 0:3],)
    return result
