"""Treelet-sorted packet dispatch — subtree-coherent packets without bins.

The round-2/3 treelet-binning experiment (ops/treelet.py) proved the
geometry supports subtree routing (incoherent Sponza bounce rays need only
~2 treelet visits each under pruning, PERF.md) but lost 6-9x to the XLA
indexed-op floor: fixed-capacity bins need an argsort + scatter + multiple
gathers PER ROUND, and demand skew forces 22-26 overflow rounds.

This module keeps the insight and drops the bins: rays are sorted ONCE by
their nearest candidate treelet (the cut box with the smallest slab entry
distance) and chopped into fixed packets in sorted order. Every packet then
traverses the WHOLE tree from the root — no capacity, no rounds, no
overflow — but its rays now share one subtree, so the shared-stack union
collapses toward that subtree's row count, and near-first ordered descent
prunes most rays' second candidates after the shared one shrinks t.

Cost: one fused [N, C] slab + argmin (the "candidate select" the binning
experiment measured at ~31 ns/ray), one argsort, one [N, 8] payload gather
and one [N, 4] result scatter (~30 ns/row each) — a fixed ~150 ns/ray,
vs. the ~190 ns/ray/round * many rounds the binning paid.

Role model: the ray-sorting literature's "treelet reordering" applied at
dispatch granularity; the reference has no counterpart (its persistent
threads rely on warp divergence hardware, Iterative.comp:174-210).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpupathtracer_tpu.ops.traverse import Hit, _safe_inv


def _sort_perm(cut_bounds, o, d, t_max, active, key_mode: str = "top2",
               bvh=None):
    """Permutation grouping rays by nearest candidate treelet(s).

    key_mode "top1" groups by the nearest candidate; "top2" by the
    (nearest, second-nearest) pair — tighter packets when rays typically
    have ~2 candidates (PERF.md: mean V = 1.97 on Sponza bounce rays);
    "deep" refines top2's primary by the nearest CHILD slot of the
    primary treelet's root (one [N]-row gather of its 8 child boxes —
    ~8x finer primary grouping for ~70 ns/ray extra; needs `bvh`).
    Dead rays and rays with no candidate sort last (whole dead packets exit
    the kernel before their first pop)."""
    C = cut_bounds.shape[0]
    inv = _safe_inv(d)
    t0 = (cut_bounds[None, :, 0:3] - o[:, None, :]) * inv[:, None, :]
    t1 = (cut_bounds[None, :, 3:6] - o[:, None, :]) * inv[:, None, :]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)      # [N, C]
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tn <= tf) & (tf > 0.0) & (tn < t_max[:, None]) & active[:, None]
    key = jnp.where(hit, tn, jnp.inf)
    if key_mode in ("top2", "deep"):
        # Two argmin passes instead of lax.top_k(k=2): top_k costs
        # ~35 ns/lane at C=132 where min+argmin+mask costs ~8
        # (PERF.md glue calibration) — same (nearest, 2nd) pair.
        t1_ = jnp.argmin(key, axis=1).astype(jnp.int32)
        has1 = jnp.isfinite(jnp.min(key, axis=1))
        masked = jnp.where(jnp.arange(C, dtype=jnp.int32)[None, :]
                           == t1_[:, None], jnp.inf, key)
        k2 = jnp.min(masked, axis=1)
        t2_ = jnp.argmin(masked, axis=1).astype(jnp.int32)
        has2 = jnp.isfinite(k2)
        sec = jnp.where(has2, t2_, C)
        if key_mode == "deep":
            ce = bvh.cut_entry[t1_]                 # [N] treelet root entry
            node = jnp.where(ce >= 0, ce, 0)
            cb = bvh.child_bounds[node]             # [N, A, 6] row gather
            A = cb.shape[1]
            ct0 = (cb[..., 0:3] - o[:, None, :]) * inv[:, None, :]
            ct1 = (cb[..., 3:6] - o[:, None, :]) * inv[:, None, :]
            stn = jnp.max(jnp.minimum(ct0, ct1), axis=-1)   # [N, A]
            stf = jnp.min(jnp.maximum(ct0, ct1), axis=-1)
            shit = (stn <= stf) & (stf > 0.0) & (stn < t_max[:, None])
            sk = jnp.where(shit, stn, jnp.inf)
            sub = jnp.argmin(sk, axis=1).astype(jnp.int32)
            # Leaf-entry treelets have no children: one group (sub = A).
            sub = jnp.where((ce >= 0) & jnp.isfinite(jnp.min(sk, axis=1)),
                            sub, A)
            prim_key = t1_ * (A + 1) + sub
            skey = jnp.where(active & has1,
                             prim_key * (C + 1) + sec,
                             (A + 1) * C * (C + 1) + C)
        else:
            skey = jnp.where(active & has1,
                             t1_ * (C + 1) + sec,
                             C * (C + 1) + C)
    else:
        tid = jnp.argmin(key, axis=1).astype(jnp.int32)
        has = jnp.isfinite(jnp.min(key, axis=1))
        skey = jnp.where(active & has, tid, C)
    return jnp.argsort(skey).astype(jnp.int32)


def _trace(scene, o, d, t_max, active, *, stack_depth: int, leaf_size: int,
           packet_size: int, any_hit: bool, interleave: int = 1,
           fused_pair: bool = False,
           kernel: str = "packet", key_mode: str = "top2",
           perm=None, inv=None, interpret: bool | None = None):
    if fused_pair:
        interleave = 2
    from gpupathtracer_tpu.ops.pallas_traverse import LANES, traverse_pallas
    cluster = getattr(scene.bvh, "cluster_rows", None) is not None
    if cluster:  # dense cluster leaves: single-pop packet kernel only
        interleave, fused_pair, kernel = 1, False, "packet"
    if kernel == "subpacket":
        # Sub-packets (one independent 128-ray packet per sublane row,
        # ~190 ns/pop retire rate) are the natural consumers of the sorted
        # order: their round-2 loss was 128-ray union inflation on
        # UNSORTED rays, which the treelet sort removes (consecutive
        # 128-ray groups share a treelet whenever a treelet's demand
        # exceeds one row).
        from gpupathtracer_tpu.ops.subpacket_traverse import \
            traverse_subpacket
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = o.shape[0]
    K = max(LANES, (min(packet_size, n) // LANES) * LANES)

    if perm is None:
        perm = _sort_perm(scene.bvh.cut_bounds, o, d, t_max, active,
                          key_mode=key_mode, bvh=scene.bvh)
    if inv is None:
        # Inverse permutation: lets the result UNPERMUTE be a gather
        # instead of a scatter — the [N,4] .at[perm].set() scatter costs
        # ~50 ns/lane where argsort + gather costs ~10 (PERF.md glue
        # calibration); callers sharing one perm between the bounce and
        # shadow traces pass the inverse in to pay the argsort once.
        inv = jnp.argsort(perm).astype(jnp.int32)
    # Single-gather payload: one [N, 8] row fetch instead of four.
    payload = jnp.concatenate(
        [o, d, t_max[:, None], active[:, None].astype(jnp.float32)],
        axis=1)[perm]
    o_s, d_s = payload[:, 0:3], payload[:, 3:6]
    t_s, a_s = payload[:, 6], payload[:, 7] > 0.5

    quantum = K * interleave
    pad = (-n) % quantum
    if pad:
        o_s = jnp.concatenate([o_s, jnp.zeros((pad, 3), o_s.dtype)])
        d_s = jnp.concatenate(
            [d_s, jnp.zeros((pad, 3), d_s.dtype).at[:, 0].set(1.0)])
        t_s = jnp.concatenate([t_s, jnp.zeros((pad,), t_s.dtype)])
        a_s = jnp.concatenate([a_s, jnp.zeros((pad,), bool)])
    NP = n + pad
    P = NP // K
    arity = scene.bvh.child_entry.shape[1]
    if kernel == "subpacket":
        if arity != 8:
            raise ValueError("sub-packet kernel supports arity 8 only")
        t, prim, u, v = traverse_subpacket(
            scene.bvh.node_rows, o_s.reshape(P, K, 3), d_s.reshape(P, K, 3),
            t_s.reshape(P, K), a_s.reshape(P, K),
            stack_depth=stack_depth, leaf_size=leaf_size, any_hit=any_hit,
            interpret=interpret)
    else:
        t, prim, u, v = traverse_pallas(
            scene.bvh.node_rows, o_s.reshape(P, K, 3), d_s.reshape(P, K, 3),
            t_s.reshape(P, K), a_s.reshape(P, K), arity=arity,
            stack_depth=stack_depth, leaf_size=leaf_size, any_hit=any_hit,
            ordered=not any_hit,  # packed-bits push for occlusion (PERF.md)
            interleave=interleave, fused_pair=fused_pair,
            interpret=interpret,
            cluster_rows=scene.bvh.cluster_rows if cluster else None)
    # Single-gather unpermute: pack (t, prim-bits, u, v) as one [N, 4] row
    # and gather by the INVERSE permutation (cheaper than scattering).
    res = jnp.stack([t.reshape(NP)[:n],
                     jax.lax.bitcast_convert_type(prim.reshape(NP)[:n],
                                                  jnp.float32),
                     u.reshape(NP)[:n], v.reshape(NP)[:n]], axis=1)
    out = res[inv]
    prim_out = jax.lax.bitcast_convert_type(out[:, 1], jnp.int32)
    if cluster and not any_hit:
        # Occlusion consumers read only prim >= 0 — cluster-local ids
        # already carry the sign; skip the [N] remap gather.
        from gpupathtracer_tpu.ops.traverse import remap_cluster_prims
        prim_out = remap_cluster_prims(scene, prim_out)
    return Hit(t=out[:, 0], prim=prim_out, u=out[:, 2], v=out[:, 3])


def trace_closest_tsort(scene, o, d, t_max, active, *, stack_depth: int,
                        leaf_size: int, packet_size: int = 2048,
                        interleave: int = 1, fused_pair: bool = False,
                        kernel: str = "packet",
                        key_mode: str = "top2", perm=None, inv=None,
                        interpret: bool | None = None) -> Hit:
    """Closest-hit with treelet-sorted packets. Same contract as
    traverse.trace_closest. perm/inv: optional precomputed permutation
    and its inverse (callers can reuse one bounce's sort for its shadow
    rays and pay the inverse argsort once)."""
    return _trace(scene, o, d, t_max, active, stack_depth=stack_depth,
                  leaf_size=leaf_size, packet_size=packet_size,
                  any_hit=False, interleave=interleave,
                  fused_pair=fused_pair, kernel=kernel,
                  key_mode=key_mode, perm=perm, inv=inv, interpret=interpret)


def trace_occluded_tsort(scene, o, d, t_max, active, *, stack_depth: int,
                         leaf_size: int, packet_size: int = 2048,
                         interleave: int = 1, fused_pair: bool = False,
                         kernel: str = "packet",
                         key_mode: str = "top2", perm=None, inv=None,
                         interpret: bool | None = None):
    """Occlusion query with treelet-sorted packets. Returns occluded [N]."""
    hit = _trace(scene, o, d, t_max, active, stack_depth=stack_depth,
                 leaf_size=leaf_size, packet_size=packet_size,
                 any_hit=True, interleave=interleave,
                 fused_pair=fused_pair, kernel=kernel,
                 key_mode=key_mode, perm=perm, inv=inv, interpret=interpret)
    return hit.prim >= 0
