"""Vectorized wide-BVH traversal in JAX (XLA-compiled, TPU-first).

Redesign of the reference's per-thread stack traversals (IfIfClosestHit /
IfIfAnyHit, src/shaders/common/BVH.glsl:634-854): instead of divergent
per-lane loops, the whole ray wavefront advances in lockstep through a
bounded `lax.while_loop`. Each step pops one stack entry per lane; lanes
holding an internal node gather its [8, 6] child-bounds block and slab-test
all 8 children on the VPU (near-child-first push order, cf. BVH.glsl:707-717),
lanes holding a leaf run up to `leaf_size` Moller-Trumbore tests. Finished
lanes idle (masked) until the chunk drains — callers bound the waste by
chunking the wavefront.

The traversal stack is a fixed [N, DEPTH] int32 array: no recursion, no
atomics, static shapes throughout.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY
from gpupathtracer_tpu.ops.intersect import mt_intersect

_INVALID = INVALID_ENTRY  # plain int: jnp module constants leak mesh avals


class Hit(NamedTuple):
    """Closest-hit record (role of HitInfo, src/math/Ray.h:7-21)."""

    t: jnp.ndarray     # [N] f32; t_max on miss
    prim: jnp.ndarray  # [N] i32 triangle id; -1 on miss
    u: jnp.ndarray     # [N] f32 barycentric
    v: jnp.ndarray     # [N] f32 barycentric

    @property
    def miss(self):
        return self.prim < 0


def _safe_inv(d):
    """1/d with tiny components clamped (the reference relies on GLSL inf
    semantics, BVH.glsl:367-391; we avoid inf*0 NaNs explicitly)."""
    eps = 1e-12
    mag = jnp.maximum(jnp.abs(d), eps)
    return jnp.where(d >= 0, 1.0, -1.0) / mag


def _slab_test(bounds, o, inv_d, t_cur):
    """Vectorized madmann slab test over 8 children.

    bounds [N,8,6]; returns (t_near [N,8], hit [N,8]). Empty slots carry
    inverted boxes and always miss.
    """
    t0 = (bounds[..., 0:3] - o[:, None, :]) * inv_d[:, None, :]
    t1 = (bounds[..., 3:6] - o[:, None, :]) * inv_d[:, None, :]
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmin <= tmax) & (tmax > 0.0) & (tmin < t_cur[:, None])
    return jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf), hit


def _traverse(child_bounds, child_entry, refs, tri_geom,
              o, d, t_max, active,
              stack_depth: int, leaf_size: int, any_hit_mode: bool,
              visit_bucket=None, num_buckets: int = 0):
    """visit_bucket/num_buckets: optional [W] i32 node->bucket map — the
    traversal then also accumulates per-bucket node-pop counts (the
    pilot-batch demand attribution of bvh/partition.py hot selection)."""
    n = o.shape[0]
    lane = jnp.arange(n, dtype=jnp.int32)
    inv_d = _safe_inv(d)

    stack = jnp.zeros((n, stack_depth), jnp.int32)  # root entry = node 0
    sp = jnp.where(active, 1, 0).astype(jnp.int32)

    counting = visit_bucket is not None
    counts0 = jnp.zeros((num_buckets,), jnp.int32) if counting \
        else jnp.zeros((0,), jnp.int32)
    t0_state = (stack, sp,
                t_max.astype(jnp.float32),
                jnp.full((n,), -1, jnp.int32),
                jnp.zeros((n,), jnp.float32),
                jnp.zeros((n,), jnp.float32),
                counts0)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, t, prim, u, v, counts = state
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        entry = jnp.take_along_axis(stack, top[:, None], axis=1)[:, 0]
        sp = jnp.where(live, sp - 1, sp)

        is_leaf = live & (entry < 0)
        is_node = live & (entry >= 0)

        # ---- internal expansion -------------------------------------
        nidx = jnp.where(is_node, entry, 0)
        if counting:
            counts = counts.at[visit_bucket[nidx]].add(
                is_node.astype(jnp.int32), mode="drop")
        bounds = child_bounds[nidx]          # [N,8,6] single gather
        centry = child_entry[nidx]           # [N,8]
        tnear, chit = _slab_test(bounds, o, inv_d, t)
        chit = chit & (centry != _INVALID) & is_node[:, None]

        if any_hit_mode:
            # Occlusion rays don't care about order: push unsorted.
            s_entry, s_hit, s_near = centry, chit, tnear
        else:
            order = jnp.argsort(jnp.where(chit, tnear, jnp.inf), axis=1)
            s_entry = jnp.take_along_axis(centry, order, axis=1)
            s_hit = jnp.take_along_axis(chit, order, axis=1)
            s_near = None

        incl = jnp.cumsum(s_hit.astype(jnp.int32), axis=1)
        total = incl[:, -1]
        # Nearest child must end up on top: position = sp + total - incl_j.
        pos = sp[:, None] + total[:, None] - incl
        pos = jnp.where(s_hit, pos, stack_depth)  # out-of-range -> dropped
        for j in range(child_entry.shape[-1]):
            stack = stack.at[lane, pos[:, j]].set(s_entry[:, j], mode="drop")
        sp = jnp.where(is_node, jnp.minimum(sp + total, stack_depth), sp)

        # ---- leaf intersection ---------------------------------------
        packed = jnp.where(is_leaf, -(entry + 1), 0)
        first = packed >> 4
        count = packed & 15
        for k in range(leaf_size):
            ok = is_leaf & (k < count)
            ridx = jnp.where(ok, first + k, 0)
            tidx = refs[ridx]
            tri = tri_geom[tidx]
            tt, tu, tv, th = mt_intersect(tri, o, d)
            closer = ok & th & (tt < t)
            t = jnp.where(closer, tt, t)
            prim = jnp.where(closer, tidx, prim)
            u = jnp.where(closer, tu, u)
            v = jnp.where(closer, tv, v)

        if any_hit_mode:
            sp = jnp.where(prim >= 0, 0, sp)  # lane done on first hit

        return stack, sp, t, prim, u, v, counts

    _, _, t, prim, u, v, counts = jax.lax.while_loop(cond, body, t0_state)
    if counting:
        return t, prim, u, v, counts
    return t, prim, u, v


def closest_hit(wbvh, tri_geom, o, d, t_max, active=None,
                stack_depth: int = 48, leaf_size: int = 4) -> Hit:
    """Closest-hit traversal (role of IfIfClosestHit, BVH.glsl:634-767).

    Args:
      wbvh: WideBVH of device arrays; tri_geom [T, 9] packed (p0, e1, e2).
      o, d: [N, 3] rays; t_max: [N] max distance; active: [N] bool or None.
    """
    if active is None:
        active = jnp.ones(o.shape[0], bool)
    t, prim, u, v = _traverse(wbvh.child_bounds, wbvh.child_entry, wbvh.refs,
                              tri_geom, o, d, t_max, active,
                              stack_depth, leaf_size, False)
    return Hit(t=t, prim=prim, u=u, v=v)


def any_hit(wbvh, tri_geom, o, d, t_max, active=None,
            stack_depth: int = 48, leaf_size: int = 4):
    """Any-hit traversal (role of IfIfAnyHit, BVH.glsl:769-854).

    Returns occluded [N] bool: True iff something lies within (0, t_max).
    """
    if active is None:
        active = jnp.ones(o.shape[0], bool)
    _, prim, _, _ = _traverse(wbvh.child_bounds, wbvh.child_entry, wbvh.refs,
                              tri_geom, o, d, t_max, active,
                              stack_depth, leaf_size, True)
    return prim >= 0


def count_entry_visits(wbvh, tri_geom, o, d, t_max, bucket_map,
                       num_buckets: int, stack_depth: int = 48,
                       leaf_size: int = 4):
    """Pilot-batch demand attribution: closest-hit traverse the pilot
    rays per-lane and return [num_buckets] node-pop counts, attributed
    through `bucket_map` ([W] i32 wide-node index -> bucket). The input
    of bvh/partition.py's pops-attributed hot-subtree selection — unlike
    the slab-entry estimate, this sees traversal DEPTH (PERF.md
    replicate-hot: camera rays enter many subtree boxes shallowly, the
    deep work concentrates in a few central subtrees)."""
    active = jnp.ones(o.shape[0], bool)
    out = _traverse(wbvh.child_bounds, wbvh.child_entry, wbvh.refs,
                    tri_geom, o, d, t_max, active, stack_depth, leaf_size,
                    False, visit_bucket=jnp.asarray(bucket_map, jnp.int32),
                    num_buckets=num_buckets)
    return out[4]


def resolve_traversal(name: str) -> str:
    """Resolve the "auto" traversal choice against the active backend.

    "pallas" (the on-core kernel) is the TPU fast path; elsewhere it would
    run in the Pallas interpreter, so "auto" picks the XLA packet path on
    non-TPU backends (tests, CPU debugging).
    """
    if name == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "packet"
    return name


def _pad_rays(o, d, t_max, active, multiple: int):
    """Pad a wavefront to a multiple of the packet size with dead rays.

    Replaces the old _fit_packet_size shrink-to-divisor heuristic, which
    silently degraded to tiny packets for awkward N (e.g. primes). Fully
    dead packets cost ~nothing in either packet implementation (compaction
    skips them; the Pallas kernel exits before the first pop)."""
    n = o.shape[0]
    pad = (-n) % multiple
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        # Unit direction so inv-dir math stays finite on the padding.
        dpad = jnp.zeros((pad, 3), d.dtype).at[:, 0].set(1.0)
        d = jnp.concatenate([d, dpad])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    return o, d, t_max, active, n


def remap_cluster_prims(scene, prim):
    """Cluster-local prim ids (cidx * Tc + slot) -> global triangle ids.

    The dense cluster kernel (bvh/cluster.py + _kernel_cluster) returns
    slot-local ids; one [N] gather through cluster_refs resolves them.
    Padding slots never win a hit, so the clip is only gather safety."""
    refs = scene.bvh.cluster_refs
    return jnp.where(prim >= 0,
                     refs[jnp.clip(prim, 0, refs.shape[0] - 1)], -1)


def _pallas_hit(scene, o, d, t_max, active, *, stack_depth: int,
                leaf_size: int, packet_size: int, any_hit_mode: bool,
                interleave: int = 1, fused_pair: bool = False):
    from gpupathtracer_tpu.ops.pallas_traverse import LANES, traverse_pallas
    cluster = getattr(scene.bvh, "cluster_rows", None) is not None
    if cluster:  # dense cluster leaves: single-pop kernel only
        interleave, fused_pair = 1, False
    K = max(LANES, (min(packet_size, o.shape[0]) // LANES) * LANES)
    o, d, t_max, active, n = _pad_rays(o, d, t_max, active, K * interleave)
    P = o.shape[0] // K
    interpret = jax.default_backend() != "tpu"
    t, prim, u, v = traverse_pallas(
        scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        t_max.reshape(P, K), active.reshape(P, K),
        arity=scene.bvh.child_entry.shape[1],
        stack_depth=stack_depth, leaf_size=leaf_size,
        # Occlusion queries skip the near-first sort network: the packed-
        # bits push is ~3x cheaper per pop and ordering buys any-hit
        # nothing (measured 14.5 vs 5.0 Mrays/s incoherent, PERF.md r3).
        ordered=not any_hit_mode,
        any_hit=any_hit_mode, interleave=interleave,
        fused_pair=fused_pair, interpret=interpret,
        cluster_rows=scene.bvh.cluster_rows if cluster else None)
    prim = prim.reshape(-1)[:n]
    if cluster and not any_hit_mode:
        # Occlusion consumers read only prim >= 0, which the cluster-
        # local id already answers — skip the [N] remap gather.
        prim = remap_cluster_prims(scene, prim)
    return Hit(t=t.reshape(-1)[:n], prim=prim,
               u=u.reshape(-1)[:n], v=v.reshape(-1)[:n])


def trace_closest(scene, o, d, t_max, active, *, stack_depth: int,
                  leaf_size: int, traversal: str = "packet",
                  packet_size: int = 128, interleave: int = 1,
                  fused_pair: bool = False) -> Hit:
    """Dispatch between traversal implementations ("pallas" on-core kernel,
    "tsort" treelet-sorted packets, "treelet" subtree-binned rounds,
    "packet" XLA shared-stack packets, "perray" lockstep)."""
    traversal = resolve_traversal(traversal)
    if traversal == "treelet":
        from gpupathtracer_tpu.ops.treelet import trace_closest_treelet
        return trace_closest_treelet(scene, o, d, t_max, active,
                                     stack_depth=stack_depth,
                                     leaf_size=leaf_size,
                                     packet_size=max(packet_size, 128))
    if traversal == "tsort":
        from gpupathtracer_tpu.ops.tsort import trace_closest_tsort
        return trace_closest_tsort(scene, o, d, t_max, active,
                                   stack_depth=stack_depth,
                                   leaf_size=leaf_size,
                                   packet_size=max(packet_size, 128),
                                   interleave=interleave,
                                   fused_pair=fused_pair)
    if traversal == "pallas":
        return _pallas_hit(scene, o, d, t_max, active,
                           stack_depth=stack_depth, leaf_size=leaf_size,
                           packet_size=packet_size, any_hit_mode=False,
                           interleave=2 if fused_pair else interleave,
                           fused_pair=fused_pair)
    if traversal == "packet":
        if (scene.bvh.child_entry.shape[1] != 8 or leaf_size > 10
                or getattr(scene.bvh, "cluster_rows", None) is not None):
            # The XLA packet kernel is 8-wide, single-row-leaf only, and
            # reads the merged MT-leaf node_rows (which cluster scenes
            # replace); per-lane is layout-agnostic — it traverses the
            # full child_bounds/child_entry tree that cluster scenes keep.
            return closest_hit(scene.bvh, scene.tri_geom, o, d, t_max,
                               active, stack_depth=stack_depth,
                               leaf_size=leaf_size)
        from gpupathtracer_tpu.ops.packet_traverse import closest_hit_packets
        ps = min(packet_size, o.shape[0])
        o, d, t_max, active, n = _pad_rays(o, d, t_max, active, ps)
        hit = closest_hit_packets(scene.bvh, o, d, t_max, active,
                                  stack_depth=stack_depth,
                                  leaf_size=leaf_size, packet_size=ps)
        return Hit(t=hit.t[:n], prim=hit.prim[:n], u=hit.u[:n], v=hit.v[:n])
    return closest_hit(scene.bvh, scene.tri_geom, o, d, t_max, active,
                       stack_depth=stack_depth, leaf_size=leaf_size)


def trace_occluded(scene, o, d, t_max, active, *, stack_depth: int,
                   leaf_size: int, traversal: str = "packet",
                   packet_size: int = 128, interleave: int = 1,
                   fused_pair: bool = False):
    """Dispatch any-hit/occlusion query."""
    traversal = resolve_traversal(traversal)
    if traversal == "treelet":
        from gpupathtracer_tpu.ops.treelet import trace_occluded_treelet
        return trace_occluded_treelet(scene, o, d, t_max, active,
                                      stack_depth=stack_depth,
                                      leaf_size=leaf_size,
                                      packet_size=max(packet_size, 128))
    if traversal == "tsort":
        from gpupathtracer_tpu.ops.tsort import trace_occluded_tsort
        return trace_occluded_tsort(scene, o, d, t_max, active,
                                    stack_depth=stack_depth,
                                    leaf_size=leaf_size,
                                    packet_size=max(packet_size, 128),
                                    interleave=interleave,
                                    fused_pair=fused_pair)
    if traversal == "pallas":
        hit = _pallas_hit(scene, o, d, t_max, active,
                          stack_depth=stack_depth, leaf_size=leaf_size,
                          packet_size=packet_size, any_hit_mode=True,
                          interleave=2 if fused_pair else interleave,
                          fused_pair=fused_pair)
        return hit.prim >= 0
    if traversal == "packet":
        if (scene.bvh.child_entry.shape[1] != 8 or leaf_size > 10
                or getattr(scene.bvh, "cluster_rows", None) is not None):
            return any_hit(scene.bvh, scene.tri_geom, o, d, t_max, active,
                           stack_depth=stack_depth, leaf_size=leaf_size)
        from gpupathtracer_tpu.ops.packet_traverse import any_hit_packets
        ps = min(packet_size, o.shape[0])
        o, d, t_max, active, n = _pad_rays(o, d, t_max, active, ps)
        occ = any_hit_packets(scene.bvh, o, d, t_max, active,
                              stack_depth=stack_depth, leaf_size=leaf_size,
                              packet_size=ps)
        return occ[:n]
    return any_hit(scene.bvh, scene.tri_geom, o, d, t_max, active,
                   stack_depth=stack_depth, leaf_size=leaf_size)
