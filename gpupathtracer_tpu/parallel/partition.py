"""Partitioned multi-chip traversal — rays migrate, chips own subtrees.

Counterpart of bvh/partition.py at trace time: the merged BVH table is
split into D per-device subtree tables (sharded over the mesh's "chips"
axis, each small enough to pin in VMEM), and ray shards ROTATE around the
ICI ring with `jax.lax.ppermute`. Hop s has chip c traverse the resident
ray block against its local subtree, masked to rays whose slab entry into
this chip's forest bounds is closer than their current best hit; after D
hops every block is home with the globally closest hit.

Why a ring instead of demand-driven all_to_all: static shapes and
uniform per-hop bandwidth are what ICI wants (SURVEY.md §2.5, scaling-book
recipe), and the treelet experiments measured any demand-dependent
regrouping as overhead-bound (PERF.md). The pruning mask plays the role of
near-first descent across chips: most rays are masked on most hops
(measured mean ~2 candidate subtrees per incoherent ray at C=132).

Bandwidth per hop = 48 B/ray (o, d, t, prim, u, v, and the packed
active/tmax lanes) * shard size; D-1 hops per traversal. Cost model in
PERF.md §partitioned-traversal.

Role in the reference: none — single GPU. This is the pod-scale design the
dispatch grid (Renderer.cpp:660) cannot express.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpupathtracer_tpu.bvh.partition import Partition, build_partition
from gpupathtracer_tpu.ops.traverse import Hit, _safe_inv


class RouteInfo(NamedTuple):
    """Replicated per-device routing metadata (a pytree; passes through
    shard_map with a P() spec). With hot-subtree replication
    (bvh/partition.py replicate_hot) hop 0 routes/traverses a different
    forest than later hops — steady hops start at `steady_root` and skip
    the replicated hot subtrees, which every ray already saw on its home
    chip."""

    dev_bounds: jax.Array   # [D, 6] steady forest union (hops >= 1)
    dev_bounds0: jax.Array  # [D, 6] hop-0 forest union (incl. hot)
    steady_root: jax.Array  # [D] i32 root row for hops >= 1


def shard_partition(part: Partition, mesh: Mesh, axis: str = "chips"):
    """Device-put the partition: tables sharded over `axis`, RouteInfo
    (bounds + steady roots) replicated."""
    tables = jax.device_put(
        jnp.asarray(part.tables),
        NamedSharding(mesh, P(axis)))
    rep = NamedSharding(mesh, P())
    db = jnp.asarray(part.dev_bounds)
    db0 = (jnp.asarray(part.dev_bounds0) if part.dev_bounds0 is not None
           else db)
    sroot = (jnp.asarray(part.steady_root, jnp.int32)
             if part.steady_root is not None
             else jnp.zeros((part.tables.shape[0],), jnp.int32))
    route = RouteInfo(dev_bounds=jax.device_put(db, rep),
                      dev_bounds0=jax.device_put(db0, rep),
                      steady_root=jax.device_put(sroot, rep))
    return tables, route


def _local_trace(table, o, d, t_max, active, *, stack_depth, leaf_size,
                 packet_size, any_hit, interpret, root=None,
                 with_pops=False):
    """One chip's traversal of its local subtree (root = synthetic row 0,
    or the scalar `root` entry — the steady root on hops >= 1 when hot
    subtrees are replicated). with_pops appends the summed kernel pop
    count (node + leaf) — the actual traversal work, which the routed-ray
    count cannot stand in for once per-visit table sizes differ (hot
    replication)."""
    from gpupathtracer_tpu.ops.pallas_traverse import LANES, traverse_pallas
    n = o.shape[0]
    K = max(LANES, (min(packet_size, n) // LANES) * LANES)
    pad = (-n) % K
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate(
            [d, jnp.zeros((pad, 3), d.dtype).at[:, 0].set(1.0)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros((pad,), bool)])
    NP = n + pad
    Pk = NP // K
    roots = None if root is None else jnp.full((Pk,), root, jnp.int32)
    out = traverse_pallas(
        table, o.reshape(Pk, K, 3), d.reshape(Pk, K, 3),
        t_max.reshape(Pk, K), active.reshape(Pk, K), roots=roots,
        stack_depth=stack_depth, leaf_size=leaf_size, any_hit=any_hit,
        ordered=not any_hit,  # packed-bits push for occlusion (PERF.md)
        interpret=interpret, with_stats=with_pops)
    if with_pops:
        t, prim, u, v, st = out
        pops = jnp.sum(st[:, :2], dtype=jnp.int32)
    else:
        t, prim, u, v = out
        pops = None
    return (t.reshape(NP)[:n], prim.reshape(NP)[:n],
            u.reshape(NP)[:n], v.reshape(NP)[:n], pops)


def trace_partitioned_local(table, dev_bounds, o, d, t_max, active, *,
                            axis_name: str, num_devices: int,
                            stack_depth: int, leaf_size: int,
                            packet_size: int = 2048, any_hit: bool = False,
                            with_stats: bool = False,
                            interpret: bool = False):
    """Ring-rotation traversal; call INSIDE shard_map.

    Args:
      table: this chip's [M', 128] local subtree table.
      dev_bounds: [D, 6] forest bounds of every chip (replicated), or a
        RouteInfo carrying separate hop-0 bounds + steady roots (hot
        subtrees replicated on every chip, served at hop 0 only).
      o, d, t_max, active: this chip's resident ray shard [n].
    Returns (t, prim, u, v) for the rays that STARTED on this chip.
    With with_stats also returns a [3, D] i32 row: per-hop count of rays
    ROUTED into this chip's subtree (`here`), of rays whose best hit
    IMPROVED (`better`), and of kernel POPS (node + leaf — the actual
    traversal work; visits are not comparable when hot replication gives
    hop 0 a larger root) — the measured inputs of the PERF.md ICI model.
    """
    D = num_devices
    me = jax.lax.axis_index(axis_name)
    n = o.shape[0]
    if isinstance(dev_bounds, RouteInfo):
        steady_b, hop0_b, sroot = dev_bounds
    else:
        steady_b = hop0_b = dev_bounds
        sroot = None

    t = t_max.astype(jnp.float32)
    prim = jnp.full((n,), -1, jnp.int32)
    u = jnp.zeros((n,), jnp.float32)
    v = jnp.zeros((n,), jnp.float32)
    act = active

    state = (o, d, t, prim, u, v, act)
    perm = [(i, (i + 1) % D) for i in range(D)]
    routed, improved, pops = [], [], []

    for step in range(D):
        o_c, d_c, t_c, prim_c, u_c, v_c, act_c = state
        # Route: does this ray enter my forest closer than its current hit?
        # Hop 0 serves the home shard against the hop-0 root (steady +
        # replicated hot subtrees); later hops start at the steady root.
        bounds = hop0_b if step == 0 else steady_b
        root = None if (sroot is None or step == 0) else sroot[me]
        inv = _safe_inv(d_c)
        lo = bounds[me, 0:3][None, :]
        hi = bounds[me, 3:6][None, :]
        t0 = (lo - o_c) * inv
        t1 = (hi - o_c) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        here = (tn <= tf) & (tf > 0.0) & (tn < t_c) & act_c
        if any_hit:
            here = here & (prim_c < 0)

        tt, pp, uu, vv, np_ = _local_trace(
            table, o_c, d_c, t_c, here, stack_depth=stack_depth,
            leaf_size=leaf_size, packet_size=packet_size, any_hit=any_hit,
            interpret=interpret, root=root, with_pops=with_stats)
        better = here & (pp >= 0) & (tt < t_c)
        t_c = jnp.where(better, tt, t_c)
        prim_c = jnp.where(better, pp, prim_c)
        u_c = jnp.where(better, uu, u_c)
        v_c = jnp.where(better, vv, v_c)

        if with_stats:
            routed.append(jnp.sum(here, dtype=jnp.int32))
            improved.append(jnp.sum(better, dtype=jnp.int32))
            pops.append(np_)

        state = (o_c, d_c, t_c, prim_c, u_c, v_c, act_c)
        if step < D - 1:
            state = jax.lax.ppermute(state, axis_name, perm)
    # D-1 hops: rotate once more so blocks land back on their origin chip —
    # only the hit payload (t/prim/u/v); o/d/act are dead after the loop,
    # so shipping them home would waste ~64% of the last hop's ICI bytes.
    t, prim, u, v = jax.lax.ppermute(
        (state[2], state[3], state[4], state[5]), axis_name, perm)
    if with_stats:
        return t, prim, u, v, jnp.stack([jnp.stack(routed),
                                         jnp.stack(improved),
                                         jnp.stack(pops)])
    return t, prim, u, v


def strip_scene_bvh(scene):
    """Scene pytree for the partitioned render step: the merged BVH table
    is NOT replicated (that is the point — each chip holds only its
    subtree slice); every bvh array is cut to its first row, keeping the
    pytree shape valid and the root-bounds helper row the integrator's
    sort-cell code reads. Shading tables (tri_shade/mat_rows/light_rows),
    materials, and the environment stay replicated — they are small and
    any chip may shade a hit found in any other chip's subtree."""
    b = scene.bvh
    return scene._replace(bvh=b._replace(
        child_bounds=b.child_bounds[:1], child_entry=b.child_entry[:1],
        refs=b.refs[:1], node_rows=b.node_rows[:1],
        packet_entry=(b.packet_entry[:1]
                      if b.packet_entry is not None else None),
        cut_entry=b.cut_entry[:1] if b.cut_entry is not None else None,
        cut_bounds=b.cut_bounds[:1] if b.cut_bounds is not None else None))


def render_sample_partitioned(mesh: Mesh, tables, dev_bounds, scene, cam,
                              pixel_x, pixel_y, key, sample_base=0,
                              axis: str = "chips", **static):
    """One scene-PARTITIONED multi-chip frame: pixels sharded over the
    chips axis, the BVH table partitioned per chip, every traversal
    riding the ppermute ring (models/wavefront.py partition mode).

    The distributed-memory counterpart of parallel/mesh.py's replicated
    sharding: D chips hold D-fold smaller resident trees — the regime
    where the packet kernel beats the throughput target (PERF.md
    scene-size curve) — at the cost of ~44 B/ray/hop of ICI traffic.

    pixel_x/pixel_y are the FULL ray-ordered arrays [N]; N must divide
    the chips axis. Returns ([N, 3] radiance, scalar rays traced).

    With a 2-axis mesh ("samples", "chips") the step composes
    data-parallel sample sharding OVER the scene partition — the full
    v5e-8 shape (e.g. 2 sample replicas x 4 subtree owners): each
    samples-row renders an independent spp of the same pixels, the ring
    collectives stay within each row's chips sub-axis, and contributions
    psum over "samples". Callers then treat the result as
    `samples_axis_size` accumulated spp (parallel/mesh.py convention)."""
    from functools import partial as _partial

    from gpupathtracer_tpu.models.wavefront import render_sample_impl

    D = mesh.shape[axis]
    has_samples = "samples" in mesh.axis_names
    scene_s = strip_scene_bvh(scene)

    @_partial(jax.shard_map, mesh=mesh,
              in_specs=(P(), P(), P(axis), P(), P(axis), P(axis), P(), P()),
              out_specs=(P(axis), P()),
              check_vma=False)
    def step(scene, cam, table, bounds, px, py, key, sample_base):
        sidx = sample_base
        if has_samples:
            s = jax.lax.axis_index("samples")
            key = jax.random.fold_in(key, s)
            sidx = sample_base + s
        key = jax.random.fold_in(key, jax.lax.axis_index(axis) + 7177)
        contribution, rays = render_sample_impl(
            scene, cam, px, py, key,
            partition=(table[0], bounds), partition_axis=axis,
            num_chips=D, sample_idx=sidx, **static)
        if has_samples:
            contribution = jax.lax.psum(contribution, "samples")
            rays = jax.lax.psum(rays, "samples")
        return contribution, jax.lax.psum(rays, axis)

    return step(scene_s, cam, tables, dev_bounds, pixel_x, pixel_y, key,
                jnp.asarray(sample_base, jnp.int32))


def trace_closest_partitioned(mesh: Mesh, tables, dev_bounds, o, d, t_max,
                              active, *, stack_depth: int, leaf_size: int,
                              packet_size: int = 2048,
                              any_hit: bool = False,
                              with_stats: bool = False,
                              axis: str = "chips",
                              interpret: bool | None = None):
    """shard_map wrapper: full [N] rays in, full [N] Hit out (N must divide
    the chips axis). with_stats additionally returns a [D, 3, D] i32 array
    of per-(SERVING-chip, hop) routed/improved ray counts and kernel pops:
    row c holds chip c's counters over the shards resident on it each hop
    (the shard that originated on chip (c - hop) mod D), which is the
    per-chip LOAD convention tools/partition_bench.py reports."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    D = mesh.shape[axis]
    n_stats = (P(axis),) if with_stats else ()

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(), P(axis), P(axis), P(axis), P(axis)),
             out_specs=(P(axis),) * 4 + n_stats,
             check_vma=False)
    def run(table, bounds, o_l, d_l, tm_l, act_l):
        out = trace_partitioned_local(
            table[0], bounds, o_l, d_l, tm_l, act_l, axis_name=axis,
            num_devices=D, stack_depth=stack_depth, leaf_size=leaf_size,
            packet_size=packet_size, any_hit=any_hit,
            with_stats=with_stats, interpret=interpret)
        if with_stats:
            t_, p_, u_, v_, cnt = out
            return t_, p_, u_, v_, cnt[None]  # [1, 3, D] -> gathers to [D, 3, D]
        return out

    out = run(tables, dev_bounds, o, d, t_max, active)
    stats = None
    if with_stats:
        t, prim, u, v, stats = out
    else:
        t, prim, u, v = out
    if any_hit:
        return (prim >= 0, stats) if with_stats else prim >= 0
    hit = Hit(t=t, prim=prim, u=u, v=v)
    return (hit, stats) if with_stats else hit
