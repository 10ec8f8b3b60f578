"""Multi-chip scene partitioning (bvh/partition.py + parallel/partition.py):
per-device subtree tables, ring ray migration, equivalence vs the
replicated whole-tree traversal on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gpupathtracer_tpu.bvh.partition import build_partition
from gpupathtracer_tpu.bvh.types import INVALID_ENTRY, decode_leaf_entry
from gpupathtracer_tpu.config import RenderConfig
from gpupathtracer_tpu.ops.traverse import trace_closest, trace_occluded
from gpupathtracer_tpu.parallel.partition import (shard_partition,
                                                  trace_closest_partitioned)
from gpupathtracer_tpu.scene import load_scene


@pytest.fixture(scope="module")
def bunny():
    cfg = RenderConfig(scene_path="proc:bunny",
                       skybox="GENERATE COLOR BLACK",
                       width=32, height=32, cache_enabled=True)
    return load_scene(cfg)


def _leaf_rows_of(table, root_entry=0):
    """Reachable leaf rows (as (row, count) pairs) from a table's root."""
    entries = table[:, 48:56].copy().view(np.int32)
    out = set()
    stack = [root_entry]
    seen = set()
    while stack:
        e = stack.pop()
        if e < 0:
            out.add(decode_leaf_entry(e))
            continue
        if e in seen:
            continue
        seen.add(e)
        for j in range(8):
            c = int(entries[e, j])
            if c != INVALID_ENTRY:
                stack.append(c)
    return out


def test_partition_covers_all_triangles(bunny):
    """Every triangle id of the full tree appears in exactly the union of
    the per-device tables (duplication across devices allowed only via
    SBVH reference duplication, which shares prim ids)."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)

    def prims_of(table, leaf_rows):
        prims = set()
        for row, count in leaf_rows:
            for k in range(count):
                pid = table[row, k * 12 + 9:k * 12 + 10].view(np.int32)[0]
                prims.add(int(pid))
        return prims

    full = prims_of(rows, _leaf_rows_of(rows))
    union = set()
    for gg in range(8):
        tbl = part.tables[gg]
        union |= prims_of(tbl, _leaf_rows_of(tbl))
    assert union == full
    # The partition actually splits: no device holds the whole tree.
    assert int(part.num_rows.max()) < rows.shape[0]
    assert int(part.num_rows.sum()) >= rows.shape[0]  # + D synthetic roots


def test_partitioned_trace_matches_replicated(bunny):
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, dev_bounds = shard_partition(part, mesh)

    N = 1024
    rng = np.random.RandomState(7)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.1)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    ref = trace_closest(scene, o, d, tmax, act, traversal="pallas", **kw)
    hit = trace_closest_partitioned(mesh, tables, dev_bounds, o, d, tmax,
                                    act, **kw)
    t_p, t_r = np.asarray(hit.t), np.asarray(ref.t)
    np.testing.assert_allclose(t_p, t_r, rtol=1e-5, atol=1e-5)
    # Exact-t ties between coplanar triangles may resolve to a different
    # (equally correct) prim across the ring order.
    same = np.asarray(hit.prim) == np.asarray(ref.prim)
    assert (same | np.isclose(t_p, t_r, rtol=1e-6, atol=1e-6)).all()


def test_partitioned_stats_counters(bunny):
    """with_stats: the per-(chip, hop) routed/improved counters are
    consistent — results unchanged, improved <= routed, every found hit
    implies at least one improving hop, and total routed/ray (the hops/ray
    V of the PERF.md ICI model, measured by tools/partition_bench.py) is
    bounded by the ring length."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, dev_bounds = shard_partition(part, mesh)

    N = 512
    rng = np.random.RandomState(3)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.1)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    plain = trace_closest_partitioned(mesh, tables, dev_bounds, o, d, tmax,
                                      act, **kw)
    hit, stats = trace_closest_partitioned(mesh, tables, dev_bounds, o, d,
                                           tmax, act, with_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(hit.t), np.asarray(plain.t))
    s = np.asarray(stats)
    assert s.shape == (8, 3, 8)
    routed, improved, pops = s[:, 0, :], s[:, 1, :], s[:, 2, :]
    assert (improved <= routed).all()
    n_hits = int((np.asarray(hit.prim) >= 0).sum())
    assert improved.sum() >= n_hits > 0
    n_act = int(np.asarray(act).sum())
    v = routed.sum() / n_act
    assert 0.0 < v <= 8.0
    # Kernel pops (node + leaf): real work happens exactly where rays
    # route — every hop with routed rays pops at least the local root.
    assert (pops[routed > 0] > 0).all()
    assert pops.sum() >= routed.sum() // 128  # >= one pop per packet


def test_partitioned_occlusion_matches_replicated(bunny):
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, dev_bounds = shard_partition(part, mesh)

    N = 512
    rng = np.random.RandomState(9)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 3.0, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.15)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    ref = trace_occluded(scene, o, d, tmax, act, traversal="pallas", **kw)
    occ = trace_closest_partitioned(mesh, tables, dev_bounds, o, d, tmax,
                                    act, any_hit=True, **kw)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_partitioned_render_step(bunny):
    """Full wavefront integrator over the partitioned scene: pixels
    sharded on the chips axis, per-chip subtree tables, every traversal
    riding the ppermute ring; loop conditions are collective so all chips
    execute the ring in lockstep. Statistical agreement with the plain
    renderer + bitwise determinism."""
    import math

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import generate_image_plane
    from gpupathtracer_tpu.models.wavefront import render_sample
    from gpupathtracer_tpu.parallel.partition import \
        render_sample_partitioned
    from gpupathtracer_tpu.scene import load_scene

    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=16, height=16, cache_enabled=True)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    scene, meta = load_scene(cfg)
    cam = generate_image_plane(cfg.camera)
    part = build_partition(np.asarray(scene.bvh.node_rows),
                           scene.bvh.child_bounds.shape[0], 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, dev_bounds = shard_partition(part, mesh)

    N = 256
    idx = np.arange(N)
    px = jnp.asarray((idx % 16).astype(np.float32))
    py = jnp.asarray((idx // 16).astype(np.float32))
    key = jax.random.PRNGKey(0)
    static = dict(width=16, height=16, max_bounces=3,
                  stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
                  nee=True, compaction=False)

    c, rays = render_sample_partitioned(mesh, tables, dev_bounds, scene,
                                        cam, px, py, key, **static)
    c = np.asarray(c)
    assert c.shape == (N, 3) and np.isfinite(c).all() and c.mean() > 0
    assert int(rays) > N  # NEE + bounces traced across the ring

    ref, _ = render_sample(scene, cam, px, py, key, **static)
    r = np.asarray(ref)
    assert abs(c.mean() - r.mean()) / r.mean() < 0.35

    c2, _ = render_sample_partitioned(mesh, tables, dev_bounds, scene,
                                      cam, px, py, key, **static)
    np.testing.assert_array_equal(c, np.asarray(c2))

    # Demand-routed migration produces the SAME frame bit for bit: the
    # routed trace returns identical hits (see the trace-level tests), so
    # the whole estimator — RNG, shading, NEE — is unchanged.
    c3, _ = render_sample_partitioned(mesh, tables, dev_bounds, scene,
                                      cam, px, py, key,
                                      partition_routing="routed", **static)
    np.testing.assert_array_equal(c, np.asarray(c3))


def test_partitioned_render_with_samples_axis(bunny):
    """(samples, chips) composition: data-parallel sample replicas over
    the scene partition — 2 sample rows x 4 subtree owners on the CPU
    mesh. The ring collectives stay within each row's chips sub-axis."""
    import math

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import generate_image_plane
    from gpupathtracer_tpu.parallel.partition import \
        render_sample_partitioned
    from gpupathtracer_tpu.scene import load_scene

    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=16, height=16, cache_enabled=True)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    scene, meta = load_scene(cfg)
    cam = generate_image_plane(cfg.camera)
    part = build_partition(np.asarray(scene.bvh.node_rows),
                           scene.bvh.child_bounds.shape[0], 4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                axis_names=("samples", "chips"))
    tables, dev_bounds = shard_partition(part, mesh)

    N = 256
    idx = np.arange(N)
    px = jnp.asarray((idx % 16).astype(np.float32))
    py = jnp.asarray((idx // 16).astype(np.float32))
    c, rays = render_sample_partitioned(
        mesh, tables, dev_bounds, scene, cam, px, py,
        jax.random.PRNGKey(2), width=16, height=16, max_bounces=2,
        stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
        nee=True, compaction=False)
    c = np.asarray(c)
    # 2 accumulated samples per pixel, summed over the samples axis.
    assert c.shape == (N, 3) and np.isfinite(c).all() and c.mean() > 0
    assert int(rays) > 2 * N


def test_partitioned_trace_replicate_hot(bunny):
    """Hot-subtree replication (build_partition(replicate_hot=K)): hop-0
    roots carry the K hottest subtrees on EVERY chip, steady roots drop
    them everywhere (including the former owner), so each ray still sees
    each subtree exactly once — results must match the replicated
    whole-tree traversal exactly, closest and any-hit."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8, replicate_hot=2)
    base = build_partition(rows, W, 8, replicate_hot=0)

    # Structure: a steady root exists past the hop-0 root, tables grew by
    # the replicated rows, and the hop-0 forest union covers the steady.
    assert (part.steady_root > 0).all()
    assert int(part.num_rows.sum()) > int(base.num_rows.sum())
    assert (part.dev_bounds0[:, 0:3] <= part.dev_bounds[:, 0:3] + 1e-6).all()

    # Leaf coverage: hop-0 roots alone cover the full tree's triangles on
    # every chip's ray population (union over chips of steady + hot).
    union = set()
    for g in range(8):
        union |= _leaf_rows_of(part.tables[g], root_entry=0)
        # steady root reaches a subset of the hop-0 root's leaves
        steady = _leaf_rows_of(part.tables[g],
                               root_entry=int(part.steady_root[g]))
        assert steady <= _leaf_rows_of(part.tables[g], root_entry=0)

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, route = shard_partition(part, mesh)

    N = 1024
    rng = np.random.RandomState(21)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.1)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    ref = trace_closest(scene, o, d, tmax, act, traversal="pallas", **kw)
    hit = trace_closest_partitioned(mesh, tables, route, o, d, tmax,
                                    act, **kw)
    t_p, t_r = np.asarray(hit.t), np.asarray(ref.t)
    np.testing.assert_allclose(t_p, t_r, rtol=1e-5, atol=1e-5)
    same = np.asarray(hit.prim) == np.asarray(ref.prim)
    assert (same | np.isclose(t_p, t_r, rtol=1e-6, atol=1e-6)).all()

    tm3 = jnp.full((N,), 3.0, jnp.float32)
    occ_ref = trace_occluded(scene, o, d, tm3, act, traversal="pallas",
                             **kw)
    occ = trace_closest_partitioned(mesh, tables, route, o, d, tm3, act,
                                    any_hit=True, **kw)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))


def test_pilot_visit_counts(bunny):
    """count_entry_visits + node_bucket_map (pops-attributed pilot
    demand): buckets cover the tree below the cut, counts land only in
    real buckets, and the counting traversal is the same traversal
    (hits unchanged vs trace_closest perray)."""
    from gpupathtracer_tpu.bvh.partition import (node_bucket_map,
                                                 partition_cut)
    from gpupathtracer_tpu.ops.traverse import closest_hit, \
        count_entry_visits

    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    cut_e, _ = partition_cut(rows, W, 8)
    C = len(cut_e)
    bucket = node_bucket_map(rows, W, cut_e)
    assert bucket.shape == (W,)
    assert int(bucket[0]) == C  # root sits above the cut
    assert (bucket <= C).all() and (bucket >= 0).all()
    assert (bucket < C).sum() > 0  # the cut covers real nodes

    N = 256
    rng = np.random.RandomState(5)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    counts = np.asarray(count_entry_visits(
        scene.bvh, scene.tri_geom, o, d, tmax, bucket, C + 1,
        stack_depth=meta.stack_depth, leaf_size=meta.leaf_size))
    assert counts.shape == (C + 1,)
    assert counts[:C].sum() > 0

    # The counting traversal must not change traversal results.
    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax,
                      stack_depth=meta.stack_depth,
                      leaf_size=meta.leaf_size)
    assert np.isfinite(np.asarray(ref.t)).all()


def test_replicate_hot_two_level_roots(bunny):
    """D=3 partition with 6 replicated hot entries: hop-0 roots hold >8
    children, so they need a second synthetic level and the steady root
    lands past it (the _emit_root(at>0) layout). Equivalence vs the
    replicated tree on a 3-chip mesh."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 3, replicate_hot=6)
    # The layout actually grew second levels (else this test is vacuous).
    assert (part.steady_root > 1).any(), part.steady_root
    mesh = Mesh(np.array(jax.devices()[:3]), axis_names=("chips",))
    tables, route = shard_partition(part, mesh)

    N = 510  # divides the 3-chip axis
    rng = np.random.RandomState(31)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.ones((N,), bool)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    ref = trace_closest(scene, o, d, tmax, act, traversal="pallas", **kw)
    hit = trace_closest_partitioned(mesh, tables, route, o, d, tmax,
                                    act, **kw)
    t_p, t_r = np.asarray(hit.t), np.asarray(ref.t)
    np.testing.assert_allclose(t_p, t_r, rtol=1e-5, atol=1e-5)
    same = np.asarray(hit.prim) == np.asarray(ref.prim)
    assert (same | np.isclose(t_p, t_r, rtol=1e-6, atol=1e-6)).all()


def test_hot_entries_dedup(bunny):
    """Duplicate explicit hot_entries must build the identical partition
    as the deduped list — a duplicate would otherwise emit the same
    subtree twice into every hop-0 root, doubling its pops per ray."""
    scene, _ = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    a = build_partition(rows, W, 4, hot_entries=[1, 1, 2, 2, 1])
    b = build_partition(rows, W, 4, hot_entries=[1, 2])
    np.testing.assert_array_equal(a.tables, b.tables)
    np.testing.assert_array_equal(a.steady_root, b.steady_root)
    np.testing.assert_array_equal(a.num_rows, b.num_rows)


def test_group_cap_repair():
    """The two-level synthetic root caps a group at 64 - len(hot) steady
    entries; the kd/LPT grouping balances by weight, not count, so a
    skewed cut can overfill one group. _repair_group_caps must move the
    smallest members to the emptiest groups instead of crashing, and
    must raise only when the cap is genuinely infeasible."""
    from gpupathtracer_tpu.bvh.partition import _repair_group_caps

    sizes = {i: i + 1 for i in range(80)}
    groups = [list(range(70)), list(range(70, 75)), list(range(75, 80))]
    _repair_group_caps(groups, sizes, cap=30)
    assert sorted(i for g in groups for i in g) == list(range(80))
    assert all(len(g) <= 30 for g in groups)

    with pytest.raises(ValueError, match="exceed"):
        _repair_group_caps([list(range(10)), []], {i: 1 for i in range(10)},
                           cap=4)


def test_renderer_partition_mode():
    """cfg.partition_chips: the full Renderer surface (progressive
    accumulation, film, stats) over the scene-partitioned mesh —
    compaction rides the collective ring. Statistical agreement with the
    plain renderer and bitwise determinism; the (samples x chips)
    composition accumulates S spp per frame."""
    import math

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    def _cfg(**kw):
        cfg = RenderConfig(scene_path="proc:cornell",
                           skybox="GENERATE COLOR BLACK",
                           width=16, height=16, max_bounces=3,
                           cache_enabled=True, **kw)
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
        return cfg

    r = Renderer(_cfg(partition_chips=8))
    for _ in range(4):
        r.render_frame()
    r.sync()
    img = r.film_hdr()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0
    assert r.num_samples == 4

    plain = Renderer(_cfg())
    for _ in range(4):
        plain.render_frame()
    plain.sync()
    ref = plain.film_hdr()
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.3

    # Bitwise determinism of the partitioned accumulation.
    r2 = Renderer(_cfg(partition_chips=8), scene=r.scene, meta=r.meta)
    for _ in range(4):
        r2.render_frame()
    r2.sync()
    np.testing.assert_array_equal(np.asarray(r.accum), np.asarray(r2.accum))

    # Sample-axis composition: S spp per frame.
    rs = Renderer(_cfg(partition_chips=4, partition_samples=2),
                  scene=r.scene, meta=r.meta)
    rs.render_frame(sync=True)
    assert rs.num_samples == 2
    assert np.isfinite(rs.film_hdr()).all()

    # Misconfiguration fails loudly.
    with pytest.raises(ValueError):
        Renderer(_cfg(partition_chips=8, mesh_shape=(2, 4)),
                 scene=r.scene, meta=r.meta)


def test_partitioned_trace_ici_contract(bunny):
    """HLO-level pin of the ICI contract (PERF.md cost model): the
    partitioned trace moves ray state ONLY via collective-permute (the
    static ring — uniform per-hop bandwidth), with NO all-reduce /
    all-gather / all-to-all / reduce-scatter anywhere, so a refactor
    cannot silently introduce demand-dependent exchanges or film-sized
    reductions into the traversal."""
    import re

    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, route = shard_partition(part, mesh)

    N = 1024
    o = jnp.zeros((N, 3), jnp.float32)
    d = jnp.zeros((N, 3), jnp.float32).at[:, 0].set(1.0)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.ones((N,), bool)

    def fn(tables, route, o, d, tmax, act):
        return trace_closest_partitioned(
            mesh, tables, route, o, d, tmax, act,
            stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
            packet_size=128, interpret=True)

    txt = (jax.jit(fn).lower(tables, route, o, d, tmax, act)
           .compile().as_text())
    assert re.search(r"collective-permute", txt), "ring ppermute missing"
    bad = [ln for ln in txt.splitlines()
           if re.search(r"all-reduce|all-gather|all-to-all|reduce-scatter",
                        ln)]
    assert not bad, f"unexpected collectives in the trace: {bad[:3]}"


def test_routed_trace_matches_ring(bunny):
    """Demand-routed exchange (trace_partitioned_routed) returns the SAME
    hits as the ring: a chip is skipped only when the ray's entry t into
    its forest is >= the final hit t, which cannot contribute, so t is
    bitwise-identical (same kernel, same table, same ray on the owning
    chip). Stats invariants: every ray delivered, pops concentrated in
    the early rounds, transported counts bounded by the bucket budget."""
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)  # replicate_hot default
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, route = shard_partition(part, mesh)

    N = 1024
    rng = np.random.RandomState(11)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.1)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128)

    ring = trace_closest_partitioned(mesh, tables, route, o, d, tmax,
                                     act, **kw)
    routed, stats = trace_closest_partitioned(
        mesh, tables, route, o, d, tmax, act, routing="routed",
        max_rounds=10, with_stats=True, **kw)

    s_pre = np.asarray(stats)
    assert int(s_pre[:, 3, -1].sum()) == 0, \
        "undelivered rays after max_rounds (truncation)"
    np.testing.assert_array_equal(np.asarray(routed.t), np.asarray(ring.t))
    same = np.asarray(routed.prim) == np.asarray(ring.prim)
    assert (same | np.isclose(np.asarray(routed.t), np.asarray(ring.t),
                              rtol=1e-6, atol=1e-6)).all()

    s = np.asarray(stats)                 # [D, 4, R+1]
    assert s.shape == (8, 4, 11)
    pops, sent, dlvr, live = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    n_act = int(np.asarray(act).sum())
    assert int(dlvr.sum()) == n_act       # every active ray delivered once
    assert pops.sum() > 0 and pops[:, 0].sum() >= pops[:, -1].sum()
    assert (sent >= 0).all()


def test_routed_occlusion_matches_ring(bunny):
    scene, meta = bunny
    rows = np.asarray(scene.bvh.node_rows)
    W = scene.bvh.child_bounds.shape[0]
    part = build_partition(rows, W, 8)
    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("chips",))
    tables, route = shard_partition(part, mesh)

    N = 1024
    rng = np.random.RandomState(13)
    o = jnp.asarray(rng.uniform(-2, 2, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 4.0, jnp.float32)
    act = jnp.ones((N,), bool)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
              packet_size=128, any_hit=True)

    occ_ring = trace_closest_partitioned(mesh, tables, route, o, d, tmax,
                                         act, **kw)
    occ_routed, stats = trace_closest_partitioned(
        mesh, tables, route, o, d, tmax, act, routing="routed",
        max_rounds=10, with_stats=True, **kw)
    np.testing.assert_array_equal(np.asarray(occ_routed),
                                  np.asarray(occ_ring))
    assert int(np.asarray(stats)[:, 3, -1].sum()) == 0
