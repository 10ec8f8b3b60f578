"""Dense cluster leaves (bvh/cluster.py + _kernel_cluster): build
invariants and interpret-mode hit equivalence vs the Moller-Trumbore
per-lane reference traversal.

Like ops/dense_intersect.py, the cluster leaf phase computes t/u/v via
the precomputed inverse-matrix form — the same hit set in exact
arithmetic, different rounding — so hit equivalence is tolerance-based
(prim may differ only where two surfaces tie within tolerance).
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.cluster import pack_clusters
from gpupathtracer_tpu.bvh.types import INVALID_ENTRY, decode_leaf_entry
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
from gpupathtracer_tpu.ops.traverse import (any_hit, closest_hit,
                                            trace_closest, trace_occluded)
from gpupathtracer_tpu.ops.tsort import (trace_closest_tsort,
                                         trace_occluded_tsort)

pytestmark = pytest.mark.slow  # traversal jits dominate; quick tier skips


def _soup(seed=7, n=3000):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.5, 0.5, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def _cluster_scene(seed=7, n=3000, tc=128):
    p0, p1, p2 = _soup(seed, n)
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=10, force_leaf=True,
                                 builder="numpy")
    cw = pack_clusters(wide, p0, p1 - p0, p2 - p0, tc=tc)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in cw))
    depth = stats.max_depth * 7 + 2
    scene = SimpleNamespace(bvh=dev, tri_geom=geom)
    return scene, cw, stats, depth


def _rays(rng, n):
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_build_invariants():
    n, tc = 3000, 128
    _, cw, _, _ = _cluster_scene(n=n, tc=tc)
    ncl = cw.cluster_rows.shape[0] // 8
    crefs = np.asarray(cw.cluster_refs).reshape(ncl, tc)
    # Every triangle reachable through >= 1 cluster.
    covered = set()
    fill = []
    for c in range(ncl):
        live = np.count_nonzero(
            np.abs(cw.cluster_rows[c * 8:(c + 1) * 8]).sum(axis=0)) // 3
        # wd columns: a cluster's first `size` slots are real triangles.
        ids = crefs[c]
        used = ids[np.arange(tc) < max(live // 1, 1)]
        covered.update(int(x) for x in ids)
        fill.append(live)
    assert set(range(n)) <= covered
    # Top tree: entries either internal (< Wc) or cluster leaves (< ncl).
    Wc = cw.node_rows.shape[0]
    entries = np.asarray(cw.node_rows[:, 48:56]).view(np.int32)
    for e in entries.reshape(-1):
        if e == INVALID_ENTRY:
            continue
        if e >= 0:
            assert e < Wc
        else:
            cidx, _ = decode_leaf_entry(int(e))
            assert 0 <= cidx < ncl
    # Top tree is a real tree (several levels for 3k tris at tc=128).
    assert Wc >= 2
    assert ncl >= n // tc


def _check_hits(t, prim, u, ref, act, tri_geom=None):
    t_d, t_r = np.asarray(t), np.asarray(ref.t)
    p_d, p_r = np.asarray(prim), np.asarray(ref.prim)
    a = np.asarray(act)
    hit_close = np.isclose(t_d, t_r, rtol=1e-3, atol=1e-4)
    assert ((p_d >= 0) == (p_r >= 0))[a].mean() > 0.995
    both = a & (p_d >= 0) & (p_r >= 0)
    assert hit_close[both].mean() > 0.995
    same = p_d == p_r
    assert (same | ~both | hit_close)[a].all()
    agree = both & same & hit_close
    np.testing.assert_allclose(np.asarray(u)[agree], np.asarray(ref.u)[agree],
                               rtol=5e-2, atol=5e-3)
    # Inactive lanes untouched.
    assert (p_d[~a] == -1).all()


def test_cluster_closest_matches_perray():
    scene, cw, _, depth = _cluster_scene()
    rng = np.random.RandomState(11)
    n = 2048
    o, d = _rays(rng, n)
    tmax = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(n) > 0.15)

    P, K = n // 2048, 2048
    t, prim, u, v = traverse_pallas(
        scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), act.reshape(P, K), stack_depth=depth,
        interpret=True, cluster_rows=scene.bvh.cluster_rows)
    prim_g = np.where(np.asarray(prim).reshape(-1) >= 0,
                      np.asarray(cw.cluster_refs)[
                          np.clip(np.asarray(prim).reshape(-1), 0, None)],
                      -1)
    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax, act,
                      stack_depth=depth, leaf_size=10)
    _check_hits(np.asarray(t).reshape(-1), prim_g,
                np.asarray(u).reshape(-1), ref, act)


def test_cluster_dispatch_pallas_and_tsort():
    """trace_closest/trace_occluded route cluster scenes through the
    cluster kernel and remap prim ids to global triangles."""
    scene, _, _, depth = _cluster_scene(n=1500)
    rng = np.random.RandomState(3)
    n = 700  # non-multiple of the packet size: exercises padding
    o, d = _rays(rng, n)
    tmax = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(n) > 0.1)
    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax, act,
                      stack_depth=depth, leaf_size=10)
    hit = trace_closest(scene, o, d, tmax, act, stack_depth=depth,
                        leaf_size=10, traversal="pallas", packet_size=512)
    _check_hits(hit.t, hit.prim, hit.u, ref, act)
    hit2 = trace_closest_tsort(scene, o, d, tmax, act, stack_depth=depth,
                               leaf_size=10, packet_size=512,
                               interpret=True)
    _check_hits(hit2.t, hit2.prim, hit2.u, ref, act)

    tshort = jnp.full((n,), 5.0, jnp.float32)
    occ_ref = np.asarray(any_hit(scene.bvh, scene.tri_geom, o, d, tshort,
                                 act, stack_depth=depth, leaf_size=10))
    occ = np.asarray(trace_occluded(scene, o, d, tshort, act,
                                    stack_depth=depth, leaf_size=10,
                                    traversal="pallas", packet_size=512))
    assert (occ == occ_ref).mean() > 0.99
    occ2 = np.asarray(trace_occluded_tsort(scene, o, d, tshort, act,
                                           stack_depth=depth, leaf_size=10,
                                           packet_size=512, interpret=True))
    assert (occ2 == occ_ref).mean() > 0.99


def test_cluster_packet_fallback_uses_full_tree():
    """The XLA 'packet' path cannot decode cluster node_rows; the dispatch
    must fall back to the per-lane traversal of the intact full tree."""
    scene, _, _, depth = _cluster_scene(n=900)
    rng = np.random.RandomState(5)
    o, d = _rays(rng, 400)
    tmax = jnp.full((400,), 1e20, jnp.float32)
    act = jnp.ones((400,), bool)
    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax, act,
                      stack_depth=depth, leaf_size=10)
    hit = trace_closest(scene, o, d, tmax, act, stack_depth=depth,
                        leaf_size=10, traversal="packet", packet_size=128)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-6)
    assert (np.asarray(hit.prim) == np.asarray(ref.prim)).all()


def test_cluster_stats_counters():
    scene, _, _, depth = _cluster_scene(n=1500)
    rng = np.random.RandomState(9)
    n = 2048
    o, d = _rays(rng, n)
    tmax = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.ones((n,), bool)
    out = traverse_pallas(
        scene.bvh.node_rows, o.reshape(1, n, 3), d.reshape(1, n, 3),
        tmax.reshape(1, n), act.reshape(1, n), stack_depth=depth,
        interpret=True, with_stats=True,
        cluster_rows=scene.bvh.cluster_rows)
    stats = np.asarray(out[4])
    assert stats.shape == (1, 3)
    node_pops, cluster_pops = int(stats[0, 0]), int(stats[0, 1])
    skipped = int(stats[0, 2])
    ncl = scene.bvh.cluster_rows.shape[0] // 8
    assert node_pops >= 1
    assert 1 <= cluster_pops <= ncl  # bounded by cluster count per packet
    assert skipped >= 0  # t-pruned pop skips (counted, not run)


def test_cluster_megakernel_matches_mt_mega():
    """Megakernel with dense cluster walks vs the MT megakernel: identical
    RNG streams (same seed/packet layout), hits differ only by inverse-
    matrix rounding — per-pixel direct lighting must agree tightly."""
    import math

    import jax

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import generate_image_plane
    from gpupathtracer_tpu.ops.megakernel import (mega_eligible,
                                                  pack_mega_tables,
                                                  render_sample_mega)
    from gpupathtracer_tpu.scene import load_scene

    def build(cluster):
        cfg = RenderConfig(scene_path="proc:cornell",
                           skybox="GENERATE COLOR BLACK",
                           width=16, height=16, cache_enabled=True,
                           cluster_tris=128 if cluster else 0)
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
        return cfg, *load_scene(cfg)

    cfg, scene_mt, meta = build(False)
    _, scene_cl, meta_cl = build(True)
    assert scene_cl.bvh.cluster_rows is not None
    assert mega_eligible(scene_cl, meta_cl, textured=False, delta=False,
                         sun=False)
    cam = generate_image_plane(cfg.camera)
    n = 256
    idx = np.arange(n)
    px = jnp.asarray((idx % 16).astype(np.float32))
    py = jnp.asarray((idx // 16).astype(np.float32))
    key = jax.random.PRNGKey(5)

    def run(scene, meta_, bounces):
        tables = pack_mega_tables(scene)
        acc = None
        for s in range(3):
            c, _ = render_sample_mega(
                scene, tables, cam, px, py, jax.random.fold_in(key, s),
                width=16, height=16, stack_depth=meta_.stack_depth,
                leaf_size=meta_.leaf_size, max_bounces=bounces, nee=True,
                n_mats=meta_.num_materials,
                n_lights=int(scene.light_rows.shape[0]),
                packet_size=256, interpret=True, sample_idx=s)
            acc = c if acc is None else acc + c
        return np.asarray(acc) / 3

    # Direct lighting: deterministic up to hit rounding.
    d_mt = run(scene_mt, meta, 0)
    d_cl = run(scene_cl, meta_cl, 0)
    close = np.isclose(d_cl, d_mt, rtol=1e-3, atol=1e-3).all(axis=1)
    assert close.mean() > 0.99
    # Path traced: identical RNG streams; rare rounding-flipped bounces
    # allowed, the rest must match.
    p_mt = run(scene_mt, meta, 4)
    p_cl = run(scene_cl, meta_cl, 4)
    close_p = np.isclose(p_cl, p_mt, rtol=1e-2, atol=2e-2).all(axis=1)
    assert close_p.mean() > 0.97
