"""Treelet-binned traversal (ops/treelet.py): cut coverage + interpret-mode
equivalence vs the per-ray reference semantics (BVH.glsl:634-854 roles)."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.treelet import build_treelet_cut
from gpupathtracer_tpu.bvh.types import INVALID_ENTRY, decode_leaf_entry
from gpupathtracer_tpu.bvh.wide import pack_for_packets
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.traverse import any_hit, closest_hit
from gpupathtracer_tpu.ops.treelet import (trace_closest_treelet,
                                           trace_occluded_treelet)
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def _scene(seed=7, n=400, leaf_size=4):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=leaf_size,
                                 builder="numpy")
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, leaf_size)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 7 + 2
    scene = SimpleNamespace(bvh=dev, tri_geom=geom)
    return scene, wide, stats, depth


def _rays(rng, n):
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cut_covers_every_ref():
    """Every leaf reference range is reachable from exactly one cut entry."""
    _, wide, stats, _ = _scene(seed=3, n=600)
    W = stats.num_wide_nodes
    entries = wide.node_rows[:W, 48:56].copy().view(np.int32)
    cut = wide.cut_entry
    assert cut is not None and len(cut) >= 2
    assert len(cut) <= 135  # target 128 + up to 7 overshoot

    covered = set()

    def walk(e):
        if e < 0:
            row, count = decode_leaf_entry(e)
            assert (row, count) not in covered or count == 0
            covered.add((row, count))
        else:
            for j in range(8):
                c = int(entries[e, j])
                if c != INVALID_ENTRY:
                    walk(c)

    for e in cut:
        walk(int(e))

    # Full walk from the root must reach exactly the same leaf set.
    full = set()

    def walk_full(e):
        if e < 0:
            full.add(decode_leaf_entry(e))
        else:
            for j in range(8):
                c = int(entries[e, j])
                if c != INVALID_ENTRY:
                    walk_full(c)

    walk_full(0)
    assert covered == full


def test_treelet_closest_matches_perray():
    scene, _, _, depth = _scene()
    rng = np.random.RandomState(3)
    N = 700  # deliberately no relation to the packet size
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    active = jnp.ones((N,), bool)

    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax,
                      stack_depth=depth)
    hit = trace_closest_treelet(scene, o, d, tmax, active,
                                stack_depth=depth, leaf_size=4,
                                packet_size=128, interpret=True)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit.prim) < 0,
                                  np.asarray(ref.prim) < 0)
    # Matching prim ids wherever the reference found a hit (ties on exact
    # equal-t are the only allowed difference; none occur in random soup).
    m = np.asarray(ref.prim) >= 0
    np.testing.assert_array_equal(np.asarray(hit.prim)[m],
                                  np.asarray(ref.prim)[m])


def test_treelet_occlusion_and_inactive():
    scene, _, _, depth = _scene(seed=11)
    rng = np.random.RandomState(5)
    N = 300
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 4.0, jnp.float32)
    active = jnp.asarray(rng.rand(N) < 0.7)

    occ_ref = any_hit(scene.bvh, scene.tri_geom, o, d, tmax, active,
                      stack_depth=depth)
    occ = trace_occluded_treelet(scene, o, d, tmax, active,
                                 stack_depth=depth, leaf_size=4,
                                 packet_size=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))

    # Inactive rays must never report a hit in closest mode either.
    hit = trace_closest_treelet(scene, o, d, tmax, active,
                                stack_depth=depth, leaf_size=4,
                                packet_size=128, interpret=True)
    assert (np.asarray(hit.prim)[~np.asarray(active)] < 0).all()


def test_treelet_capacity_overflow_retries():
    """A tiny bin capacity forces multi-round retries; results unchanged."""
    scene, _, _, depth = _scene(seed=2, n=200)
    rng = np.random.RandomState(9)
    N = 256
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    active = jnp.ones((N,), bool)

    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax,
                      stack_depth=depth)
    hit = trace_closest_treelet(scene, o, d, tmax, active,
                                stack_depth=depth, leaf_size=4,
                                packet_size=128, cap_factor=0.01,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)


def test_cut_bounds_match_parent_boxes():
    """Cut bounds are exactly the parent-stored child boxes."""
    _, wide, stats, _ = _scene(seed=5, n=300)
    W = stats.num_wide_nodes
    entries = wide.node_rows[:W, 48:56].copy().view(np.int32)
    bounds = wide.node_rows[:W, 0:48].reshape(W, 8, 6)
    lookup = {}
    for w in range(W):
        for j in range(8):
            e = int(entries[w, j])
            if e != INVALID_ENTRY:
                lookup[e] = bounds[w, j]
    for e, bb in zip(wide.cut_entry, wide.cut_bounds):
        np.testing.assert_array_equal(bb, lookup[int(e)])


def test_wavefront_treelet_matches_default():
    """Full integrator with treelet bounce traversal == default traversal
    (same seed -> same hits -> near-identical contributions)."""
    import math

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    def cfg(bounce):
        c = RenderConfig(scene_path="proc:cornell",
                         skybox="GENERATE COLOR BLACK",
                         width=24, height=24, ray_chunk=576,
                         max_bounces=4, traversal="packet",
                         bounce_traversal=bounce, treelet_min=1)
        c.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                fov=math.radians(45), aspect=1.0)
        return c

    ra = Renderer(cfg("same"))
    ra.render_frame("wavefront")
    rb = Renderer(cfg("treelet"), scene=ra.scene, meta=ra.meta)
    rb.render_frame("wavefront")
    a, b = np.asarray(ra.accum), np.asarray(rb.accum)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
