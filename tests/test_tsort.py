"""Treelet-sorted dispatch (ops/tsort.py) and the interleaved W-packet
kernel (_kernel_ilv): interpret-mode equivalence vs per-ray reference
semantics (BVH.glsl:634-854 roles), including padding and dead lanes."""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.wide import pack_for_packets
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
from gpupathtracer_tpu.ops.traverse import any_hit, closest_hit
from gpupathtracer_tpu.ops.tsort import (trace_closest_tsort,
                                         trace_occluded_tsort)
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


def test_tsort_closest_matches_perray():
    scene, _, _, depth = _scene()
    rng = np.random.RandomState(11)
    n = 700  # non-multiple of the packet size: exercises padding
    o, d = _rays(rng, n)
    tmax = jnp.full((n,), 1e20, jnp.float32)
    active = jnp.asarray(rng.rand(n) > 0.15)

    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax, active,
                      stack_depth=depth)
    hit = trace_closest_tsort(scene, o, d, tmax, active, stack_depth=depth,
                              leaf_size=4, packet_size=128, interpret=True)
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(ref.prim))


def test_tsort_occluded_matches_perray():
    scene, _, _, depth = _scene(seed=4)
    rng = np.random.RandomState(12)
    n = 650
    o, d = _rays(rng, n)
    tmax = jnp.full((n,), 3.0, jnp.float32)
    active = jnp.asarray(rng.rand(n) > 0.1)

    ref = any_hit(scene.bvh, scene.tri_geom, o, d, tmax, active,
                  stack_depth=depth)
    occ = trace_occluded_tsort(scene, o, d, tmax, active, stack_depth=depth,
                               leaf_size=4, packet_size=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_tsort_alternate_bitwise_equals_default():
    """cfg.tsort_alternate only changes packet GROUPING (odd bounces reuse
    the previous bounce's permutation); per-ray traversal results are exact
    regardless of grouping, so the render must be bitwise identical.
    (Measured loss at 1080p — kept opt-in, PERF.md session 6.)"""
    import math

    import jax

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    def cfg(alt):
        c = RenderConfig(scene_path="proc:cornell",
                         skybox="GENERATE COLOR BLACK",
                         width=24, height=24, ray_chunk=24 * 24,
                         bounce_traversal="tsort", treelet_min=1,
                         shadow_sort=True, tsort_alternate=alt,
                         max_bounces=4)
        c.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                fov=math.radians(45), aspect=1.0)
        return c

    ra = Renderer(cfg(False))
    ra.render_frame("wavefront")
    rb = Renderer(cfg(True), scene=ra.scene, meta=ra.meta)
    rb.render_frame("wavefront")
    np.testing.assert_array_equal(np.asarray(ra.accum), np.asarray(rb.accum))


def test_interleaved_kernel_matches_single():
    """_kernel_ilv (W co-scheduled packets) == the single-pop kernel."""
    scene, wide, _, depth = _scene(seed=9, n=350)
    rows = jnp.asarray(wide.node_rows)
    rng = np.random.RandomState(13)
    K, P = 128, 4
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) > 0.2)

    args = (rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            tmax.reshape(P, K), act.reshape(P, K))
    ref = traverse_pallas(*args, stack_depth=depth, interpret=True)
    for W in (2, 4):
        got = traverse_pallas(*args, stack_depth=depth, interleave=W,
                              interpret=True)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # any-hit occlusion agreement (early exit is per-packet)
    ref_ah = traverse_pallas(*args, stack_depth=depth, any_hit=True,
                             interpret=True)
    got_ah = traverse_pallas(*args, stack_depth=depth, any_hit=True,
                             interleave=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_ah[1] >= 0),
                                  np.asarray(got_ah[1] >= 0))


def test_interleaved_kernel_hbm_fallback():
    """_kernel_ilv's per-pop DMA path (table too big for VMEM) matches the
    VMEM path. Forced via VMEM_TABLE_LIMIT monkeypatch; K=384 keeps the
    jit cache from reusing a trace made under the normal limit."""
    import gpupathtracer_tpu.ops.pallas_traverse as pt

    scene, wide, _, depth = _scene(seed=5, n=320)
    rows = jnp.asarray(wide.node_rows)
    rng = np.random.RandomState(21)
    K, P = 384, 2
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.ones((N,), bool)
    args = (rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            tmax.reshape(P, K), act.reshape(P, K))
    ref = traverse_pallas(*args, stack_depth=depth, interleave=2,
                          interpret=True)
    # The jit cache keys on statics/shapes only, not the module global —
    # calling the jitted wrapper under the patch would silently reuse the
    # VMEM-path executable. Call the unjitted function instead.
    raw = pt.traverse_pallas.__wrapped__
    old = pt.VMEM_TABLE_LIMIT
    try:
        pt.VMEM_TABLE_LIMIT = 1
        got = raw(*args, stack_depth=depth, interleave=2, interpret=True)
    finally:
        pt.VMEM_TABLE_LIMIT = old
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_interleaved_kernel_with_roots_and_stats():
    """roots= plumbing and the aggregated stats row in interleave mode."""
    scene, wide, _, depth = _scene(seed=2, n=300)
    rows = jnp.asarray(wide.node_rows)
    rng = np.random.RandomState(3)
    K, P = 128, 2
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.ones((N,), bool)
    args = (rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            tmax.reshape(P, K), act.reshape(P, K))
    roots = jnp.zeros((P,), jnp.int32)
    ref = traverse_pallas(*args, stack_depth=depth, with_stats=True,
                          interpret=True)
    got = traverse_pallas(*args, roots=roots, stack_depth=depth,
                          interleave=2, with_stats=True, interpret=True)
    for a, b in zip(ref[:4], got[:4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Aggregated pops across the 2 packets of the single grid step must
    # equal the sum of the per-packet counters.
    assert got[4].shape == (1, 2)
    np.testing.assert_array_equal(np.asarray(got[4][0]),
                                  np.asarray(ref[4]).sum(0))
