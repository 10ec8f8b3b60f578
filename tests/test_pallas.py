"""Pallas packet-traversal kernel: interpret-mode equivalence.

(The round-1 "HTTP 500 on HBM/ANY refs" note that used to live here was
diagnosed in round 2: 64-wide rows broke 128-lane slice alignment. The
kernel now runs on-chip, including the ANY-space per-pop-DMA fallback —
see PERF.md.)
"""

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.wide import pack_for_packets
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
from gpupathtracer_tpu.ops.traverse import closest_hit
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def test_pallas_kernel_matches_perray_interpret():
    rng = np.random.RandomState(7)
    n = 400
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4, builder="numpy")
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 4)
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 7 + 2

    K, P = 128, 3
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    ref = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    t, prim, u, v = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, interpret=True)
    np.testing.assert_allclose(np.asarray(t).reshape(N), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prim).reshape(N) < 0,
                                  np.asarray(ref.prim) < 0)


def test_pallas_multi_pop_matches():
    """Q-pop kernel (_kernel_multi) == single-pop results."""
    rng = np.random.RandomState(9)
    n = 300
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4, builder="numpy")
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 4)
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 7 + 2

    K, P = 128, 2
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(N) < 0.8)

    ref = closest_hit(dev, geom, o, d, tmax, jnp.asarray(act),
                      stack_depth=depth)
    for Q in (2, 4):
        t, prim, u, v = traverse_pallas(
            rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            tmax.reshape(P, K), act.reshape(P, K),
            stack_depth=depth, interpret=True, multi_pop=Q)
        np.testing.assert_allclose(np.asarray(t).reshape(N),
                                   np.asarray(ref.t), rtol=1e-5, atol=1e-5)
        m = np.asarray(ref.prim) >= 0
        np.testing.assert_array_equal(np.asarray(prim).reshape(N)[m],
                                      np.asarray(ref.prim)[m])

    # any-hit mode too
    from gpupathtracer_tpu.ops.traverse import any_hit
    tm2 = jnp.full((N,), 5.0, jnp.float32)
    occ_ref = any_hit(dev, geom, o, d, tm2, jnp.asarray(act),
                      stack_depth=depth)
    _, prim2, _, _ = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tm2.reshape(P, K), act.reshape(P, K),
        stack_depth=depth, interpret=True, multi_pop=2, any_hit=True)
    occ = (np.asarray(prim2).reshape(N) >= 0) & np.asarray(act)
    np.testing.assert_array_equal(occ, np.asarray(occ_ref))


def _soup(seed, n=400):
    rng = np.random.RandomState(seed)
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2], rng


def test_pallas_arity16_matches_perray():
    """16-wide rows (16*6 bounds + 16 entries = 112 of 128 lanes): the
    kernel's arity parameterization must reproduce per-lane results for
    ordered closest-hit AND unordered any-hit."""
    p0, p1, p2, rng = _soup(13)
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4, builder="numpy",
                                 arity=16)
    assert wide.child_entry.shape[1] == 16
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 4)
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 15 + 2

    K, P = 128, 3
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    ref = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    t, prim, u, v = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, arity=16, interpret=True)
    np.testing.assert_allclose(np.asarray(t).reshape(N), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prim).reshape(N) < 0,
                                  np.asarray(ref.prim) < 0)

    # Unordered packed-bits any-hit phase at arity 16.
    from gpupathtracer_tpu.ops.traverse import any_hit
    near = jnp.full((N,), 6.0, jnp.float32)
    occ_ref = any_hit(dev, geom, o, d, near, stack_depth=depth)
    _, prim2, _, _ = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        near.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, arity=16, any_hit=True, ordered=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(prim2).reshape(N) >= 0,
                                  np.asarray(occ_ref))


def test_sort_net_batcher():
    """The generated compare-exchange networks sort (0/1 principle)."""
    import itertools

    from gpupathtracer_tpu.ops.pallas_traverse import _sort_net
    for n in (4, 8, 16):
        net = _sort_net(n)
        for bits in itertools.product([0, 1], repeat=n):
            a = list(bits)
            for i, j in net:
                if a[i] > a[j]:
                    a[i], a[j] = a[j], a[i]
            assert a == sorted(a), (n, bits)


def test_pallas_multirow_leaf15_matches_perray():
    """leaf_size 15 spans two 128-lane rows per leaf block; the kernel's
    R-row fetch + per-row sublane broadcast must reproduce per-lane
    results (closest ordered + any-hit unordered)."""
    p0, p1, p2, rng = _soup(21, n=600)
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=15, builder="numpy",
                                 force_leaf=True)
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 15)
    W = wide.child_entry.shape[0]
    assert (wide.node_rows.shape[0] - W) % 2 == 0  # two rows per leaf
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 7 + 2

    K, P = 128, 3
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    ref = closest_hit(dev, geom, o, d, tmax, stack_depth=depth,
                      leaf_size=15)
    t, prim, u, v = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, leaf_size=15, interpret=True)
    np.testing.assert_allclose(np.asarray(t).reshape(N), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prim).reshape(N),
                                  np.asarray(ref.prim))

    from gpupathtracer_tpu.ops.traverse import any_hit
    near = jnp.full((N,), 6.0, jnp.float32)
    occ_ref = any_hit(dev, geom, o, d, near, stack_depth=depth,
                      leaf_size=15)
    _, prim2, _, _ = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        near.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, leaf_size=15, any_hit=True, ordered=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(prim2).reshape(N) >= 0,
                                  np.asarray(occ_ref))


def test_pallas_fused_pair_matches():
    """W=2 fused-region pair kernel (_kernel_pair) == single-pop results,
    closest and any-hit, including a drained-packet tail (one packet all
    dead so the other drains alone through the masked regions)."""
    p0, p1, p2, rng = _soup(23)
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4, builder="numpy")
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 4)
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None)
                    for a in wide))
    depth = stats.max_depth * 7 + 2

    K, P = 128, 4
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = np.asarray(rng.rand(N) < 0.8)
    act[K:2 * K] = False  # packet 1 fully dead: pair (0, 1) is imbalanced
    act = jnp.asarray(act)

    ref = closest_hit(dev, geom, o, d, tmax, act, stack_depth=depth)
    for ordered in (True, False):
        t, prim, u, v = traverse_pallas(
            rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            tmax.reshape(P, K), act.reshape(P, K),
            stack_depth=depth, interpret=True, interleave=2,
            fused_pair=True, ordered=ordered)
        np.testing.assert_allclose(np.asarray(t).reshape(N),
                                   np.asarray(ref.t), rtol=1e-5, atol=1e-5)
        m = np.asarray(ref.prim) >= 0
        np.testing.assert_array_equal(np.asarray(prim).reshape(N)[m],
                                      np.asarray(ref.prim)[m])
        np.testing.assert_array_equal(np.asarray(prim).reshape(N) < 0,
                                      np.asarray(ref.prim) < 0)

    from gpupathtracer_tpu.ops.traverse import any_hit
    tm2 = jnp.full((N,), 5.0, jnp.float32)
    occ_ref = any_hit(dev, geom, o, d, tm2, act, stack_depth=depth)
    _, prim2, _, _ = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tm2.reshape(P, K), act.reshape(P, K),
        stack_depth=depth, interpret=True, interleave=2, fused_pair=True,
        any_hit=True, ordered=False)
    occ = (np.asarray(prim2).reshape(N) >= 0) & np.asarray(act)
    np.testing.assert_array_equal(occ, np.asarray(occ_ref))
