"""Sub-packet traversal kernel: interpret-mode equivalence vs closest_hit
and any_hit (the per-ray reference semantics of BVH.glsl:634-854)."""

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.wide import pack_for_packets
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.subpacket_traverse import traverse_subpacket
from gpupathtracer_tpu.ops.traverse import any_hit, closest_hit
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def _scene(seed=7, n=400):
    rng = np.random.RandomState(seed)
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
    return rows, geom, dev, depth


def _rays(rng, n):
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_subpacket_matches_perray_interpret():
    rows, geom, dev, depth = _scene()
    rng = np.random.RandomState(3)
    K, P = 256, 3  # G = 2 sub-packets per kernel instance
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    ref = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    t, prim, u, v = traverse_subpacket(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, interpret=True)
    np.testing.assert_allclose(np.asarray(t).reshape(N), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prim).reshape(N) < 0,
                                  np.asarray(ref.prim) < 0)


def test_subpacket_inactive_and_anyhit():
    rows, geom, dev, depth = _scene(seed=11)
    rng = np.random.RandomState(5)
    K, P = 512, 1  # G = 4
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 4.0, jnp.float32)
    active = jnp.asarray(rng.rand(N) < 0.7)

    occ_ref = any_hit(dev, geom, o, d, tmax, active, stack_depth=depth)
    t, prim, u, v = traverse_subpacket(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), active.reshape(P, K),
        stack_depth=depth, any_hit=True, interpret=True)
    occ = (np.asarray(prim).reshape(N) >= 0) & np.asarray(active)
    np.testing.assert_array_equal(occ, np.asarray(occ_ref))

    # Inactive lanes must stay miss in closest-hit mode too.
    t2, prim2, _, _ = traverse_subpacket(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), active.reshape(P, K),
        stack_depth=depth, interpret=True)
    prim2 = np.asarray(prim2).reshape(N)
    assert (prim2[~np.asarray(active)] < 0).all()


def test_subpacket_stats_counts_pops():
    rows, geom, dev, depth = _scene(seed=2, n=150)
    rng = np.random.RandomState(9)
    K, P = 128, 2  # G = 1 degenerate case
    N = P * K
    o, d = _rays(rng, N)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    out = traverse_subpacket(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, interpret=True, with_stats=True)
    stats = np.asarray(out[4])
    assert stats.shape == (P, 2)
    assert (stats.sum(axis=1) > 0).all()
