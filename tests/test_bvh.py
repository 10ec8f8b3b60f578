import numpy as np
import pytest

from gpupathtracer_tpu.bvh import INVALID_ENTRY, build_wide_bvh
from gpupathtracer_tpu.bvh.numpy_builder import build_binary_bvh
from gpupathtracer_tpu.bvh.types import decode_leaf_entry, encode_leaf_entry
from gpupathtracer_tpu.bvh.wide import collapse_to_wide

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def random_tris(rng, n, spread=10.0, size=0.5):
    base = rng.uniform(-spread, spread, (n, 1, 3))
    offs = rng.uniform(-size, size, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    return tri[:, 0], tri[:, 1], tri[:, 2]


def test_leaf_entry_roundtrip():
    # Mechanizes the reference's leaf-encoding round-trip guard (BVH.cpp:470).
    for first in [0, 1, 7, 123456, (1 << 26) - 1]:
        for count in [1, 4, 15]:
            e = encode_leaf_entry(first, count)
            assert e < 0
            f, c = decode_leaf_entry(e)
            assert (f, c) == (first, count)


def test_binary_bvh_invariants(rng):
    p0, p1, p2 = random_tris(rng, 500)
    bvh, stats = build_binary_bvh(p0, p1, p2, max_leaf=4)
    # Every triangle reachable exactly once (object splits don't duplicate).
    assert sorted(bvh.refs.tolist()) == list(range(500))
    # AABB containment: each node box contains its leaf triangles...
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    is_leaf = bvh.count > 0
    for n in np.nonzero(is_leaf)[0]:
        sl = bvh.refs[bvh.first[n]:bvh.first[n] + bvh.count[n]]
        assert (tri_min[sl] >= bvh.bmin[n] - 1e-4).all()
        assert (tri_max[sl] <= bvh.bmax[n] + 1e-4).all()
    # ...and each internal box contains its children.
    for n in np.nonzero(~is_leaf)[0]:
        for ch in (bvh.left[n], bvh.right[n]):
            assert (bvh.bmin[ch] >= bvh.bmin[n] - 1e-4).all()
            assert (bvh.bmax[ch] <= bvh.bmax[n] + 1e-4).all()
    assert stats.num_leaves > 0 and stats.sah_cost > 0


def test_wide_collapse_preserves_reachability(rng):
    p0, p1, p2 = random_tris(rng, 300)
    bvh, _ = build_binary_bvh(p0, p1, p2, max_leaf=4)
    wide, depth = collapse_to_wide(bvh, arity=8)
    # Walk the wide tree, collect all refs.
    seen = []

    def walk(w):
        for j in range(8):
            e = int(wide.child_entry[w, j])
            if e == INVALID_ENTRY:
                continue
            if e < 0:
                first, count = decode_leaf_entry(e)
                seen.extend(wide.refs[first:first + count].tolist())
            else:
                walk(e)

    walk(0)
    assert sorted(seen) == list(range(300))
    assert depth >= 1
    # Child bounds match binary bounds they came from: containment check.
    for w in range(wide.num_nodes):
        for j in range(8):
            e = int(wide.child_entry[w, j])
            if e == INVALID_ENTRY:
                continue
            lo = wide.child_bounds[w, j, 0:3]
            hi = wide.child_bounds[w, j, 3:6]
            assert (lo <= hi + 1e-6).all()


def test_build_wide_facade(rng):
    p0, p1, p2 = random_tris(rng, 200)
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4)
    assert stats.num_triangles == 200
    assert stats.num_wide_nodes == wide.num_nodes
    assert stats.max_depth >= 1


def test_single_triangle():
    p0 = np.array([[0, 0, 0]], np.float32)
    p1 = np.array([[1, 0, 0]], np.float32)
    p2 = np.array([[0, 1, 0]], np.float32)
    wide, stats = build_wide_bvh(p0, p1, p2)
    assert stats.num_refs == 1
    assert wide.num_nodes >= 1


def test_cpp_builder_matches_invariants(rng):
    """Native SBVH builder: reachability + clipped-box overlap invariants."""
    pytest.importorskip("ctypes")
    from gpupathtracer_tpu.bvh.cpp import build_sbvh_cpp

    p0, p1, p2 = random_tris(rng, 800)
    bvh, stats = build_sbvh_cpp(p0, p1, p2, max_leaf=4)
    # Every triangle appears at least once (spatial splits may duplicate).
    assert sorted(set(bvh.refs.tolist())) == list(range(800))
    assert stats.num_refs >= 800
    assert stats.max_depth < 60
    # SBVH leaf boxes hold *clipped* references: the box must overlap the
    # triangle's AABB (full containment doesn't hold after clipping).
    tri_min = np.minimum(np.minimum(p0, p1), p2)
    tri_max = np.maximum(np.maximum(p0, p1), p2)
    for n in np.nonzero(bvh.count > 0)[0]:
        sl = bvh.refs[bvh.first[n]:bvh.first[n] + bvh.count[n]]
        assert (tri_min[sl] <= bvh.bmax[n] + 1e-4).all()
        assert (tri_max[sl] >= bvh.bmin[n] - 1e-4).all()
    # Internal containment still holds.
    for n in np.nonzero(bvh.count == 0)[0]:
        for ch in (bvh.left[n], bvh.right[n]):
            assert (bvh.bmin[ch] >= bvh.bmin[n] - 1e-4).all()
            assert (bvh.bmax[ch] <= bvh.bmax[n] + 1e-4).all()


def test_cpp_builder_traversal_equivalence(rng):
    """Closest hits through the SBVH match brute force."""
    import jax.numpy as jnp
    from gpupathtracer_tpu.bvh.cpp import build_sbvh_cpp
    from gpupathtracer_tpu.bvh.types import WideBVH
    from gpupathtracer_tpu.ops.intersect import (brute_force_closest_hit,
                                                 pack_tri_geom)
    from gpupathtracer_tpu.ops.traverse import closest_hit

    p0, p1, p2 = random_tris(rng, 600)
    binary, stats = build_sbvh_cpp(p0, p1, p2, max_leaf=4)
    wide, depth = collapse_to_wide(binary, arity=8)
    dev = WideBVH(child_bounds=jnp.asarray(wide.child_bounds),
                  child_entry=jnp.asarray(wide.child_entry),
                  refs=jnp.asarray(wide.refs))
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    o = rng.uniform(-8, 8, (256, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (256, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((256,), 1e20, jnp.float32)
    bt, bp, _, _ = brute_force_closest_hit(geom, o, d, tmax)
    h = closest_hit(dev, geom, o, d, tmax, stack_depth=depth * 7 + 2)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(bt),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h.prim < 0), np.asarray(bp < 0))


def test_cpp_reinsert_optimizer(rng):
    """Bittner-2013 reinsertion (the pass BVH.cpp:2303-2397 left stubbed):
    tree stays valid, SAH does not regress, traversal stays exact."""
    import jax.numpy as jnp
    from gpupathtracer_tpu.bvh.cpp import build_sbvh_cpp
    from gpupathtracer_tpu.bvh.types import WideBVH
    from gpupathtracer_tpu.ops.intersect import (brute_force_closest_hit,
                                                 pack_tri_geom)
    from gpupathtracer_tpu.ops.traverse import closest_hit

    p0, p1, p2 = random_tris(rng, 900)
    base, st0 = build_sbvh_cpp(p0, p1, p2, max_leaf=4)
    opt, st1 = build_sbvh_cpp(p0, p1, p2, max_leaf=4, reinsert_rounds=4)
    assert st1.sah_cost <= st0.sah_cost + 1e-4
    # Same reference multiset (reinsertion moves subtrees, never leaves).
    assert sorted(opt.refs.tolist()) == sorted(base.refs.tolist())
    # Every node reachable exactly once; internal containment holds.
    seen = np.zeros(opt.num_nodes, bool)
    stack = [0]
    while stack:
        n = stack.pop()
        assert not seen[n]
        seen[n] = True
        if opt.count[n] == 0:
            for ch in (opt.left[n], opt.right[n]):
                assert (opt.bmin[ch] >= opt.bmin[n] - 1e-4).all()
                assert (opt.bmax[ch] <= opt.bmax[n] + 1e-4).all()
                stack.append(int(ch))
    assert seen.all()
    # Traversal through the optimized tree still matches brute force.
    wide, depth = collapse_to_wide(opt, arity=8)
    dev = WideBVH(child_bounds=jnp.asarray(wide.child_bounds),
                  child_entry=jnp.asarray(wide.child_entry),
                  refs=jnp.asarray(wide.refs))
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    o = rng.uniform(-8, 8, (128, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (128, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((128,), 1e20, jnp.float32)
    bt, bp, _, _ = brute_force_closest_hit(geom, o, d, tmax)
    h = closest_hit(dev, geom, o, d, tmax, stack_depth=depth * 7 + 2)
    np.testing.assert_allclose(np.asarray(h.t), np.asarray(bt),
                               rtol=1e-5, atol=1e-5)
