import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.ops.intersect import (brute_force_closest_hit,
                                             mt_intersect, pack_tri_geom)
from gpupathtracer_tpu.ops.traverse import any_hit, closest_hit
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def make_scene(rng, n_tris=400):
    base = rng.uniform(-5, 5, (n_tris, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n_tris, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(child_bounds=jnp.asarray(wide.child_bounds),
                  child_entry=jnp.asarray(wide.child_entry),
                  refs=jnp.asarray(wide.refs))
    depth = stats.max_depth * 7 + 2
    return dev, geom, depth


def make_rays(rng, n_rays=256):
    # Aim from a shell outside the triangle cloud toward points inside it so
    # most rays actually hit something.
    o = rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32)
    target = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_mt_intersect_basic():
    # Unit right triangle in z=0 plane, ray straight down.
    tri = jnp.asarray([[0, 0, 0, 1, 0, 0, 0, 1, 0]], jnp.float32)
    o = jnp.asarray([[0.2, 0.3, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, u, v, hit = mt_intersect(tri, o, d)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.2, atol=1e-6)
    np.testing.assert_allclose(float(v[0]), 0.3, atol=1e-6)


def test_closest_hit_matches_brute_force(rng):
    dev, geom, depth = make_scene(rng)
    o, d = make_rays(rng)
    tmax = jnp.full((o.shape[0],), 1e20, jnp.float32)
    bt, bprim, bu, bv = brute_force_closest_hit(geom, o, d, tmax)
    hit = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    # Same hit distance everywhere (tie-breaking on prim id may differ for
    # coplanar overlaps, so compare t not prim).
    np.testing.assert_allclose(np.asarray(hit.t), np.asarray(bt),
                               rtol=1e-5, atol=1e-5)
    # Miss sets agree exactly.
    np.testing.assert_array_equal(np.asarray(hit.prim < 0),
                                  np.asarray(bprim < 0))
    # Where both hit the same prim, barycentrics agree.
    hits = np.asarray(bprim >= 0)
    same = np.asarray(hit.prim == bprim) & hits
    assert hits.sum() > 0
    assert same.sum() / hits.sum() > 0.95  # ties are rare
    np.testing.assert_allclose(np.asarray(hit.u)[same], np.asarray(bu)[same],
                               rtol=1e-4, atol=1e-4)


def test_any_hit_consistent_with_closest(rng):
    dev, geom, depth = make_scene(rng)
    o, d = make_rays(rng)
    tmax = jnp.full((o.shape[0],), 1e20, jnp.float32)
    ch = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    occ = any_hit(dev, geom, o, d, tmax, stack_depth=depth)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ch.prim >= 0))


def test_any_hit_respects_tmax(rng):
    dev, geom, depth = make_scene(rng)
    o, d = make_rays(rng, 128)
    big = jnp.full((128,), 1e20, jnp.float32)
    ch = closest_hit(dev, geom, o, d, big, stack_depth=depth)
    # Shorten tmax to just before each closest hit: no occlusion.
    short = jnp.where(ch.prim >= 0, ch.t * 0.99, 1e-3)
    occ = any_hit(dev, geom, o, d, short, stack_depth=depth)
    assert not bool(occ.any())
    # And just past it: occluded wherever there was a hit.
    past = jnp.where(ch.prim >= 0, ch.t * 1.01, 1e-3)
    occ2 = any_hit(dev, geom, o, d, past, stack_depth=depth)
    np.testing.assert_array_equal(np.asarray(occ2), np.asarray(ch.prim >= 0))


def test_inactive_rays_stay_missed(rng):
    dev, geom, depth = make_scene(rng)
    o, d = make_rays(rng, 64)
    tmax = jnp.full((64,), 1e20, jnp.float32)
    active = jnp.arange(64) % 2 == 0
    hit = closest_hit(dev, geom, o, d, tmax, active=active, stack_depth=depth)
    inactive = ~np.asarray(active)
    assert (np.asarray(hit.prim)[inactive] == -1).all()
