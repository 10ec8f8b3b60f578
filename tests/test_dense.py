"""Dense ray x triangle intersection (ops/dense_intersect.py): hit
equivalence vs the Moller-Trumbore reference traversal.

The dense path computes t/u/v through the precomputed inverse-matrix
form — the same hit set in exact arithmetic, different rounding — so
the equivalence is tolerance-based: t within 1e-4 relative, and the
prim may differ only where two surfaces are within tolerance of a tie.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.config import RenderConfig
from gpupathtracer_tpu.ops.dense_intersect import (dense_intersect,
                                                   pack_dense_tris)
from gpupathtracer_tpu.ops.traverse import trace_closest, trace_occluded
from gpupathtracer_tpu.scene import load_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def table_scene():
    cfg = RenderConfig(scene_path="proc:table",
                       skybox="GENERATE COLOR BLACK",
                       width=32, height=32, cache_enabled=True)
    return load_scene(cfg)


@pytest.fixture(scope="module")
def rays(table_scene):
    scene, _ = table_scene
    rng = np.random.RandomState(17)
    n = 1024
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


def _check_closest(scene, meta, o, d, act, use_mxu):
    n = o.shape[0]
    tmax = jnp.full((n,), 1e20, jnp.float32)
    wd, wo = pack_dense_tris(scene.tri_geom)
    t, prim, u, v = dense_intersect(wd, wo, o, d, tmax, act,
                                    use_mxu=use_mxu, block=256,
                                    tile=512, interpret=True)
    ref = trace_closest(scene, o, d, tmax, act,
                        stack_depth=meta.stack_depth,
                        leaf_size=meta.leaf_size, traversal="packet",
                        packet_size=128)
    t_d, t_r = np.asarray(t), np.asarray(ref.t)
    p_d, p_r = np.asarray(prim), np.asarray(ref.prim)
    a = np.asarray(act)
    # Same hit/miss classification everywhere (ties between coplanar
    # surfaces and 1-ulp edge flips allowed through the t tolerance).
    hit_close = np.isclose(t_d, t_r, rtol=1e-3, atol=1e-4)
    assert ((p_d >= 0) == (p_r >= 0))[a].mean() > 0.995
    both = a & (p_d >= 0) & (p_r >= 0)
    assert hit_close[both].mean() > 0.995
    same = p_d == p_r
    assert (same | ~both | hit_close)[a].all()
    # Barycentrics agree where the prim agrees.
    agree = both & same & hit_close
    np.testing.assert_allclose(np.asarray(u)[agree],
                               np.asarray(ref.u)[agree],
                               rtol=5e-2, atol=5e-3)
    # Inactive lanes: untouched contract.
    assert (p_d[~a] == -1).all()
    assert (t_d[~a] == 1e20).all()


def test_dense_closest_matches_mt(table_scene, rays):
    scene, meta = table_scene
    o, d = rays
    rng = np.random.RandomState(3)
    act = jnp.asarray(rng.rand(o.shape[0]) > 0.1)
    _check_closest(scene, meta, o, d, act, use_mxu=True)


def test_dense_closest_vpu_path(table_scene, rays):
    """use_mxu=False computes identical math via broadcast muls."""
    scene, meta = table_scene
    o, d = rays
    act = jnp.ones((o.shape[0],), bool)
    _check_closest(scene, meta, o, d, act, use_mxu=False)


def test_dense_mxu_vpu_bitwise(table_scene, rays):
    """The two dot implementations must agree closely (dot_general K=3
    vs broadcast-mul sums — same operands, possibly different summation
    order, so allclose rather than bitwise)."""
    scene, _ = table_scene
    o, d = rays
    n = o.shape[0]
    tmax = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.ones((n,), bool)
    wd, wo = pack_dense_tris(scene.tri_geom)
    t1, p1, _, _ = dense_intersect(wd, wo, o, d, tmax, act, use_mxu=True,
                                   block=256, tile=512, interpret=True)
    t2, p2, _, _ = dense_intersect(wd, wo, o, d, tmax, act, use_mxu=False,
                                   block=256, tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.999


def test_dense_any_hit(table_scene, rays):
    scene, meta = table_scene
    o, d = rays
    n = o.shape[0]
    tmax = jnp.full((n,), 4.0, jnp.float32)
    act = jnp.ones((n,), bool)
    wd, wo = pack_dense_tris(scene.tri_geom)
    _, prim, _, _ = dense_intersect(wd, wo, o, d, tmax, act, any_hit=True,
                                    block=256, tile=512, interpret=True)
    occ_d = np.asarray(prim) >= 0
    occ_r = np.asarray(trace_occluded(scene, o, d, tmax, act,
                                      stack_depth=meta.stack_depth,
                                      leaf_size=meta.leaf_size,
                                      traversal="packet", packet_size=128))
    # Rounding can flip rays that graze a triangle exactly at tmax/edge.
    assert (occ_d == occ_r).mean() > 0.99


def test_dense_degenerate_and_padding():
    """Zero-area triangles and the 512-padding never hit."""
    tg = np.zeros((3, 9), np.float32)
    tg[0] = [0, 0, 5, 1, 0, 0, 0, 1, 0]        # valid unit tri at z=5
    tg[1] = [0, 0, 2, 1, 0, 0, 2, 0, 0]        # degenerate (parallel edges)
    tg[2, 0:3] = [0, 0, 1]                      # zero edges
    wd, wo = pack_dense_tris(tg)
    assert wd.shape == (3, 3 * 512)
    o = jnp.asarray(np.tile([[0.2, 0.2, 0.0]], (256, 1)).astype(np.float32))
    d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (256, 1)).astype(np.float32))
    tmax = jnp.full((256,), 1e20, jnp.float32)
    act = jnp.ones((256,), bool)
    t, prim, u, v = dense_intersect(wd, wo, o, d, tmax, act, block=256,
                                    tile=512, interpret=True)
    assert (np.asarray(prim) == 0).all()
    np.testing.assert_allclose(np.asarray(t), 5.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u), 0.2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v), 0.2, rtol=1e-4)
