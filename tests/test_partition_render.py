"""Partitioned RENDER-level tests: the full wavefront integrator and the
Renderer surface over the scene-partitioned mesh (split from the original
test_partition.py monolith)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from gpupathtracer_tpu.bvh.partition import build_partition
from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.math.camera import generate_image_plane
from gpupathtracer_tpu.parallel.partition import (render_sample_partitioned,
                                                  shard_partition)
from gpupathtracer_tpu.scene import load_scene

pytestmark = pytest.mark.slow


def _cornell(**kw):
    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=16, height=16, cache_enabled=True, **kw)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    return cfg


def test_partitioned_render_step():
    """Full wavefront integrator over the partitioned scene: pixels
    sharded on the chips axis, per-chip subtree tables, every traversal
    riding the ppermute ring; loop conditions are collective so all chips
    execute the ring in lockstep. Statistical agreement with the plain
    renderer + bitwise determinism."""
    from gpupathtracer_tpu.models.wavefront import render_sample

    cfg = _cornell()
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


def test_partitioned_render_with_samples_axis():
    """(samples, chips) composition: data-parallel sample replicas over
    the scene partition — 2 sample rows x 4 subtree owners on the CPU
    mesh. The ring collectives stay within each row's chips sub-axis."""
    cfg = _cornell()
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


def test_renderer_partition_mode():
    """cfg.partition_chips: the full Renderer surface (progressive
    accumulation, film, stats) over the scene-partitioned mesh —
    compaction rides the collective ring. Statistical agreement with the
    plain renderer and bitwise determinism; the (samples x chips)
    composition accumulates S spp per frame."""
    from gpupathtracer_tpu.render import Renderer

    def _cfg(**kw):
        return _cornell(max_bounces=3, **kw)

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
