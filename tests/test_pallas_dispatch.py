"""Pallas traversal dispatch: padding, any-hit, multi-tile packets,
compaction estimator equality, force_leaf tree shape."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.ops.traverse import trace_closest, trace_occluded
from gpupathtracer_tpu.scene.scenedata import load_scene

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


@pytest.fixture(scope="module")
def cornell():
    cfg = RenderConfig(scene_path="proc:cornell", skybox="GENERATE COLOR BLACK",
                       cache_enabled=False)
    return load_scene(cfg)


def _rand_rays(rng, n):
    o = jnp.asarray(rng.uniform(0.5, 5.0, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, jnp.asarray(d)


@pytest.mark.parametrize("n", [337, 128, 1500])  # prime, exact, multi-packet
def test_pallas_dispatch_matches_perray_padded(cornell, rng, n):
    """Awkward N must pad to full packets, not degrade (VERDICT item 7)."""
    sd, meta = cornell
    o, d = _rand_rays(rng, n)
    tm = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.asarray(rng.rand(n) > 0.2)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size)
    h1 = trace_closest(sd, o, d, tm, act, traversal="pallas",
                       packet_size=256, **kw)
    h2 = trace_closest(sd, o, d, tm, act, traversal="perray", **kw)
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(h1.prim) < 0,
                                  np.asarray(h2.prim) < 0)
    assert h1.t.shape == (n,)


def test_pallas_anyhit_matches_perray(cornell, rng):
    sd, meta = cornell
    n = 451
    o, d = _rand_rays(rng, n)
    tm = jnp.full((n,), 3.0, jnp.float32)
    act = jnp.ones((n,), bool)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size)
    occ1 = trace_occluded(sd, o, d, tm, act, traversal="pallas",
                          packet_size=128, **kw)
    occ2 = trace_occluded(sd, o, d, tm, act, traversal="perray", **kw)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


def test_pallas_multitile_packet(cornell, rng):
    """K > 128 shapes rays into [K/128, 128] VPU tiles; results identical."""
    sd, meta = cornell
    n = 512
    o, d = _rand_rays(rng, n)
    tm = jnp.full((n,), 1e20, jnp.float32)
    act = jnp.ones((n,), bool)
    kw = dict(stack_depth=meta.stack_depth, leaf_size=meta.leaf_size)
    h_small = trace_closest(sd, o, d, tm, act, traversal="pallas",
                            packet_size=128, **kw)
    h_big = trace_closest(sd, o, d, tm, act, traversal="pallas",
                          packet_size=512, **kw)
    np.testing.assert_allclose(np.asarray(h_small.t), np.asarray(h_big.t),
                               rtol=1e-6, atol=1e-6)


def test_compaction_estimator_unbiased():
    """Bounce-epoch compaction must not change what the estimator measures:
    compare channel means compaction on/off (different RNG lane mapping, so
    statistical agreement only)."""
    from gpupathtracer_tpu.render import Renderer

    def make(compaction):
        cfg = RenderConfig(scene_path="proc:cornell",
                           skybox="GENERATE COLOR BLACK",
                           width=48, height=48, ray_chunk=48 * 48, seed=3)
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
        import gpupathtracer_tpu.models.wavefront as wf
        r = Renderer(cfg)
        return r, cfg

    import gpupathtracer_tpu.models.wavefront as wf
    from gpupathtracer_tpu.models.wavefront import render_sample

    r, cfg = make(True)
    n_spp = 24
    import jax

    def film(compaction):
        acc = None
        for s in range(n_spp):
            key = jax.random.fold_in(jax.random.PRNGKey(7), s)
            out, _ = render_sample(
                r.scene, r.camera, r.pixel_x, r.pixel_y, key,
                width=r.pad_w, height=r.pad_h, max_bounces=24,
                stack_depth=r.meta.stack_depth, leaf_size=r.meta.leaf_size,
                traversal="packet", packet_size=128,
                compaction=compaction, compaction_min=256,
                compaction_divs=(4, 16))
            acc = out if acc is None else acc + out
        return np.asarray(acc) / n_spp

    img_on = film(True)
    img_off = film(False)
    m_on = img_on.mean(axis=0)
    m_off = img_off.mean(axis=0)
    assert not np.isnan(img_on).any()
    np.testing.assert_allclose(m_on, m_off, rtol=0.06)


def test_force_leaf_tree_shape(rng):
    """force_leaf packs fat leaves: avg refs/leaf must approach leaf_size."""
    from gpupathtracer_tpu.bvh import build_wide_bvh

    n = 3000
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.3, 0.3, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    _, st_loose = build_wide_bvh(p0, p1, p2, leaf_size=10, force_leaf=False)
    _, st_fat = build_wide_bvh(p0, p1, p2, leaf_size=10, force_leaf=True)
    assert st_fat.avg_refs_per_leaf > 3.5
    assert st_fat.avg_refs_per_leaf > st_loose.avg_refs_per_leaf
    assert st_fat.num_leaves < st_loose.num_leaves


def test_viewer_ansi_frame():
    """Terminal presenter: two pixels per half-block cell, truecolor codes,
    bottom-row-first flip (GL convention)."""
    import numpy as np

    from gpupathtracer_tpu.render.viewer import _ansi_frame

    img = np.zeros((4, 2, 3), np.float32)
    img[0] = [1.0, 0.0, 0.0]   # bottom scanline red
    img[3] = [0.0, 1.0, 0.0]   # top scanline green
    s = _ansi_frame(img)
    lines = s.split("\n")
    assert len(lines) == 2
    # Zero-padded SGR params (fixed-width vectorized encoder).
    assert "38;2;000;255;000" in lines[0]   # top drawn first (foreground)
    assert "48;2;255;000;000" in lines[-1]  # bottom last (background)
    assert lines[0].count("▀") == 2
