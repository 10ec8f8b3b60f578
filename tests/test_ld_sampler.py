"""Low-discrepancy pixel sampler (cfg.sampler="ld"): R2 + per-pixel
rotation wired into the active jitter (the reference left its LD machinery
unwired, Renderer.cpp:784-887 — this is the opt-in extension)."""

import math

import numpy as np

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.math.sampling import pixel_rotation, r2_sequence
from gpupathtracer_tpu.render import Renderer
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def _cfg(sampler):
    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=24, height=24, ray_chunk=576, max_bounces=3,
                       sampler=sampler)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    return cfg


def test_r2_and_rotation_properties():
    import jax.numpy as jnp
    pts = np.stack([np.asarray(r2_sequence(jnp.int32(i)))
                    for i in range(64)])
    assert ((pts >= 0) & (pts < 1)).all()
    assert len({tuple(np.round(p, 6)) for p in pts}) == 64  # all distinct
    # 1D projections are near-uniformly stratified (LD property).
    for d in range(2):
        s = np.sort(pts[:, d])
        gaps = np.diff(np.concatenate([[0.0], s, [1.0]]))
        assert gaps.max() < 3.5 / 64
    rot = np.asarray(pixel_rotation(jnp.arange(1000)))
    assert ((rot >= 0) & (rot < 1)).all()
    assert abs(rot.mean() - 0.5) < 0.05


def test_r2_never_reaches_one_at_wrap_boundaries():
    """ADVICE r2: uint32 values >= 2^32-128 used to round UP to exactly
    1.0 in float32, breaking the [0,1) contract. The 24-bit truncation
    must hold at adversarial sample indices (computed by inverting the
    additive recurrence so s*alpha lands within 128 of 2^32)."""
    import jax.numpy as jnp
    a = np.uint64(3242174889)
    # Solve s * a ≡ target (mod 2^32) for targets near the wrap.
    inv = pow(int(a), -1, 1 << 32)
    for target in (0xFFFFFFFF, 0xFFFFFF80, 0xFFFFFFC0):
        s = (inv * target) % (1 << 32)
        pt = np.asarray(r2_sequence(jnp.uint32(s - 1)))  # +1 inside
        assert (pt < 1.0).all() and (pt >= 0.0).all(), (target, pt)


def test_ld_render_is_deterministic_and_finite():
    ra = Renderer(_cfg("ld"))
    ra.render_frame("wavefront")
    ra.render_frame("wavefront")
    a = np.asarray(ra.accum)
    assert np.isfinite(a).all() and a.max() > 0

    rb = Renderer(_cfg("ld"), scene=ra.scene, meta=ra.meta)
    rb.render_frame("wavefront")
    rb.render_frame("wavefront")
    np.testing.assert_array_equal(a, np.asarray(rb.accum))

    # Different sampler -> different jitter -> different image.
    rc = Renderer(_cfg("random"), scene=ra.scene, meta=ra.meta)
    rc.render_frame("wavefront")
    rc.render_frame("wavefront")
    assert not np.array_equal(a, np.asarray(rc.accum))


def test_ld_sharded_runs_and_is_deterministic():
    import jax

    cfg = _cfg("ld")
    cfg.mesh_shape = (2, 2)
    cfg.width = cfg.height = 16
    cfg.ray_chunk = 256
    ra = Renderer(cfg)
    ra.render_frame("wavefront")
    a = np.asarray(ra.accum)
    assert np.isfinite(a).all() and a.max() > 0
    rb = Renderer(cfg, scene=ra.scene, meta=ra.meta)
    rb.render_frame("wavefront")
    np.testing.assert_array_equal(a, np.asarray(rb.accum))
