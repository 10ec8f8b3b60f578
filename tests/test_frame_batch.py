"""Multi-sample batching (render_sample_batch / cfg.frame_batch): one
dispatch accumulates spp samples — the realtime dispatch-overhead
amortization (TODO r2, VERDICT r2 #4)."""

import math

import numpy as np

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def _cfg(**kw):
    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=16, height=16, ray_chunk=1 << 10,
                       max_bounces=4, **kw)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    return cfg


def test_frame_batch_accumulates_spp():
    from gpupathtracer_tpu.render import Renderer

    r = Renderer(_cfg(frame_batch=4))
    r.render_frame()
    assert r.num_samples == 4
    img4 = r.film_hdr()
    assert np.isfinite(img4).all() and img4.mean() > 0

    # Statistically consistent with 4 unbatched frames (different RNG
    # streams, same estimator).
    r1 = Renderer(_cfg(), scene=r.scene, meta=r.meta)
    for _ in range(4):
        r1.render_frame()
    assert r1.num_samples == 4
    img1 = r1.film_hdr()
    assert abs(img4.mean() - img1.mean()) / max(img1.mean(), 1e-6) < 0.35


def test_frame_batch_direct_mode():
    from gpupathtracer_tpu.render import Renderer

    r = Renderer(_cfg(frame_batch=2, integrator="direct"))
    r.render_frame()
    assert r.num_samples == 2
    img = r.film_hdr()
    assert np.isfinite(img).all() and img.mean() > 0
