"""Golden-image regression (TODO.md engineering item).

The render is bitwise-deterministic on a fixed stack (threefry counter
RNG), but XLA/hardware drift can move float results slightly — so the
golden comparison uses a tight tolerance rather than exact equality:
loose enough to survive compiler upgrades, tight enough that any estimator
or traversal change (a different set of hits, a changed MIS weight, a
dropped bounce) fails loudly. To regenerate after a VERIFIED intentional
estimator change: render the same config on CPU and overwrite the npz
(the test body below is the exact recipe).
"""

import math
import os

import numpy as np

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.render import Renderer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_32_8spp.npz")


def test_cornell_matches_golden():
    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=32, height=32, ray_chunk=1024, max_bounces=8)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    r = Renderer(cfg)
    for _ in range(8):
        r.render_frame("wavefront")
    img = r.film_hdr()

    gold = np.load(GOLDEN)["hdr"]
    assert img.shape == gold.shape
    # Same RNG stream -> same hit set; only float scheduling may differ.
    np.testing.assert_allclose(img, gold, rtol=2e-3, atol=2e-3)
