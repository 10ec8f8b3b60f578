"""Golden-image regression corpus (TODO.md engineering item).

The render is bitwise-deterministic on a fixed stack (threefry counter
RNG), but XLA/hardware drift can move float results slightly — so the
golden comparison uses a tight tolerance rather than exact equality:
loose enough to survive compiler upgrades, tight enough that any estimator
or traversal change (a different set of hits, a changed MIS weight, a
dropped bounce) fails loudly.

Corpus picks one scene per estimator surface (reference parity set,
BASELINE.md configs):
  - cornell  : diffuse + area-light NEE/MIS (the statistical-parity scene)
  - table    : Trowbridge-Reitz metallic lobe + thin-lens DoF (config 2)
  - bathroom : Beckmann + near-mirror metallic (config 4's BSDF)

To regenerate after a VERIFIED intentional estimator change:
`python tools/gen_goldens.py` (renders the exact configs below on CPU
and overwrites the npz files).
"""

import math
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# name -> (scene, microfacet, spp)
CORPUS = {
    "cornell_32_8spp": ("proc:cornell", "trowbridge_reitz", 8),
    "table_32_8spp": ("proc:table", "trowbridge_reitz", 8),
    "bathroom_32_8spp": ("proc:bathroom", "beckmann", 8),
}


def render_golden(name):
    """The exact golden recipe — shared with tools/gen_goldens.py."""
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    scene, microfacet, spp = CORPUS[name]
    cfg = RenderConfig(scene_path=scene, skybox="GENERATE COLOR BLACK",
                       width=32, height=32, ray_chunk=1024, max_bounces=8,
                       microfacet=microfacet)
    if scene == "proc:cornell":
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
    else:
        from gpupathtracer_tpu.scene.procedural import default_camera
        pos, yaw, pitch, fov, aperture, focus = default_camera(scene)
        cfg.camera = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                                  fov=math.radians(fov), aspect=1.0,
                                  aperture=aperture, focal_distance=focus)
    r = Renderer(cfg)
    for _ in range(spp):
        r.render_frame("wavefront")
    return np.asarray(r.film_hdr())


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_matches_golden(name):
    img = render_golden(name)
    gold = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))["hdr"]
    assert img.shape == gold.shape
    # Same RNG stream -> same hit set; only float scheduling may differ.
    np.testing.assert_allclose(img, gold, rtol=2e-3, atol=2e-3)
