import math
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def write_hdr_flat(path, img):
    """Minimal Radiance writer (flat scanlines) for testing the reader."""
    h, w, _ = img.shape
    # float -> rgbe
    maxc = img.max(axis=2)
    exp = np.where(maxc > 1e-32, np.ceil(np.log2(np.maximum(maxc, 1e-32))) + 1,
                   0).astype(np.int32)
    scale = np.where(maxc > 1e-32, 256.0 / np.exp2(exp), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(maxc > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def test_hdr_reader_roundtrip(tmp_path):
    from gpupathtracer_tpu.utils.io import load_hdr
    rng = np.random.RandomState(0)
    img = (rng.rand(6, 7, 3) * 8.0).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    write_hdr_flat(p, img)
    back = load_hdr(p)
    assert back.shape == (6, 7, 3)
    # RGBE shares one exponent across channels: error bound is relative to
    # the per-pixel max channel (1/256 mantissa step).
    tol = img.max(axis=2, keepdims=True) / 50.0 + 1e-3
    assert (np.abs(back - img) <= tol).all()


def test_hdr_environment_render(tmp_path):
    """HDR equirect -> environment -> render path."""
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    img = np.zeros((8, 16, 3), np.float32)
    img[:4] = [0.1, 0.2, 1.0]   # bottom half (v<0.5): blue
    img[4:] = [1.0, 0.5, 0.1]   # top half: orange sky
    p = str(tmp_path / "env.hdr")
    write_hdr_flat(p, img[::-1])  # file stores top row first
    (tmp_path / "empty.obj").write_text(
        "v 0 -100 0\nv 1 -100 0\nv 0 -100 1\nf 1 2 3\n")
    cfg = RenderConfig(scene_path=str(tmp_path / "empty.obj"), skybox=p,
                       width=16, height=16, ray_chunk=256, max_bounces=2)
    cfg.camera = CameraConfig(position=(0, 0, 0), yaw=math.pi, pitch=0.5,
                              fov=math.radians(60), aspect=1.0)
    r = Renderer(cfg)
    r.render_frame()
    hdr = r.film_hdr()
    # Camera pitched upward: orange dominates
    assert hdr[..., 0].mean() > hdr[..., 2].mean()


def test_blinn_phong_sampler_pdf_consistency():
    import jax
    import jax.numpy as jnp
    from tests.test_microfacet import make_mat
    from gpupathtracer_tpu.models.interaction import make_interaction
    from gpupathtracer_tpu.models.microfacet import generate_importance_sample
    n = 1 << 16
    mat = make_mat(n, rough=0.5, metallic=0.0)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    outgoing = jnp.broadcast_to(
        jnp.asarray([np.sin(0.4), 0.0, np.cos(0.4)], np.float32), (n, 3))
    inter = make_interaction(normal, outgoing)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    inter_s, pdf_s, pdf_m = generate_importance_sample(
        mat, inter, jax.random.uniform(k1, (n,)),
        jax.random.uniform(k2, (n, 2)), "blinn_phong")
    est = jnp.where(inter_s.ndi > 0, inter_s.ndi / (pdf_s + pdf_m), 0.0)
    val = float(jnp.mean(est))
    assert abs(val - np.pi) / np.pi < 0.06, val


def test_nee_on_off_converge():
    """NEE+MIS and BSDF-only sampling estimate the same integral — the MIS
    bookkeeping (emission rewrite, pdf carries) must keep them consistent."""
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    def render(nee, spp, seed=0):
        cfg = RenderConfig(scene_path="proc:cornell",
                           skybox="GENERATE COLOR BLACK", width=16, height=16,
                           ray_chunk=256, nee_enabled=nee, seed=seed,
                           max_bounces=12)
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
        r = Renderer(cfg)
        for _ in range(spp):
            r.render_frame()
        return r.film_hdr()

    a = render(True, 24)
    b = render(False, 160, seed=5)
    ma, mb = a.mean(), b.mean()
    # BSDF-only estimates of a small area light carry heavy variance even at
    # 160 spp on a 16x16 film; this is a consistency check, not a tight one.
    assert abs(ma - mb) / (mb + 1e-9) < 0.25, (ma, mb)
