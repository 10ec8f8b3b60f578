"""Texture mip pyramid + trilinear sampling (beyond the reference, which
samples level 0 only — Texture.cpp:127-130): exact pyramid identities,
trilinear blending, and the wavefront ray-cone LOD path end-to-end."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.ops.texture import sample_atlas
from gpupathtracer_tpu.scene.textures import _downsample2, build_atlas
from gpupathtracer_tpu.utils.io import save_png

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


@pytest.fixture(scope="module")
def mip_atlas(tmp_path_factory):
    td = tmp_path_factory.mktemp("tex")
    rng = np.random.RandomState(3)
    img = rng.rand(64, 48, 3).astype(np.float32)
    save_png(os.path.join(td, "r.png"), img)
    atlas, rects, slots, mips = build_atlas(["r.png"], str(td),
                                            mip_levels=3)
    return atlas, rects, mips


def test_mip_pyramid_contents(mip_atlas):
    """Each packed level is exactly the 2x box filter of the previous."""
    atlas, rects, mips = mip_atlas
    assert mips.shape == (1, 3)

    def rect_img(i):
        x, y, w, h = rects[i]
        return atlas[y:y + h, x:x + w]

    l0 = rect_img(mips[0, 0])
    l1 = rect_img(mips[0, 1])
    l2 = rect_img(mips[0, 2])
    assert l0.shape == (64, 48, 3)
    assert l1.shape == (32, 24, 3) and l2.shape == (16, 12, 3)
    np.testing.assert_allclose(l1, _downsample2(l0), atol=1e-6)
    np.testing.assert_allclose(l2, _downsample2(l1), atol=1e-6)


def test_trilinear_sampling(mip_atlas):
    """lod=0 equals plain bilinear; fractional lod blends the bracketing
    levels linearly; detail (sample variance) falls with lod."""
    atlas, rects, mips = mip_atlas
    a, r, m = jnp.asarray(atlas), jnp.asarray(rects), jnp.asarray(mips)
    rng = np.random.RandomState(11)
    uv = jnp.asarray(rng.rand(64, 2), jnp.float32)
    tid = jnp.zeros((64,), jnp.int32)

    s0 = np.asarray(sample_atlas(a, r, tid, uv, mips=m,
                                 lod=jnp.zeros((64,))))
    np.testing.assert_allclose(
        s0, np.asarray(sample_atlas(a, r, tid, uv)), atol=1e-6)
    s1 = np.asarray(sample_atlas(a, r, tid, uv, mips=m,
                                 lod=jnp.ones((64,))))
    sh = np.asarray(sample_atlas(a, r, tid, uv, mips=m,
                                 lod=jnp.full((64,), 0.5)))
    np.testing.assert_allclose(sh, 0.5 * (s0 + s1), atol=1e-6)
    s2 = np.asarray(sample_atlas(a, r, tid, uv, mips=m,
                                 lod=jnp.full((64,), 2.0)))
    assert s2.var() < 0.25 * s0.var()
    # Out-of-range lods clamp instead of reading bogus rects.
    shi = np.asarray(sample_atlas(a, r, tid, uv, mips=m,
                                  lod=jnp.full((64,), 99.0)))
    np.testing.assert_allclose(shi, s2, atol=1e-6)


def test_wavefront_mip_render(tmp_path_factory):
    """End-to-end: the textured town rendered with cfg.mip_levels=4 — the
    ray-cone LOD path (texel density col, camera pixel cone) produces a
    finite image statistically consistent with the level-0 render, and
    the scene carries a real pyramid."""
    from gpupathtracer_tpu.config import RenderConfig
    from gpupathtracer_tpu.render import Renderer
    from gpupathtracer_tpu.scene.samplegen import generate_textured_town

    out = tmp_path_factory.mktemp("town_mips")
    path = generate_textured_town(str(out))

    def render(levels):
        cfg = RenderConfig(scene_path=path, skybox="GENERATE COLOR BLACK",
                           width=16, height=16, max_bounces=2,
                           mip_levels=levels, cache_enabled=False)
        r = Renderer(cfg)
        for _ in range(8):
            r.render_frame()
        r.sync()
        return r, r.film_hdr()

    r4, img4 = render(4)
    assert r4.meta.mip_levels == 4
    assert r4.scene.atlas_mips.shape[1] == 4
    assert np.isfinite(img4).all() and img4.mean() > 0

    r1, img1 = render(1)
    assert r1.scene.atlas_mips.shape[1] == 1
    # Same estimator; mips low-pass the textures, which also perturbs RR
    # survival (different albedo -> different paths), so this is a noisy
    # statistical check, not a matched-RNG one.
    assert abs(img4.mean() - img1.mean()) / img1.mean() < 0.35
