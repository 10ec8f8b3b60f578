"""Megakernel integrator (ops/megakernel.py): statistical parity with the
wavefront integrator.

The two paths implement the SAME estimator (formulas cited to
Iterative.comp in both) but draw per-bounce uniforms from different
generators (threefry vs the TPU core PRNG), so parity is statistical:
image means must agree within Monte-Carlo error at matched spp, and
deterministic sub-quantities (hit classification via NEE-only direct
lighting) must agree tightly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.math.camera import generate_image_plane
from gpupathtracer_tpu.models.wavefront import render_sample
from gpupathtracer_tpu.ops.megakernel import (mega_eligible,
                                              pack_mega_tables,
                                              render_sample_mega)
from gpupathtracer_tpu.scene import load_scene

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cornell():
    cfg = RenderConfig(scene_path="proc:cornell",
                       skybox="GENERATE COLOR BLACK",
                       width=16, height=16, cache_enabled=True)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    scene, meta = load_scene(cfg)
    return cfg, scene, meta


def _px(n, w):
    idx = np.arange(n)
    return (jnp.asarray((idx % w).astype(np.float32)),
            jnp.asarray((idx // w).astype(np.float32)))


def _render(fn, key_base, spp):
    acc = None
    for s in range(spp):
        c, _ = fn(jax.random.fold_in(key_base, s), s)
        acc = c if acc is None else acc + c
    return np.asarray(acc) / spp


def test_mega_eligibility(cornell):
    cfg, scene, meta = cornell
    assert mega_eligible(scene, meta, textured=False, delta=False,
                         sun=False)
    assert not mega_eligible(scene, meta, textured=True, delta=False,
                             sun=False)


def test_mega_direct_matches_wavefront(cornell):
    """max_bounces=0 (direct lighting): the only randomness is pixel
    jitter (IDENTICAL threefry draws in both paths) + the light-sample
    uniforms, so at modest spp the per-pixel means converge tightly."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 256
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, max_bounces=0, nee=True)

    def mega(key, s):
        return render_sample_mega(scene, tables, cam, px, py, key,
                                  n_mats=meta.num_materials,
                                  n_lights=int(scene.light_rows.shape[0]),
                                  packet_size=256, interpret=True,
                                  sample_idx=s, **kw)

    def wave(key, s):
        return render_sample(scene, cam, px, py, key, model=cfg.microfacet,
                             compaction=False, sample_idx=s, **kw)

    spp = 48
    img_m = _render(mega, jax.random.PRNGKey(5), spp)
    img_w = _render(wave, jax.random.PRNGKey(5), spp)
    assert np.isfinite(img_m).all()
    # Direct light through one light quad: global mean within ~4%.
    assert img_w.mean() > 0
    assert abs(img_m.mean() - img_w.mean()) / img_w.mean() < 0.04
    # Per-pixel: emission hits (the light quad) are deterministic given
    # the shared jitter; everything else within MC noise of the
    # light-point sample. Compare against a loose per-pixel envelope.
    lum_m = img_m.mean(axis=1)
    lum_w = img_w.mean(axis=1)
    denom = np.maximum(lum_w, lum_w.mean() * 0.25)
    assert (np.abs(lum_m - lum_w) / denom < 0.35).mean() > 0.95


def test_mega_full_pt_statistical(cornell):
    """Full path tracing (bounces + RR + MIS rewrite): image means agree
    within Monte-Carlo error at matched spp."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 256
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, max_bounces=6, nee=True)

    def mega(key, s):
        return render_sample_mega(scene, tables, cam, px, py, key,
                                  n_mats=meta.num_materials,
                                  n_lights=int(scene.light_rows.shape[0]),
                                  packet_size=256, interpret=True,
                                  sample_idx=s, **kw)

    def wave(key, s):
        return render_sample(scene, cam, px, py, key, model=cfg.microfacet,
                             compaction=False, sample_idx=s, **kw)

    spp = 64
    img_m = _render(mega, jax.random.PRNGKey(7), spp)
    img_w = _render(wave, jax.random.PRNGKey(7), spp)
    assert np.isfinite(img_m).all() and (img_m >= 0).all()
    assert img_w.mean() > 0
    # Global mean within 6% (MC sem of the mean at 64 spp x 256 px is
    # ~1-2% on this scene; 6% catches any systematic estimator drift).
    assert abs(img_m.mean() - img_w.mean()) / img_w.mean() < 0.06
    # The indirect share (full - direct) must also agree: catches a
    # broken MIS rewrite or RR that direct mode would hide.
    assert img_m.mean() > img_w.mean() * 0.5


def test_mega_rays_counter_and_padding(cornell):
    """The ray counter counts bounce + live shadow rays; padded lanes
    (n not a multiple of the packet) contribute nothing."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 200  # NOT a multiple of 128: exercises the padding path
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    c, rays = render_sample_mega(
        scene, tables, cam, px, py, jax.random.PRNGKey(3),
        width=16, height=16, stack_depth=meta.stack_depth,
        leaf_size=meta.leaf_size, max_bounces=2, nee=True,
        n_mats=meta.num_materials,
        n_lights=int(scene.light_rows.shape[0]),
        packet_size=128, interpret=True)
    c = np.asarray(c)
    assert c.shape == (n, 3) and np.isfinite(c).all()
    assert c.mean() > 0
    assert int(rays) >= n  # at least the primaries


def test_mega_deterministic(cornell):
    """Same key, same layout => bitwise-identical frame (the megakernel's
    PRNG is seeded per packet from the threefry key)."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 256
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, max_bounces=3, nee=True,
              n_mats=meta.num_materials,
              n_lights=int(scene.light_rows.shape[0]),
              packet_size=256, interpret=True)
    a, _ = render_sample_mega(scene, tables, cam, px, py,
                              jax.random.PRNGKey(11), **kw)
    b, _ = render_sample_mega(scene, tables, cam, px, py,
                              jax.random.PRNGKey(11), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mega_renderer_integration(cornell):
    """Renderer-level wiring: cfg.megakernel='on' routes eligible frames
    through the megakernel (and 'direct' mode through max_bounces=0);
    accumulation, film, and stats work end to end."""
    cfg, scene, meta = cornell
    cfg2 = RenderConfig(**{**cfg.__dict__})
    cfg2.megakernel = "on"
    cfg2.traversal = "pallas"  # CPU: resolve_traversal would pick packet
    from gpupathtracer_tpu.render import Renderer
    r = Renderer(cfg2, scene=scene, meta=meta)
    assert r.use_mega
    for _ in range(2):
        r.render_frame()
    r.sync()
    img = r.film_hdr()
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and img.mean() > 0

    # Plain-renderer statistical agreement at matched spp.
    cfg3 = RenderConfig(**{**cfg.__dict__})
    plain = Renderer(cfg3, scene=scene, meta=meta)
    for _ in range(2):
        plain.render_frame()
    plain.sync()
    ref = plain.film_hdr()
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.3

    # Direct mode through the megakernel.
    r.reset_samples()
    r.render_frame("direct", sync=True)
    assert np.isfinite(r.film_hdr()).all()


def test_mega_regen_matches_loop(cornell):
    """In-kernel path regeneration (spp>1 in one dispatch) agrees
    statistically with spp single-sample dispatches, handles padding,
    and is deterministic. The regen raygen reimplements the thin-lens
    model (Camera.cpp:58-69) on-core; jitter/lens draws move to the
    kernel's counter-based stream, so agreement is statistical."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 200  # NOT a multiple of 128: regen must ignore padded lanes
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, max_bounces=6, nee=True,
              n_mats=meta.num_materials,
              n_lights=int(scene.light_rows.shape[0]),
              packet_size=128, interpret=True)
    SPP = 16
    key = jax.random.PRNGKey(5)
    c_r, rays_r = render_sample_mega(scene, tables, cam, px, py, key,
                                     sample_idx=0, spp=SPP, **kw)
    img_r = np.asarray(c_r) / SPP

    def mega(k, s):
        return render_sample_mega(scene, tables, cam, px, py, k,
                                  sample_idx=s, **kw)

    img_l = _render(mega, jax.random.PRNGKey(9), SPP)
    assert np.isfinite(img_r).all() and (img_r >= 0).all()
    # Matched-spp MC agreement on the image mean.
    assert abs(img_r.mean() - img_l.mean()) / img_l.mean() < 0.08
    # The regen dispatch traces ~SPP x the segments of one sample.
    assert int(rays_r) > 0.5 * SPP * n
    # Deterministic given (key, layout).
    c_r2, _ = render_sample_mega(scene, tables, cam, px, py, key,
                                 sample_idx=0, spp=SPP, **kw)
    np.testing.assert_array_equal(np.asarray(c_r), np.asarray(c_r2))


def test_mega_regen_direct(cornell):
    """Regen composes with direct lighting (max_bounces=0): spp direct
    samples in one dispatch."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 256
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, max_bounces=0, nee=True,
              n_mats=meta.num_materials,
              n_lights=int(scene.light_rows.shape[0]),
              packet_size=256, interpret=True)
    SPP = 8
    c_r, rays = render_sample_mega(scene, tables, cam, px, py,
                                   jax.random.PRNGKey(2), sample_idx=0,
                                   spp=SPP, **kw)
    img_r = np.asarray(c_r) / SPP

    def mega(k, s):
        return render_sample_mega(scene, tables, cam, px, py, k,
                                  sample_idx=s, **kw)

    img_l = _render(mega, jax.random.PRNGKey(4), SPP)
    assert np.isfinite(img_r).all()
    assert abs(img_r.mean() - img_l.mean()) / img_l.mean() < 0.1
    # Exactly SPP primary segments per lane in direct mode.
    assert int(rays) >= SPP * n


def test_mega_regen_renderer_batch(cornell):
    """Renderer wiring for the regen path: megakernel='on' +
    frame_batch>1 accumulates batch samples per render_frame through ONE
    regen dispatch, for both wavefront and direct integrators."""
    cfg, scene, meta = cornell
    cfg2 = RenderConfig(**{**cfg.__dict__})
    cfg2.megakernel = "on"
    cfg2.traversal = "pallas"
    cfg2.frame_batch = 4
    cfg2.max_bounces = 3
    from gpupathtracer_tpu.render import Renderer
    r = Renderer(cfg2, scene=scene, meta=meta)
    assert r.use_mega
    r.render_frame()
    r.sync()
    assert r.num_samples == 4
    img = r.film_hdr()
    assert np.isfinite(img).all() and img.mean() > 0

    r.render_frame("direct")
    r.sync()
    assert r.num_samples == 8
    img2 = r.film_hdr()
    assert np.isfinite(img2).all()


def test_mega_fused_nee_matches_plain(cornell):
    """Deferred-shadow fusion (fused_nee: walk_fused runs each bounce's
    closest walk paired with the PREVIOUS bounce's shadow walk in one
    region per phase pair) is schedule-only: RNG streams, pops, and path
    evolution are identical to the serial walks, so the contribution
    matches to FP-summation-order tolerance and the ray counter exactly
    (tools/mega_profile.py --fused-nee shows bitwise-equal pop
    counters)."""
    cfg, scene, meta = cornell
    cam = generate_image_plane(cfg.camera)
    n = 200  # NOT a multiple of 128: padded lanes must stay inert
    px, py = _px(n, 16)
    tables = pack_mega_tables(scene)
    kw = dict(width=16, height=16, stack_depth=meta.stack_depth,
              leaf_size=meta.leaf_size, nee=True,
              n_mats=meta.num_materials,
              n_lights=int(scene.light_rows.shape[0]),
              packet_size=128, interpret=True)
    key = jax.random.PRNGKey(11)
    for mb, spp in ((6, 1), (0, 1), (4, 8)):  # full PT, direct, regen
        c_p, rays_p = render_sample_mega(scene, tables, cam, px, py, key,
                                         sample_idx=0, max_bounces=mb,
                                         spp=spp, **kw)
        c_f, rays_f = render_sample_mega(scene, tables, cam, px, py, key,
                                         sample_idx=0, max_bounces=mb,
                                         spp=spp, fused_nee=True, **kw)
        assert int(rays_p) == int(rays_f), (mb, spp)
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_p),
                                   rtol=2e-3, atol=1e-5,
                                   err_msg=f"mb={mb} spp={spp}")
