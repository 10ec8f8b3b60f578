import math

import numpy as np
import pytest

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.render import Renderer

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def cornell_cfg(res=32):
    cfg = RenderConfig(scene_path="proc:cornell", skybox="GENERATE COLOR BLACK",
                       width=res, height=res, ray_chunk=res * res)
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    return cfg


@pytest.fixture(scope="module")
def cornell_renderer():
    return Renderer(cornell_cfg())


def test_wavefront_matches_reference_integrator(cornell_renderer):
    """The de-facto integration test of the reference (SURVEY.md §4.1):
    two independent estimators of the same scene must agree statistically."""
    r = cornell_renderer
    r.reset_samples()
    for _ in range(12):
        r.render_frame("wavefront")
    img_w = r.film_hdr()

    r2 = Renderer(cornell_cfg(), scene=r.scene, meta=r.meta)
    for _ in range(48):
        r2.render_frame("reference")
    img_r = r2.film_hdr()

    assert not np.isnan(img_w).any() and not np.isnan(img_r).any()
    mw, mr = img_w.mean(axis=(0, 1)), img_r.mean(axis=(0, 1))
    assert (np.abs(mw - mr) / (mr + 1e-6)).max() < 0.08, (mw, mr)
    # Color bleeding present: walls tint their channels differently.
    assert img_w.mean(axis=(0, 1)).std() > 0.005


def test_bitwise_reproducibility(cornell_renderer):
    """threefry RNG => identical renders for identical (seed, sample)."""
    r = cornell_renderer
    r.reset_samples()
    r.render_frame("wavefront")
    a = np.asarray(r.accum)
    r.reset_samples()
    r.render_frame("wavefront")
    b = np.asarray(r.accum)
    np.testing.assert_array_equal(a, b)


def test_different_seeds_differ(cornell_renderer):
    r = cornell_renderer
    r.reset_samples()
    r.render_frame("wavefront")
    a = np.asarray(r.accum)
    import jax
    r.base_key = jax.random.PRNGKey(123)
    r.reset_samples()
    r.render_frame("wavefront")
    b = np.asarray(r.accum)
    assert not np.array_equal(a, b)


def test_white_env_background():
    """Primary misses see the environment exactly (GENERATE COLOR WHITE)."""
    cfg = RenderConfig(scene_path="proc:bunny", skybox="GENERATE COLOR WHITE",
                       width=32, height=32, ray_chunk=32 * 32)
    cfg.camera = CameraConfig(position=(0.0, 30.0, -40.0), yaw=math.pi,
                              pitch=-0.2, fov=math.radians(45), aspect=1.0)
    r = Renderer(cfg)
    r.render_frame("wavefront")
    img = r.film_hdr()
    # Sky pixels (top rows after bottom-origin layout => high indices) = 1.0.
    top = img[-1]  # topmost scanline well above the ground/bunny
    assert np.isfinite(img).all()
    np.testing.assert_allclose(top, 1.0, atol=1e-5)


def test_reset_samples(cornell_renderer):
    r = cornell_renderer
    r.reset_samples()
    r.render_frame("wavefront")
    assert r.num_samples == 1
    r.reset_samples()
    assert r.num_samples == 0
    assert float(np.abs(np.asarray(r.accum)).max()) == 0.0


def test_sun_light():
    """SUN_LIGHT branch: a sun-lit ground plane renders consistently in
    both integrators (NEE-sun in wavefront vs sun-disk-on-miss in the
    reference integrator)."""
    cfg = RenderConfig(scene_path="proc:bunny", skybox="GENERATE COLOR BLACK",
                       width=24, height=24, ray_chunk=24 * 24,
                       sun_enabled=True, max_bounces=8)
    cfg.camera = CameraConfig(position=(0.0, 4.0, -12.0), yaw=math.pi,
                              pitch=-0.25, fov=math.radians(45), aspect=1.0)
    r = Renderer(cfg)
    for _ in range(12):
        r.render_frame("wavefront")
    img_w = r.film_hdr()
    assert np.isfinite(img_w).all()
    assert img_w.max() > 0.05  # sun actually lights the scene

    r2 = Renderer(cfg, scene=r.scene, meta=r.meta)
    for _ in range(48):
        r2.render_frame("reference")
    img_r = r2.film_hdr()
    mw, mr = img_w.mean(), img_r.mean()
    assert abs(mw - mr) / (mr + 1e-9) < 0.25, (mw, mr)


def test_sun_disabled_is_dark():
    cfg = RenderConfig(scene_path="proc:bunny", skybox="GENERATE COLOR BLACK",
                       width=16, height=16, ray_chunk=256, sun_enabled=False,
                       max_bounces=4)
    cfg.camera = CameraConfig(position=(0.0, 4.0, -12.0), yaw=math.pi,
                              pitch=-0.25, fov=math.radians(45), aspect=1.0)
    r = Renderer(cfg)
    r.render_frame("wavefront")
    assert r.film_hdr().max() < 1e-6  # black env, no lights, no sun


def test_ao_integrator(cornell_renderer):
    r = cornell_renderer
    r.reset_samples()
    for _ in range(4):
        r.render_frame("ao")
    img = r.film_hdr()
    assert np.isfinite(img).all()
    # Open side behind the camera is unoccluded (1.0); corners darker.
    assert img.max() > 0.9
    assert img.min() < 0.9
    r.reset_samples()


def test_furnace():
    """Furnace test: albedo-1 rough sphere in a unit-radiance white furnace.
    The reference's BSDF (replicated exactly: quirky Smith visibility +
    (1-F)(1-F) diffuse with f0=0.04) loses ~10% energy; this pins the band
    so estimator regressions (lost/gained energy) are caught."""
    from gpupathtracer_tpu.scene import pack_scene
    from gpupathtracer_tpu.scene.envmap import from_color
    from gpupathtracer_tpu.scene.mesh import build_triangle_soup
    from gpupathtracer_tpu.scene.procedural import SceneBuilder

    sb = SceneBuilder()
    m = sb.add_material(name="white", albedo=(1.0, 1.0, 1.0), roughness_g=1.0)
    sb.add_icosphere([0, 0, 0], 1.0, m, subdiv=3)
    mesh, mats = sb.build()
    cfg = RenderConfig(width=24, height=24, ray_chunk=576, max_bounces=32)
    cfg.camera = CameraConfig(position=(0, 0, -4), yaw=math.pi,
                              fov=math.radians(40), aspect=1.0)
    scene, meta = pack_scene(build_triangle_soup(mesh), mats,
                             from_color((1.0, 1.0, 1.0)), cfg)
    r = Renderer(cfg, scene=scene, meta=meta)
    for _ in range(16):
        r.render_frame()
    img = r.film_hdr()
    sphere = img[9:15, 9:15]
    assert np.isfinite(img).all()
    assert 0.82 < sphere.mean() < 1.02, sphere.mean()
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-5)  # env unchanged


def test_scene_txt_end_to_end(tmp_path):
    """The reference's 4-line scene.txt drives a full render (Program.cpp
    flow): OBJ path, skybox spec, camera position, camera rotation."""
    (tmp_path / "tri.obj").write_text(
        "v -20 0 -20\nv 20 0 -20\nv 0 0 20\nvn 0 1 0\nf 1//1 3//1 2//1\n")
    (tmp_path / "scene.txt").write_text(
        f"{tmp_path}/tri.obj\nGENERATE COLOR WHITE\n0.0 3.0 -8.0\n3.14159 -0.3\n")
    from gpupathtracer_tpu.config import load_scene_txt
    cfg = load_scene_txt(str(tmp_path / "scene.txt"), 32, 32)
    cfg.ray_chunk = 1024
    cfg.max_bounces = 4
    r = Renderer(cfg)
    r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    assert img.max() > 0.5  # white env visible


def test_mirror_material():
    """illum 5 mirror: the camera sees the light's reflection in the floor."""
    import tempfile, os
    from gpupathtracer_tpu.scene.materials import MATERIAL_MIRROR
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "m.mtl"), "w") as f:
        f.write("newmtl mirror\nKd 0.9 0.9 0.9\nNs 1000\nillum 5\n"
                "newmtl light\nKd 0 0 0\nKe 10 10 10\nNs 1\n")
    with open(os.path.join(d, "s.obj"), "w") as f:
        f.write("mtllib m.mtl\n"
                "v -5 0 -5\nv 5 0 -5\nv 5 0 5\nv -5 0 5\n"   # mirror floor
                "v -1 4 -1\nv 1 4 -1\nv 1 4 1\nv -1 4 1\n"   # light above
                "vn 0 1 0\nvn 0 -1 0\n"
                "usemtl mirror\nf 1//1 4//1 3//1 2//1\n"
                "usemtl light\nf 5//2 6//2 7//2 8//2\n")
    from gpupathtracer_tpu.scene.objloader import load_obj
    mesh, mats = load_obj(os.path.join(d, "s.obj"))
    assert any(m.material_type == MATERIAL_MIRROR for m in mats)

    cfg = RenderConfig(scene_path=os.path.join(d, "s.obj"),
                       skybox="GENERATE COLOR BLACK", width=32, height=32,
                       ray_chunk=1024, max_bounces=4)
    # Camera above the floor, looking down at the mirror between the light.
    cfg.camera = CameraConfig(position=(3.0, 2.5, 0.0), yaw=-math.pi / 2,
                              pitch=-0.8, fov=math.radians(60), aspect=1.0)
    r = Renderer(cfg)
    assert r.meta.has_delta
    for _ in range(16):
        r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    # The mirrored light must appear: some floor pixels reflect ~10.
    assert img.max() > 3.0, img.max()
    # And the mirror itself adds no diffuse: dark floor away from the
    # reflection.
    assert np.percentile(img, 20) < 0.5


def test_glass_furnace():
    """Refractive sphere in a white furnace: reflect+refract with albedo 1
    conserves energy (mean stays ~1)."""
    from gpupathtracer_tpu.scene import pack_scene
    from gpupathtracer_tpu.scene.envmap import from_color
    from gpupathtracer_tpu.scene.mesh import build_triangle_soup
    from gpupathtracer_tpu.scene.procedural import SceneBuilder
    from gpupathtracer_tpu.scene.materials import MATERIAL_REFRACTIVE

    sb = SceneBuilder()
    glass = sb.add_material(name="glass", albedo=(1.0, 1.0, 1.0),
                            material_type=MATERIAL_REFRACTIVE, ior=1.5)
    sb.add_icosphere([0, 0, 0], 1.0, glass, subdiv=3)
    mesh, mats = sb.build()
    cfg = RenderConfig(width=24, height=24, ray_chunk=576, max_bounces=24)
    cfg.camera = CameraConfig(position=(0, 0, -4), yaw=math.pi,
                              fov=math.radians(40), aspect=1.0)
    scene, meta = pack_scene(build_triangle_soup(mesh), mats,
                             from_color((1.0, 1.0, 1.0)), cfg)
    assert meta.has_delta
    r = Renderer(cfg, scene=scene, meta=meta)
    for _ in range(16):
        r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    # Slight downward bias from the 24-bounce cap truncating total-internal-
    # reflection chains (RR never kills albedo-1 paths).
    assert 0.80 < img.mean() < 1.1, img.mean()


def test_sun_cone_matches_disk():
    """Solid-angle sun sampling (sun_mode="cone") must agree with the
    reference's disk hack at a small angular radius (5 deg), where the
    disk's area measure approximates the cone's solid angle well."""
    import dataclasses

    def run(mode):
        cfg = RenderConfig(scene_path="proc:bunny",
                           skybox="GENERATE COLOR BLACK",
                           width=24, height=24, ray_chunk=24 * 24,
                           sun_enabled=True, sun_mode=mode, max_bounces=8,
                           seed=5)
        cfg.camera = CameraConfig(position=(0.0, 4.0, -12.0), yaw=math.pi,
                                  pitch=-0.25, fov=math.radians(45),
                                  aspect=1.0)
        r = Renderer(cfg)
        for _ in range(16):
            r.render_frame("wavefront")
        return r.film_hdr()

    img_disk = run("disk")
    img_cone = run("cone")
    assert np.isfinite(img_cone).all()
    assert img_cone.max() > 0.05
    md, mc = img_disk.mean(), img_cone.mean()
    assert abs(md - mc) / (md + 1e-9) < 0.15, (md, mc)
