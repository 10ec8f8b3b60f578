import math
import textwrap

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.ops.texture import sample_atlas
from gpupathtracer_tpu.scene.textures import build_atlas
from gpupathtracer_tpu.utils.io import save_png
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def test_sample_atlas_basic():
    # Atlas with one 4x4 sub-rect: left half red, right half green.
    img = np.zeros((8, 8, 3), np.float32)
    img[0:4, 0:2] = [1, 0, 0]
    img[0:4, 2:4] = [0, 1, 0]
    rects = jnp.asarray([[0, 0, 4, 4]], jnp.int32)
    tex = jnp.zeros((4,), jnp.int32)
    uv = jnp.asarray([[0.13, 0.5], [0.87, 0.5], [1.13, 0.5], [-0.13, 0.5]],
                     jnp.float32)
    out = np.asarray(sample_atlas(jnp.asarray(img), rects, tex, uv))
    assert out[0, 0] > 0.9 and out[0, 1] < 0.1          # left -> red
    assert out[1, 1] > 0.9 and out[1, 0] < 0.1          # right -> green
    np.testing.assert_allclose(out[2], out[0], atol=1e-6)   # REPEAT wrap
    np.testing.assert_allclose(out[3], out[1], atol=1e-6)   # negative wrap


def test_build_atlas(tmp_path):
    a = np.zeros((8, 8, 3), np.float32); a[:] = [1, 0, 0]
    b = np.zeros((16, 4, 3), np.float32); b[:] = [0, 0, 1]
    save_png(str(tmp_path / "a.png"), a)
    save_png(str(tmp_path / "b.png"), b)
    atlas, rects, slots, _ = build_atlas(["a.png", "b.png", "missing.png"],
                                      str(tmp_path))
    assert set(slots) == {"a.png", "b.png"}
    ax, ay, aw, ah = rects[slots["a.png"]]
    assert (aw, ah) == (8, 8)
    np.testing.assert_allclose(atlas[ay + 2, ax + 2], [1, 0, 0], atol=0.01)
    bx, by, bw, bh = rects[slots["b.png"]]
    np.testing.assert_allclose(atlas[by + 2, bx + 2], [0, 0, 1], atol=0.01)


def test_textured_render_end_to_end(tmp_path):
    """OBJ + MTL + map_Kd checkerboard -> rendered image shows the texture."""
    checker = np.zeros((8, 8, 3), np.float32)
    checker[::2, ::2] = 1.0
    checker[1::2, 1::2] = 1.0
    save_png(str(tmp_path / "check.png"), checker)
    (tmp_path / "m.mtl").write_text(textwrap.dedent("""\
        newmtl floor
        Kd 1.0 0.0 0.0
        Ns 10
        map_Kd check.png
    """))
    (tmp_path / "s.obj").write_text(textwrap.dedent("""\
        mtllib m.mtl
        v -5 0 -5
        v 5 0 -5
        v 5 0 5
        v -5 0 5
        vt 0 0
        vt 4 0
        vt 4 4
        vt 0 4
        vn 0 1 0
        usemtl floor
        f 1/1/1 4/4/1 3/3/1 2/2/1
    """))
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    cfg = RenderConfig(scene_path=str(tmp_path / "s.obj"),
                       skybox="GENERATE COLOR WHITE", width=32, height=32,
                       ray_chunk=1024, max_bounces=2)
    cfg.camera = CameraConfig(position=(0.0, 6.0, 0.01), pitch=-1.55,
                              yaw=math.pi, fov=math.radians(60), aspect=1.0)
    r = Renderer(cfg)
    assert r.meta.has_textures
    for _ in range(8):
        r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    # The checkerboard must produce significant spatial variance in the
    # floor region (texture visible), unlike a constant-albedo floor.
    floor = img[4:28, 4:28, 0]
    assert floor.std() > 0.05, floor.std()


def test_metallic_roughness_map(tmp_path):
    """glTF-convention metallic-roughness map (G=roughness, B=metallic)
    multiplies the material constants; verified through the full
    pack_scene -> make_material_instance path."""
    import numpy as np
    import jax.numpy as jnp

    from gpupathtracer_tpu.config import RenderConfig
    from gpupathtracer_tpu.models.materials import make_material_instance
    from gpupathtracer_tpu.scene.materials import MaterialDesc, env_material
    from gpupathtracer_tpu.scene.mesh import MeshData, build_triangle_soup
    from gpupathtracer_tpu.scene.scenedata import pack_scene
    from gpupathtracer_tpu.scene.envmap import from_color
    from gpupathtracer_tpu.utils.io import save_png

    # MR map: left half (u<0.5) rough+dielectric, right half smooth+metal.
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4, 1] = 1.0   # G: roughness 1
    img[:, 4:, 2] = 1.0   # B: metallic 1
    mr_path = str(tmp_path / "mr.png")
    save_png(mr_path, img, flip_y=False)

    quad = MeshData(
        positions=np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                             np.float32),
        normals=np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1)),
        uvs=np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        mat_ids=np.ones((4,), np.int32),
        triangles=np.asarray([[0, 1, 2], [0, 2, 3]], np.int32))
    mats = [env_material(),
            MaterialDesc(name="mr", roughness_g=1.0, metallic=1.0,
                         mr_texture=mr_path)]
    soup = build_triangle_soup(quad)
    scene, meta = pack_scene(soup, mats, from_color((0, 0, 0)),
                             RenderConfig())
    assert meta.has_textures
    mat_id = jnp.asarray([1, 1], jnp.int32)
    uv = jnp.asarray([[0.25, 0.5], [0.80, 0.5]], jnp.float32)
    inst = make_material_instance(scene, mat_id, uv, textured=True)
    rough = np.asarray(inst.roughness)
    metal = np.asarray(inst.metallic)
    assert rough[0] > 0.9 and metal[0] < 0.1   # left: rough dielectric
    assert rough[1] < 0.01 and metal[1] > 0.9  # right: smooth metal
