import os
import textwrap

import numpy as np

from gpupathtracer_tpu.config import RenderConfig
from gpupathtracer_tpu.scene.mesh import build_triangle_soup
from gpupathtracer_tpu.scene.objloader import load_obj
from gpupathtracer_tpu.scene.scenedata import pack_scene
from gpupathtracer_tpu.scene.envmap import from_color


def write_scene(tmp_path):
    (tmp_path / "test.mtl").write_text(textwrap.dedent("""\
        newmtl shiny
        Kd 0.2 0.4 0.6
        Ks 0.9 0.9 0.9
        Ns 198.0
        illum 3
        newmtl lamp
        Kd 0.0 0.0 0.0
        Ke 10.0 8.0 6.0
        Ns 1.0
        illum 2
        newmtl matte
        Kd 0.5 0.5 0.5
        Ks 0.0 0.0 0.0
        Ns 10.0
        illum 2
    """))
    (tmp_path / "test.obj").write_text(textwrap.dedent("""\
        mtllib test.mtl
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        v 0 0 1
        vt 0 0
        vt 1 0
        vt 1 1
        vt 0 1
        vn 0 0 1
        usemtl shiny
        f 1/1/1 2/2/1 3/3/1 4/4/1
        usemtl lamp
        f 1/1 2/2 5/1
        usemtl matte
        f -5 -4 -1
    """))
    return str(tmp_path / "test.obj")


def test_load_obj_basic(tmp_path):
    path = write_scene(tmp_path)
    mesh, materials = load_obj(path)
    # Quad fans into 2 tris + 2 single tris = 4.
    assert mesh.triangles.shape == (4, 3)
    # Material 0 is env; three named materials follow.
    assert materials[0].name == "__env__"
    names = [m.name for m in materials]
    assert "shiny" in names and "lamp" in names and "matte" in names

    shiny = materials[names.index("shiny")]
    # Heuristics (Scene.cpp:156-175): metallic=1 since max(Ks)>0.3;
    # beckmann roughness = sqrt(2/(Ns+2)) = sqrt(2/200) = 0.1.
    assert shiny.metallic == 1.0
    np.testing.assert_allclose(shiny.roughness_g, 0.1, atol=1e-6)
    np.testing.assert_allclose(shiny.albedo, (0.2, 0.4, 0.6))

    lamp = materials[names.index("lamp")]
    assert lamp.is_emissive and lamp.emission == (10.0, 8.0, 6.0)
    matte = materials[names.index("matte")]
    assert matte.metallic == 0.0 and not matte.is_emissive


def test_negative_indices_and_missing_uv(tmp_path):
    path = write_scene(tmp_path)
    mesh, _ = load_obj(path)
    # Last face used negative indices (v1, v2, v5): positions must match.
    p = mesh.positions[mesh.triangles[3]]
    np.testing.assert_allclose(p, [[0, 0, 0], [1, 0, 0], [0, 0, 1]])


def test_emitter_cdf(tmp_path):
    path = write_scene(tmp_path)
    mesh, materials = load_obj(path)
    soup = build_triangle_soup(mesh)
    scene, meta = pack_scene(soup, materials, from_color((0, 0, 0)),
                             RenderConfig())
    # One emissive face (lamp triangle, area = 0.5 * |(1,0,0)x(0,0,1)| = 0.5).
    assert meta.num_lights == 1
    np.testing.assert_allclose(float(scene.total_light_area), 0.5, atol=1e-6)
    cdf = np.asarray(scene.light_cdf)
    assert (np.diff(cdf) >= 0).all()


def test_geometric_normal_flipped_to_vertex_normals(tmp_path):
    path = write_scene(tmp_path)
    mesh, _ = load_obj(path)
    soup = build_triangle_soup(mesh)
    # Face 0 (quad tri) has authored vn (0,0,1); geometric normal of
    # (0,0,0),(1,0,0),(1,1,0) is +z already: must agree.
    np.testing.assert_allclose(soup.normal[0], [0, 0, 1], atol=1e-6)


def test_malformed_obj_raises_with_line_context(tmp_path):
    """Failure detection (SURVEY §5): parse errors carry file:line."""
    import pytest
    for content in ("v 0 0\nf 1 2\n", "v a b c\n",
                    "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 9\n"):
        p = tmp_path / "bad.obj"
        p.write_text(content)
        with pytest.raises(ValueError, match=r"bad\.obj:\d+"):
            load_obj(str(p))
