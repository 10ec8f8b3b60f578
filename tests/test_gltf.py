import base64
import json
import struct

import numpy as np

from gpupathtracer_tpu.scene.gltf import load_gltf
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def make_gltf_dict():
    # Two triangles (a quad), one emissive material; node scaled by 2 and
    # translated by (1, 0, 0).
    positions = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                           np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.asarray([0, 1, 2, 0, 2, 3], np.uint16)
    blob = (positions.tobytes() + normals.tobytes() + uvs.tobytes()
            + indices.tobytes())
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1, 0, 0], "scale": [2, 2, 2]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3, "material": 0}]}],
        "materials": [{
            "name": "glow",
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.2, 0.3, 0.4, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.5},
            "emissiveFactor": [1.0, 0.5, 0.25],
            "extensions": {"KHR_materials_emissive_strength": {
                "emissiveStrength": 4.0}},
        }],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
    }
    return gltf, blob


def test_load_gltf_json(tmp_path):
    gltf, blob = make_gltf_dict()
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(blob).decode())
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(gltf))
    mesh, materials = load_gltf(str(p))
    assert mesh.triangles.shape == (2, 3)
    # Transform applied: scale 2 then translate (1,0,0).
    np.testing.assert_allclose(mesh.positions[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.positions[2], [3, 2, 0], atol=1e-6)
    glow = materials[1]
    assert glow.name == "glow"
    np.testing.assert_allclose(glow.albedo, (0.2, 0.3, 0.4))
    np.testing.assert_allclose(glow.roughness_g, 0.5)
    np.testing.assert_allclose(glow.emission, (4.0, 2.0, 1.0))
    assert glow.is_emissive


def test_load_glb(tmp_path):
    gltf, blob = make_gltf_dict()
    json_bytes = json.dumps(gltf).encode()
    json_bytes += b" " * ((4 - len(json_bytes) % 4) % 4)
    blob_p = blob + b"\0" * ((4 - len(blob) % 4) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2,
                       12 + 8 + len(json_bytes) + 8 + len(blob_p))
           + struct.pack("<II", len(json_bytes), 0x4E4F534A) + json_bytes
           + struct.pack("<II", len(blob_p), 0x004E4942) + blob_p)
    p = tmp_path / "scene.glb"
    p.write_bytes(glb)
    mesh, materials = load_gltf(str(p))
    assert mesh.triangles.shape == (2, 3)
    assert len(materials) == 2


def test_gltf_renders(tmp_path):
    """Full pipeline: glTF -> scene -> one rendered sample."""
    import math
    gltf, blob = make_gltf_dict()
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(blob).decode())
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(gltf))
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    cfg = RenderConfig(scene_path=str(p), skybox="GENERATE COLOR BLACK",
                       width=16, height=16, ray_chunk=256)
    cfg.camera = CameraConfig(position=(2.0, 1.0, -4.0), yaw=math.pi,
                              fov=math.radians(60), aspect=1.0)
    r = Renderer(cfg)
    r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    assert img.max() > 0.5  # the emissive quad is visible


def test_gltf_with_texture(tmp_path):
    """glTF baseColorTexture (external uri) -> atlas -> textured render."""
    from gpupathtracer_tpu.utils.io import save_png
    checker = np.zeros((8, 8, 3), np.float32)
    checker[::2, ::2] = [1, 0, 0]
    checker[1::2, 1::2] = [0, 1, 0]
    save_png(str(tmp_path / "tex.png"), checker)
    gltf, blob = make_gltf_dict()
    gltf["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                                 + base64.b64encode(blob).decode())
    gltf["images"] = [{"uri": "tex.png"}]
    gltf["textures"] = [{"source": 0}]
    gltf["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}
    gltf["materials"][0]["emissiveFactor"] = [0, 0, 0]
    p = tmp_path / "scene.gltf"
    p.write_text(json.dumps(gltf))

    from gpupathtracer_tpu.scene.gltf import load_gltf
    mesh, materials = load_gltf(str(p))
    assert materials[1].albedo_texture == "tex.png"

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    import math
    cfg = RenderConfig(scene_path=str(p), skybox="GENERATE COLOR WHITE",
                       width=16, height=16, ray_chunk=256, max_bounces=2)
    cfg.camera = CameraConfig(position=(2.0, 1.0, -3.0), yaw=math.pi,
                              fov=math.radians(60), aspect=1.0)
    r = Renderer(cfg)
    assert r.meta.has_textures
    for _ in range(4):
        r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()


def test_direct_integrator_smoke():
    import math
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    cfg = RenderConfig(scene_path="proc:cornell", skybox="GENERATE COLOR BLACK",
                       width=16, height=16, ray_chunk=256, integrator="direct")
    cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                              fov=math.radians(45), aspect=1.0)
    r = Renderer(cfg)
    for _ in range(4):
        r.render_frame()
    img = r.film_hdr()
    assert np.isfinite(img).all()
    assert img.max() > 0.2  # direct lighting present


def test_malformed_gltf_raises_with_context(tmp_path):
    """Failure detection (SURVEY §5): glTF parse errors name the file."""
    import json as _json

    import pytest

    from gpupathtracer_tpu.scene.gltf import load_gltf
    cases = [
        "hello{",
        "{}",
        _json.dumps({"asset": {"version": "2.0"},
                     "meshes": [{"primitives":
                                 [{"attributes": {"POSITION": 99}}]}],
                     "scenes": [{"nodes": [0]}], "nodes": [{"mesh": 0}]}),
    ]
    for content in cases:
        p = tmp_path / "bad.gltf"
        p.write_text(content)
        with pytest.raises(ValueError, match=r"bad\.gltf"):
            load_gltf(str(p))
    g = tmp_path / "bad.glb"
    g.write_bytes(b"glTF\x02\x00\x00\x00\x10\x00")
    with pytest.raises(ValueError, match=r"bad\.glb"):
        load_gltf(str(g))
