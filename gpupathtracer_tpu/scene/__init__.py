from gpupathtracer_tpu.scene.mesh import MeshData, build_triangle_soup, TriangleSoup
from gpupathtracer_tpu.scene.materials import MaterialDesc, obj_material_heuristics, pack_materials
from gpupathtracer_tpu.scene.envmap import EnvMap, load_environment
from gpupathtracer_tpu.scene.scenedata import SceneData, load_scene, pack_scene

__all__ = [
    "MeshData", "TriangleSoup", "build_triangle_soup",
    "MaterialDesc", "obj_material_heuristics", "pack_materials",
    "EnvMap", "load_environment",
    "SceneData", "load_scene", "pack_scene",
]
