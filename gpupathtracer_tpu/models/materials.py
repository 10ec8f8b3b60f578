"""Per-lane material instances gathered from the scene's material table.

Role of ConstructMaterialInstance (src/shaders/common/Material.glsl:39-54):
roughness = max(G^2, 1e-4) (the stored G channel is sqrt of the TR-GGX
roughness), alpha^2 (`roughness2`) = roughness^2, reflectance F0 =
mix(0.04, albedo, metallic).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MaterialInstance(NamedTuple):
    albedo: jnp.ndarray       # [N, 3]
    roughness: jnp.ndarray    # [N]  (= alpha)
    roughness2: jnp.ndarray   # [N]  (= alpha^2)
    metallic: jnp.ndarray     # [N]
    reflectance: jnp.ndarray  # [N, 3] F0
    emission: jnp.ndarray     # [N, 3]


def make_material_instance(scene, mat_id, uv=None,
                           textured: bool = False) -> MaterialInstance:
    """Gather material data for per-lane material ids [N].

    With `textured` (static) and `uv`, albedo comes from the texture atlas
    for materials that have a map; constant albedo otherwise (the reference
    routes constants through 1x1 textures, Scene.cpp:100-104 — same value,
    no lookup needed, so untextured scenes compile without atlas gathers).
    """
    albedo = scene.mat_albedo[mat_id]
    g = scene.mat_rough_g[mat_id]
    metallic = scene.mat_metallic[mat_id]
    if textured and uv is not None:
        from gpupathtracer_tpu.ops.texture import sample_atlas
        tex = scene.mat_albedo_tex[mat_id]
        albedo = jnp.where((tex >= 0)[:, None],
                           sample_atlas(scene.atlas_image, scene.atlas_rects,
                                        tex, uv), albedo)
        # Metallic-roughness map (glTF convention: G = roughness factor,
        # B = metallic factor; both multiply the material constants).
        mr = scene.mat_mr_tex[mat_id]
        mr_rgb = sample_atlas(scene.atlas_image, scene.atlas_rects, mr, uv)
        has_mr = mr >= 0
        g = jnp.where(has_mr, g * mr_rgb[:, 1], g)
        metallic = jnp.where(has_mr, metallic * mr_rgb[:, 2], metallic)
    roughness = jnp.maximum(g * g, 1e-4)
    reflectance = (0.04 * (1.0 - metallic[..., None])
                   + albedo * metallic[..., None])
    return MaterialInstance(
        albedo=albedo, roughness=roughness, roughness2=roughness * roughness,
        metallic=metallic, reflectance=reflectance,
        emission=scene.mat_emission[mat_id])
