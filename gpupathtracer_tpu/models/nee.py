"""Next-event estimation: emitter sampling from the cumulative-area CDF.

Rebuild of RandomLightVertex + GenerateLightSample (src/shaders/
Iterative.comp:34-147). The per-thread CDF binary search becomes a
vectorized `jnp.searchsorted`; the pdf/MIS algebra is replicated exactly
(Veach eq. 9 solid-angle conversion, balance heuristic, the area-measure
light pdf 1/totalLightArea; the SUN_LIGHT branch is compiled out in the
reference and optional here).

Scenes with zero emitters degrade gracefully exactly like the reference:
totalLightArea = 0 makes lightPdf infinite and every NEE term zero.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from gpupathtracer_tpu.math.sampling import sample_triangle_barycentrics
from gpupathtracer_tpu.math.vecmath import avdot, dot
from gpupathtracer_tpu.models.bsdf import compute_bsdf, mis_weight
from gpupathtracer_tpu.models.interaction import SurfaceInteraction, set_incoming
from gpupathtracer_tpu.models.materials import MaterialInstance
from gpupathtracer_tpu.models.microfacet import pdf_direction


class LightSample(NamedTuple):
    shadow_origin: jnp.ndarray   # [N, 3]
    shadow_dir: jnp.ndarray      # [N, 3]
    shadow_tmax: jnp.ndarray     # [N]
    throughput: jnp.ndarray      # [N, 3] (already MIS-weighted, / pdf)
    light_mat: jnp.ndarray       # [N] i32 emitter material id


def sample_light_vertex(scene, u_select, u_tri):
    """RandomLightVertex (Iterative.comp:34-82): CDF search + sqrt warp."""
    selected = u_select * scene.total_light_area
    i = jnp.searchsorted(scene.light_cdf, selected, side="right")
    i = jnp.clip(i, 0, scene.light_cdf.shape[0] - 1).astype(jnp.int32)
    tri = scene.light_tri[i]
    geom = scene.tri_geom[tri]
    p0, e1, e2 = geom[..., 0:3], geom[..., 3:6], geom[..., 6:9]
    bu, bv, bt = sample_triangle_barycentrics(u_tri)
    # Position = p0*u + p1*v + p2*t with p1 = p0+e1, p2 = p0+e2
    # (Iterative.comp:62-76) => p0 + e1*v + e2*t.
    pos = p0 + e1 * bv[..., None] + e2 * bt[..., None]
    return pos, scene.tri_normal[tri], scene.tri_mat[tri]


def generate_light_sample(scene, vertex_pos, vertex_normal,
                          mat: MaterialInstance, inter: SurfaceInteraction,
                          throughput, u_select, u_tri,
                          model: str = "trowbridge_reitz") -> LightSample:
    """GenerateLightSample (Iterative.comp:113-147), area-light branch."""
    light_pos, light_n, light_mat = sample_light_vertex(scene, u_select, u_tri)
    delta = light_pos - vertex_pos
    radius = jnp.sqrt(jnp.maximum(dot(delta, delta), 1e-20))
    light_dir = delta / radius[..., None]

    inter_l = set_incoming(inter, light_dir)
    light_pdf = 1.0 / scene.total_light_area  # inf when no emitters -> NEE = 0
    cos_light = avdot(light_n, -light_dir)
    r2 = radius * radius
    bounce_pdf = pdf_direction(mat, inter_l, model) * cos_light / r2  # Veach eq. 9
    weight = mis_weight(light_pdf, bounce_pdf)
    light_throughput = (throughput * compute_bsdf(mat, inter_l, model)
                        * (inter_l.ndi * cos_light * weight
                           / (light_pdf * r2))[..., None])

    return LightSample(
        shadow_origin=vertex_pos + 0.001 * inter.normal,
        shadow_dir=light_dir,
        shadow_tmax=radius - 0.005,
        throughput=light_throughput,
        light_mat=light_mat,
    )
