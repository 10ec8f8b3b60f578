"""Microfacet library: distributions, importance samplers, PDFs, Fresnel,
visibility, and the two-lobe (diffuse/specular) sampling strategy.

Faithful vectorized rebuild of src/shaders/common/Microfacet.glsl. Where the
reference's formulas are idiosyncratic (e.g. VisibilityGGX's
sqrt(a2*(1-a2)*ndo^2) term, Microfacet.glsl:117-119, or CalcDiffusePmf
returning the unmixed energy, 156-161) we replicate them — BASELINE.md
requires pixel-statistical parity with the same BSDF.

Supported models (Microfacet.glsl:11-92): Trowbridge-Reitz (GGX, default),
Beckmann, Blinn-Phong. Selection is a static string so XLA compiles exactly
one.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gpupathtracer_tpu.math.sampling import (pdf_cosine_hemisphere,
                                             sample_cosine_hemisphere)
from gpupathtracer_tpu.math.vecmath import luminance, mix
from gpupathtracer_tpu.models.interaction import (SurfaceInteraction,
                                                  set_incoming, to_world)
from gpupathtracer_tpu.models.materials import MaterialInstance

PI = jnp.pi


# --- Distributions (D) -------------------------------------------------------

def distribution_trowbridge_reitz(mat: MaterialInstance, inter: SurfaceInteraction):
    """Microfacet.glsl:13-16."""
    divisor = (mat.roughness2 - 1.0) * inter.ndm2 + 1.0
    return mat.roughness2 / jnp.maximum(PI * divisor * divisor, 1e-20)


def distribution_beckmann(mat: MaterialInstance, inter: SurfaceInteraction):
    """Microfacet.glsl:35-39 (log-space normalization)."""
    sub = 2.0 * jnp.log(jnp.sqrt(PI) * mat.roughness * jnp.maximum(inter.ndm, 1e-8))
    add = (inter.ndm2 - 1.0) / jnp.maximum(inter.ndm2 * mat.roughness2, 1e-20)
    return jnp.exp(add - sub)


def _blinn_phong_n(mat: MaterialInstance):
    """ConvertBeckmannToBlinnPhong (Microfacet.glsl:59-61)."""
    return 2.0 / mat.roughness - 2.0


def distribution_blinn_phong(mat: MaterialInstance, inter: SurfaceInteraction):
    n = _blinn_phong_n(mat)
    return (n + 1.0) / (2.0 * PI) * jnp.maximum(inter.ndm, 0.0) ** n


# --- Importance samplers (return a half vector in tangent space) -------------

def sample_trowbridge_reitz(mat: MaterialInstance, u):
    """Microfacet.glsl:19-26."""
    r0, r1 = u[..., 0], u[..., 1]
    z2 = jnp.maximum((1.0 - r0) / (r0 * (mat.roughness2 - 1.0) + 1.0), 0.0)
    z = jnp.sqrt(z2)
    phi = 2.0 * PI * r1
    radius = jnp.sqrt(jnp.maximum(1.0 - z2, 0.0))
    return jnp.stack([radius * jnp.sin(phi), radius * jnp.cos(phi), z], axis=-1)


def sample_beckmann(mat: MaterialInstance, u):
    """Microfacet.glsl:42-50 (Walter et al. eqs 28-29)."""
    r0, r1 = u[..., 0], u[..., 1]
    g = -mat.roughness2 * jnp.log(jnp.maximum(1.0 - r0, 1e-20))
    z2 = 1.0 / (1.0 + g)
    z = jnp.sqrt(z2)
    phi = 2.0 * PI * r1
    radius = jnp.sqrt(jnp.maximum(1.0 - z2, 0.0))
    return jnp.stack([radius * jnp.sin(phi), radius * jnp.cos(phi), z], axis=-1)


def sample_blinn_phong(mat: MaterialInstance, u):
    """Microfacet.glsl:72-80."""
    n = _blinn_phong_n(mat)
    r0, r1 = u[..., 0], u[..., 1]
    z = r0 ** (1.0 / (n + 1.0))
    phi = 2.0 * PI * r1
    radius = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return jnp.stack([radius * jnp.sin(phi), radius * jnp.cos(phi), z], axis=-1)


_MODELS = {
    "trowbridge_reitz": (distribution_trowbridge_reitz, sample_trowbridge_reitz),
    "beckmann": (distribution_beckmann, sample_beckmann),
    "blinn_phong": (distribution_blinn_phong, sample_blinn_phong),
}


def distribution(mat, inter, model: str = "trowbridge_reitz"):
    return _MODELS[model][0](mat, inter)


def sample_microfacet(mat, u, model: str = "trowbridge_reitz"):
    return _MODELS[model][1](mat, u)


def pdf_microfacet(mat, inter, model: str = "trowbridge_reitz"):
    """ProbabilityDensity* (Microfacet.glsl:29-31): D * ndm / (4 * idm)."""
    return jnp.maximum(
        distribution(mat, inter, model) * inter.ndm
        / jnp.maximum(4.0 * inter.idm, 1e-20), 1e-10)


# --- Fresnel / visibility / energy conservation ------------------------------

def fresnel_schlick(f0, cos_theta):
    """Microfacet.glsl:96-101. f0 [...,3], cos_theta [...]."""
    x = 1.0 - cos_theta[..., None]
    return f0 + (1.0 - f0) * (x ** 5)


def _visibility_ggx(mat: MaterialInstance, ndx):
    """Microfacet.glsl:117-119, replicated verbatim (incl. the a2*(1-a2)
    term; the CPU renderer uses the same formula, Renderer.cpp:948-950)."""
    return 1.0 / jnp.maximum(
        ndx + jnp.sqrt(mat.roughness2 * (1.0 - mat.roughness2) * ndx * ndx),
        1e-5)


def visibility_smith(mat: MaterialInstance, inter: SurfaceInteraction):
    """Microfacet.glsl:121-123: V(ndi) * V(ndo) / 4."""
    return _visibility_ggx(mat, inter.ndi) * _visibility_ggx(mat, inter.ndo) / 4.0


def diffuse_energy_conservation(mat: MaterialInstance, inter: SurfaceInteraction):
    """(1-metallic)(1-F(ndi))(1-F(ndo)) (Microfacet.glsl:140-142)."""
    return ((1.0 - mat.metallic[..., None])
            * (1.0 - fresnel_schlick(mat.reflectance, inter.ndi))
            * (1.0 - fresnel_schlick(mat.reflectance, inter.ndo)))


def calc_diffuse_pmf(mat: MaterialInstance, inter: SurfaceInteraction):
    """CalcDiffusePmf (Microfacet.glsl:156-161): evaluated at ndi = 0.5;
    note the reference returns the *unmixed* diffuse energy — replicated."""
    fake = inter._replace(ndi=jnp.full_like(inter.ndo, 0.5))
    diff_energy = jnp.clip(
        luminance(diffuse_energy_conservation(mat, fake)), 0.0, 1.0)
    return diff_energy


def pdf_direction(mat: MaterialInstance, inter: SurfaceInteraction,
                  model: str = "trowbridge_reitz"):
    """ProbabilityDensityDirection (Microfacet.glsl:163-170): lobe-mixture pdf."""
    diffuse_pmf = calc_diffuse_pmf(mat, inter)
    specular_pmf = 1.0 - diffuse_pmf
    return (diffuse_pmf * pdf_cosine_hemisphere(inter.ndi)
            + specular_pmf * pdf_microfacet(mat, inter, model))


def generate_importance_sample(
        mat: MaterialInstance, inter: SurfaceInteraction,
        u_choice, u_sample, model: str = "trowbridge_reitz",
) -> Tuple[SurfaceInteraction, jnp.ndarray, jnp.ndarray]:
    """GenerateImportanceSample (Microfacet.glsl:172-193), vectorized.

    Picks the diffuse lobe with probability CalcDiffusePmf, else samples the
    microfacet distribution and reflects. Returns (interaction-with-incoming,
    pdf_sample, pdf_mis): the chosen lobe's weighted pdf and the other
    lobe's, both evaluated at the final direction.
    """
    diffuse_pmf = calc_diffuse_pmf(mat, inter)
    pick_diffuse = u_choice < diffuse_pmf

    dir_diffuse = to_world(inter, sample_cosine_hemisphere(u_sample))
    m = to_world(inter, sample_microfacet(mat, u_sample, model))
    # reflect(-outgoing, m) (Material.glsl:124)
    dir_specular = (2.0 * jnp.sum(inter.outgoing * m, axis=-1, keepdims=True)
                    * m - inter.outgoing)

    incoming = jnp.where(pick_diffuse[..., None], dir_diffuse, dir_specular)
    inter = set_incoming(inter, incoming)

    specular_pmf = 1.0 - diffuse_pmf
    pdf_diffuse = diffuse_pmf * pdf_cosine_hemisphere(inter.ndi)
    pdf_specular = specular_pmf * pdf_microfacet(mat, inter, model)
    pdf_sample = jnp.where(pick_diffuse, pdf_diffuse, pdf_specular)
    pdf_mis = jnp.where(pick_diffuse, pdf_specular, pdf_diffuse)
    return inter, pdf_sample, pdf_mis
