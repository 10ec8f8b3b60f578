"""Sampling warps used across the integrators.

Counter-based threefry RNG (jax.random) replaces the reference's stateful
per-pixel HybridTaus SSBO (src/shaders/common/Random.glsl:34-75): renders are
bitwise-reproducible given (seed, sample index).

Warps mirror the reference formulas:
  - cosine hemisphere: Microfacet.glsl:148-154
  - uniform hemisphere: Renderer.cpp:1040-1043 (CPU reference integrator)
  - concentric-free disk: Camera.cpp:58-62
  - uniform triangle (sqrt warp): Iterative.comp:66-77
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def sample_disk(u):
    """[..., 2] uniforms -> [..., 2] point on the unit disk (polar warp)."""
    phi = TWO_PI * u[..., 0]
    r = jnp.sqrt(u[..., 1])
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def sample_cosine_hemisphere(u):
    """[..., 2] uniforms -> [..., 3] cosine-weighted dir in local (+z up) frame.

    Matches ImportanceSampleCosine (Microfacet.glsl:148-154):
    radius = sqrt(u0), phi = 2*pi*u1, z = sqrt(1-u0); xy = radius*(sin, cos).
    """
    r0, r1 = u[..., 0], u[..., 1]
    radius = jnp.sqrt(r0)
    phi = TWO_PI * r1
    z = jnp.sqrt(jnp.maximum(1.0 - r0, 0.0))
    return jnp.stack([radius * jnp.sin(phi), radius * jnp.cos(phi), z], axis=-1)


def pdf_cosine_hemisphere(ndi):
    return ndi / jnp.pi


def sample_uniform_hemisphere(u):
    """[..., 2] -> [..., 3] uniform hemisphere (+z up). pdf = 1/(2*pi)."""
    r0, r1 = u[..., 0], u[..., 1]
    z = r0
    radius = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = TWO_PI * r1
    return jnp.stack([radius * jnp.cos(phi), radius * jnp.sin(phi), z], axis=-1)


def sample_triangle_barycentrics(u):
    """[..., 2] -> barycentric weights (u, v, t) via the sqrt warp.

    Matches Iterative.comp:66-77 / pharr's 2019 note: sr = sqrt(r0);
    u = 1-sr; v = r1*sr; t = 1-u-v.
    """
    sr = jnp.sqrt(u[..., 0])
    bu = 1.0 - sr
    bv = u[..., 1] * sr
    bt = 1.0 - bu - bv
    return bu, bv, bt


# --- Low-discrepancy machinery (role of Renderer.cpp:784-887 experiments) ---

GOLDEN_RATIO_CONJUGATE = 0.6180339887498949


def golden_ratio_sequence(n: int, offset: float = 0.0):
    """1D golden-ratio additive sequence (Renderer.cpp:784-812)."""
    i = jnp.arange(n, dtype=jnp.float64) if False else jnp.arange(n, dtype=jnp.float32)
    return jnp.mod(offset + (i + 1) * GOLDEN_RATIO_CONJUGATE, 1.0)


def r2_sequence(sample_idx):
    """2D R2 additive low-discrepancy point for one sample index.

    The generalized-golden-ratio sequence (Roberts 2018): the 2D analogue
    of the reference's 1D golden-ratio experiments (Renderer.cpp:784-812).
    Computed as a 32-bit integer additive recurrence (alphas scaled by
    2^32; the natural uint32 wrap IS the mod): float32 multiply-mod loses
    the fractional part past ~10^4 samples (24-bit mantissa), integers
    never do. The uint32 is truncated to its top 24 bits before the float
    conversion — values >= 2^32-128 would otherwise round UP to exactly
    1.0, violating the [0,1) contract (24-bit ints are exact in float32).
    Returns [2] in [0,1)."""
    a = jnp.asarray([3242174889, 2447445413], jnp.uint32)  # 2^32/g, 2^32/g^2
    s = sample_idx.astype(jnp.uint32) + jnp.uint32(1)
    return ((s * a) >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def pixel_rotation(pixel_ids):
    """Per-pixel Cranley-Patterson rotation [..., 2] from an integer hash.

    Decorrelates the shared LD sequence across pixels (lowbias32-style
    integer hash; cheap enough to run full-width every sample)."""
    x = pixel_ids.astype(jnp.uint32)

    def h(v):
        v = v ^ (v >> 16)
        v = v * jnp.uint32(0x7FEB352D)
        v = v ^ (v >> 15)
        v = v * jnp.uint32(0x846CA68B)
        return v ^ (v >> 16)

    h1 = h(x)
    h2 = h(x ^ jnp.uint32(0x9E3779B9))
    # Top 24 bits only: exact in float32, guarantees [0,1) (see r2_sequence).
    scale = jnp.float32(1.0 / 16777216.0)
    return jnp.stack([(h1 >> 8).astype(jnp.float32) * scale,
                      (h2 >> 8).astype(jnp.float32) * scale], axis=-1)


def van_der_corput(i, base: int = 2, bits: int = 24):
    """Radical inverse of integer array `i` in `base` (Renderer.cpp:848-871)."""
    i = jnp.asarray(i, jnp.uint32)
    result = jnp.zeros(i.shape, jnp.float32)
    inv_base = 1.0 / base
    digit_scale = inv_base
    for _ in range(bits):
        digit = (i % base).astype(jnp.float32)
        result = result + digit * digit_scale
        i = i // base
        digit_scale = digit_scale * inv_base
    return result
