"""Small vector-math helpers shared by the JAX compute path.

Role of the reference's src/math/ types and src/shaders/common/Util.glsl
(nndot/avdot/luminance). Everything operates on [..., 3] arrays so the same
code vectorizes over any wavefront shape.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def nndot(a, b, keepdims: bool = False):
    """Non-negative dot (Util.glsl `nndot`)."""
    return jnp.maximum(dot(a, b, keepdims), 0.0)


def avdot(a, b, keepdims: bool = False):
    """Absolute-value dot (Util.glsl `avdot`)."""
    return jnp.abs(dot(a, b, keepdims))


def cross(a, b):
    return jnp.cross(a, b)


def length(a, keepdims: bool = False):
    return jnp.sqrt(jnp.maximum(dot(a, a, keepdims), 0.0))


def normalize(a, eps: float = 1e-20):
    return a / jnp.maximum(length(a, keepdims=True), eps)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i, keepdims=True) * n


def luminance(c):
    """Average luminance (Util.glsl AverageLuminance uses the mean of RGB)."""
    return jnp.mean(c, axis=-1)


def mix(a, b, t):
    return a * (1.0 - t) + b * t


def construct_tbn(n):
    """Orthonormal tangent frame from a normal (Material.glsl:71-76).

    Returns (tangent, bitangent, normal), each [..., 3]. Matches the
    reference: helper axis = +X when |n.y| > 0.99 else +Y.
    """
    use_x = jnp.abs(n[..., 1:2]) > 0.99
    helper = jnp.where(use_x,
                       jnp.array([1.0, 0.0, 0.0], n.dtype),
                       jnp.array([0.0, 1.0, 0.0], n.dtype))
    t = normalize(jnp.cross(helper, n))
    b = jnp.cross(t, n)
    return t, b, n


def tbn_transform(t, b, n, v):
    """Local-to-world: tbn @ v where columns are (t, b, n)."""
    return (t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3])
