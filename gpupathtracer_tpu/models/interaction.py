"""Surface interactions: the dot products every BSDF term needs.

Vectorized functional rebuild of SurfaceInteraction
(src/shaders/common/Material.glsl:57-130). All fields are [N]-shaped; the
tangent frame matches ConstructTBN (helper axis +X when |n.y| > 0.99).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gpupathtracer_tpu.math.vecmath import construct_tbn, nndot, normalize, reflect


class SurfaceInteraction(NamedTuple):
    normal: jnp.ndarray      # [N,3] geometric normal (MUST equal face normal)
    outgoing: jnp.ndarray    # [N,3] view vector
    incoming: jnp.ndarray    # [N,3] light vector
    microfacet: jnp.ndarray  # [N,3] half vector
    ndo: jnp.ndarray         # [N]
    ndi: jnp.ndarray
    ndm: jnp.ndarray
    ndm2: jnp.ndarray
    idm: jnp.ndarray
    tangent: jnp.ndarray     # [N,3] TBN columns
    bitangent: jnp.ndarray


def make_interaction(n, outgoing) -> SurfaceInteraction:
    """Partial constructor (Material.glsl:99-109): incoming not yet known."""
    t, b, nn = construct_tbn(n)
    z = jnp.zeros(n.shape[:-1], n.dtype)
    z3 = jnp.zeros_like(n)
    return SurfaceInteraction(
        normal=n, outgoing=outgoing, incoming=z3, microfacet=z3,
        ndo=nndot(n, outgoing), ndi=z, ndm=z, ndm2=z, idm=z,
        tangent=t, bitangent=b)


def set_incoming(inter: SurfaceInteraction, incoming) -> SurfaceInteraction:
    """SetIncomingDirection (Material.glsl:112-120): new light dir, new half
    vector, refreshed dots."""
    m = normalize(inter.outgoing + incoming)
    ndm = nndot(inter.normal, m)
    return inter._replace(
        incoming=incoming, microfacet=m,
        ndi=nndot(inter.normal, incoming),
        ndm=ndm, ndm2=ndm * ndm,
        idm=nndot(incoming, m))


def set_microfacet(inter: SurfaceInteraction, m) -> SurfaceInteraction:
    """SetMicrofacetDirection (Material.glsl:122-130): incoming by reflection."""
    incoming = reflect(-inter.outgoing, m)
    ndm = nndot(inter.normal, m)
    return inter._replace(
        incoming=incoming, microfacet=m,
        ndi=nndot(inter.normal, incoming),
        ndm=ndm, ndm2=ndm * ndm,
        idm=nndot(incoming, m))


def to_world(inter: SurfaceInteraction, local) -> jnp.ndarray:
    """TBN * local ([..., 3] in tangent space -> world)."""
    return (inter.tangent * local[..., 0:1]
            + inter.bitangent * local[..., 1:2]
            + inter.normal * local[..., 2:3])
