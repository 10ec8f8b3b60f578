import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpupathtracer_tpu.models.interaction import make_interaction, set_incoming
from gpupathtracer_tpu.models.materials import MaterialInstance
from gpupathtracer_tpu.models.microfacet import (generate_importance_sample,
                                                 pdf_direction)
from gpupathtracer_tpu.models.bsdf import compute_bsdf


def make_mat(n, albedo=(0.8, 0.8, 0.8), rough=0.5, metallic=0.0):
    albedo = jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3))
    rough = jnp.full((n,), rough, jnp.float32)
    metallic = jnp.full((n,), metallic, jnp.float32)
    refl = 0.04 * (1 - metallic[:, None]) + albedo * metallic[:, None]
    return MaterialInstance(albedo=albedo, roughness=rough,
                            roughness2=rough * rough, metallic=metallic,
                            reflectance=refl, emission=jnp.zeros((n, 3)))


def hemisphere_grid(n_theta=64, n_phi=128):
    """Quadrature nodes + weights over the +z hemisphere."""
    theta = (np.arange(n_theta) + 0.5) / n_theta * (np.pi / 2)
    phi = (np.arange(n_phi) + 0.5) / n_phi * (2 * np.pi)
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    dirs = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                     np.cos(tt)], axis=-1).reshape(-1, 3)
    w = (np.sin(tt) * (np.pi / 2 / n_theta) * (2 * np.pi / n_phi)).reshape(-1)
    return jnp.asarray(dirs, jnp.float32), jnp.asarray(w, jnp.float32)


@pytest.mark.parametrize("model", ["trowbridge_reitz", "beckmann"])
@pytest.mark.parametrize("rough,metallic", [(0.9, 0.0), (0.3, 0.0), (0.2, 1.0)])
def test_pdf_direction_integrates_to_one(model, rough, metallic):
    dirs, w = hemisphere_grid()
    n = dirs.shape[0]
    mat = make_mat(n, rough=rough, metallic=metallic)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    outgoing = jnp.broadcast_to(
        jnp.asarray([np.sin(0.5), 0.0, np.cos(0.5)], np.float32), (n, 3))
    inter = set_incoming(make_interaction(normal, outgoing), dirs)
    pdf = pdf_direction(mat, inter, model)
    total = float(jnp.sum(pdf * w))
    # The pdf is a mixture of cosine (integrates to 1) and the half-vector
    # pdf (integrates to 1 over reflected dirs); allow quadrature slack.
    assert 0.9 < total < 1.1, total


@pytest.mark.parametrize("model", ["trowbridge_reitz", "beckmann"])
def test_sampler_pdf_consistency(model):
    """E[cos(wi)/pdf(wi)] over sampler draws must equal the hemisphere
    integral of cos = pi. Jointly validates sampler + pdf."""
    n = 1 << 17
    key = jax.random.PRNGKey(7)
    mat = make_mat(n, rough=0.6, metallic=0.0)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    outgoing = jnp.broadcast_to(
        jnp.asarray([np.sin(0.4), 0.0, np.cos(0.4)], np.float32), (n, 3))
    inter = make_interaction(normal, outgoing)
    k1, k2 = jax.random.split(key)
    u_choice = jax.random.uniform(k1, (n,))
    u_sample = jax.random.uniform(k2, (n, 2))
    inter_s, pdf_sample, pdf_mis = generate_importance_sample(
        mat, inter, u_choice, u_sample, model)
    total_pdf = pdf_sample + pdf_mis  # mixture pdf of the chosen direction
    est = jnp.where(inter_s.ndi > 0, inter_s.ndi / total_pdf, 0.0)
    val = float(jnp.mean(est))
    assert abs(val - np.pi) / np.pi < 0.05, val


def test_bsdf_reciprocity_shape():
    n = 8
    mat = make_mat(n, rough=0.4)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    o = jnp.broadcast_to(jnp.asarray([0.3, 0.1, 0.94], jnp.float32), (n, 3))
    o = o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    i = jnp.broadcast_to(jnp.asarray([-0.2, 0.4, 0.89], jnp.float32), (n, 3))
    i = i / jnp.linalg.norm(i, axis=-1, keepdims=True)
    f_oi = compute_bsdf(mat, set_incoming(make_interaction(normal, o), i))
    f_io = compute_bsdf(mat, set_incoming(make_interaction(normal, i), o))
    np.testing.assert_allclose(np.asarray(f_oi), np.asarray(f_io),
                               rtol=1e-4, atol=1e-6)


def test_bsdf_zero_below_hemisphere():
    n = 4
    mat = make_mat(n)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    below = jnp.broadcast_to(jnp.asarray([0.0, 0.3, -0.95], jnp.float32), (n, 3))
    below = below / jnp.linalg.norm(below, axis=-1, keepdims=True)
    f = compute_bsdf(mat, set_incoming(make_interaction(normal, o), below))
    np.testing.assert_array_equal(np.asarray(f), 0.0)
