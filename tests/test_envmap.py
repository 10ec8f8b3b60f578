import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.ops.tonemap import present, tonemap_uncharted2
from gpupathtracer_tpu.scene.envmap import (EnvMap, from_color, from_equirect,
                                            load_environment, sample_env)


def test_constant_env():
    env = from_color((0.2, 0.4, 0.8))
    d = jnp.asarray([[0, 1, 0], [1, 0, 0], [0, -1, 0], [0.5, 0.5, 0.7071]],
                    jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sample_env(env, d))
    np.testing.assert_allclose(out, np.broadcast_to([0.2, 0.4, 0.8], (4, 3)),
                               atol=1e-6)


def test_equirect_poles_and_equator():
    h, w = 64, 128
    img = np.zeros((h, w, 3), np.float32)
    img[-1, :] = [1, 0, 0]        # top rows (v=1) = +y pole
    img[0, :] = [0, 1, 0]         # bottom rows (v=0) = -y pole
    img[h // 2 - 1:h // 2 + 1, :] = [0, 0, 1]  # equator straddles two texel rows
    env = from_equirect(img)
    up = np.asarray(sample_env(env, jnp.asarray([[0.0, 1.0, 0.0]])))
    down = np.asarray(sample_env(env, jnp.asarray([[0.0, -1.0, 0.0]])))
    side = np.asarray(sample_env(env, jnp.asarray([[1.0, 0.0, 0.0]])))
    assert up[0, 0] > 0.5 and down[0, 1] > 0.5 and side[0, 2] > 0.5


def test_generate_spec_grammar(tmp_path):
    assert float(load_environment("GENERATE COLOR WHITE").image.max()) == 1.0
    assert float(load_environment("GENERATE COLOR BLACK").image.max()) == 0.0
    # Unknown color -> red error color, like Renderer.cpp:250-252.
    err = load_environment("GENERATE COLOR CHARTREUSE")
    assert float(err.image[0, 0, 0]) == 1.0 and float(err.image[0, 0, 1]) == 0.0


def test_tonemap_properties():
    x = jnp.asarray([0.0, 0.18, 1.0, 11.2, 100.0])
    y = np.asarray(tonemap_uncharted2(x))
    assert (np.diff(y) > 0).all()          # monotonic
    assert y[0] >= -1e-6 and y[-1] <= 1.5  # bounded-ish
    img = jnp.ones((4, 4, 3)) * 8.0        # accum of 4 samples of 2.0
    out = np.asarray(present(img, 4, exposure=1.0))
    assert out.shape == (4, 4, 3)
    assert (out >= 0).all() and (out <= 1).all()
