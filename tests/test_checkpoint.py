import math

import numpy as np

from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.render import Renderer
from gpupathtracer_tpu.render.checkpoint import load_checkpoint, save_checkpoint
import pytest

pytestmark = pytest.mark.slow  # render/traversal jits dominate; quick tier = -m 'not slow'


def cfg():
    c = RenderConfig(scene_path="proc:cornell", skybox="GENERATE COLOR BLACK",
                     width=16, height=16, ray_chunk=256, max_bounces=4)
    c.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                            fov=math.radians(45), aspect=1.0)
    return c


def test_checkpoint_resume_bitwise(tmp_path):
    """Checkpoint + resume produces a bitwise-identical render to an
    uninterrupted run (counter-based RNG makes this possible; the reference's
    stateful HybridTaus could not)."""
    r1 = Renderer(cfg())
    for _ in range(4):
        r1.render_frame()
    full = np.asarray(r1.accum).copy()

    r2 = Renderer(cfg(), scene=r1.scene, meta=r1.meta)
    for _ in range(2):
        r2.render_frame()
    ckpt = save_checkpoint(r2, str(tmp_path / "render.ckpt.npz"))

    r3 = load_checkpoint(ckpt)
    assert r3.num_samples == 2
    for _ in range(2):
        r3.render_frame()
    resumed = np.asarray(r3.accum)
    np.testing.assert_array_equal(resumed, full)


def test_debug_trails(tmp_path):
    import jax.numpy as jnp
    from gpupathtracer_tpu.ops.debug import closest_hit_trail, dump_trails
    r = Renderer(cfg())
    n = 64
    o = jnp.tile(jnp.asarray([[2.75, 2.75, -7.0]]), (n, 1))
    import numpy as np
    rng = np.random.RandomState(0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2])  # towards the box
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    trail = closest_hit_trail(r.scene.bvh, r.scene.tri_geom, jnp.asarray(o),
                              jnp.asarray(d), jnp.full((n,), 1e20),
                              stack_depth=r.meta.stack_depth)
    pops = np.asarray(trail.pops)
    assert (pops > 0).all()
    assert (np.asarray(trail.leaf_tests)[np.asarray(trail.prim) >= 0] > 0).all()
    p = dump_trails(trail, str(tmp_path / "trails.bin"))
    raw = np.fromfile(p, np.int32).reshape(n, 3)
    np.testing.assert_array_equal(raw[:, 0], pops)
