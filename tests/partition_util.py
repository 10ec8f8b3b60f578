"""Shared helpers for the partition test files (split from the original
test_partition.py monolith so no single file exceeds a CI window; the
scene/BVH disk cache makes the per-file bunny fixture cheap after the
first build)."""

import numpy as np

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY, decode_leaf_entry
from gpupathtracer_tpu.config import RenderConfig
from gpupathtracer_tpu.scene import load_scene


def load_bunny():
    cfg = RenderConfig(scene_path="proc:bunny",
                       skybox="GENERATE COLOR BLACK",
                       width=32, height=32, cache_enabled=True)
    return load_scene(cfg)


def leaf_rows_of(table, root_entry=0):
    """Reachable leaf rows (as (row, count) pairs) from a table's root."""
    entries = table[:, 48:56].copy().view(np.int32)
    out = set()
    stack = [root_entry]
    seen = set()
    while stack:
        e = stack.pop()
        if e < 0:
            out.add(decode_leaf_entry(e))
            continue
        if e in seen:
            continue
        seen.add(e)
        for j in range(8):
            c = int(entries[e, j])
            if c != INVALID_ENTRY:
                stack.append(c)
    return out


def random_rays(n, seed, act_thresh=0.1):
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    act = jnp.asarray(rng.rand(n) > act_thresh)
    return o, d, act
