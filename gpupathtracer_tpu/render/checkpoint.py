"""Checkpoint / resume for progressive renders.

The reference's nearest mechanism is its progressive accumulation state
(`accum` image + `numSamples`, Renderer.h:34,51) which is only resettable,
never persisted (SURVEY.md §5). Here long renders are resumable: the
accumulation buffer, sample count, RNG base seed, and the render config are
written to one .npz; resuming continues the exact threefry sample stream, so
a checkpointed-and-resumed render is bitwise identical to an uninterrupted
one (tested).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np


def save_checkpoint(renderer, path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # Write through a handle: np.savez_compressed(path) silently appends
    # ".npz" to extension-less paths, breaking resume-by-the-same-name.
    with open(path, "wb") as f:
        np.savez_compressed(
            f,
            accum=np.asarray(renderer.accum),
            num_samples=np.int64(renderer.num_samples),
            seed=np.int64(renderer.cfg.seed),
            config=np.frombuffer(renderer.cfg.to_json().encode(), np.uint8),
        )
    return path


def load_checkpoint(path: str):
    """Returns a Renderer resumed from the checkpoint (scene reloaded/rebuilt
    from the stored config; BVH comes from the scene cache when enabled)."""
    from gpupathtracer_tpu.config import RenderConfig
    from gpupathtracer_tpu.render.renderer import Renderer

    with np.load(path) as z:
        cfg = RenderConfig.from_json(bytes(z["config"]).decode())
        accum = z["accum"]
        num_samples = int(z["num_samples"])
        seed = int(z["seed"])
    cfg.seed = seed
    r = Renderer(cfg)
    if accum.shape != r.accum.shape:
        raise ValueError(f"checkpoint film {accum.shape} != {r.accum.shape}")
    r.accum = jnp.asarray(accum)
    r.num_samples = num_samples
    return r
