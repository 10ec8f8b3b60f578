"""Thin-lens camera: image-plane generation and vectorized ray generation.

Semantics match the reference exactly (src/math/Camera.cpp:6-22 image plane,
Camera.cpp:58-69 lens ray with depth of field; note the GPU InitRay in
Iterative.comp:189-196 has a disk-sampling slip — we follow the correct CPU
version, sampling the lens disk with r = sqrt(u1)).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.config import CameraConfig
from gpupathtracer_tpu.math.vecmath import normalize


class CameraParams(NamedTuple):
    """Precomputed image-plane basis, uploaded per frame (cf. Shader::LoadCamera)."""

    position: jnp.ndarray      # [3]
    lower_left: jnp.ndarray    # [3]
    horizontal: jnp.ndarray    # [3]
    vertical: jnp.ndarray      # [3]
    u: jnp.ndarray             # [3] right basis
    v: jnp.ndarray             # [3] up basis
    lens_radius: jnp.ndarray   # scalar


def generate_image_plane(cfg: CameraConfig) -> CameraParams:
    """Build the camera basis from pitch/yaw (Camera.cpp:6-22)."""
    pitch, yaw = cfg.pitch, cfg.yaw
    d = np.array([
        np.cos(pitch) * np.sin(yaw),
        np.sin(pitch),
        np.cos(pitch) * -np.cos(yaw),
    ], dtype=np.float64)
    direction = -d / np.linalg.norm(d)

    image_height = 2.0 * np.tan(cfg.fov / 2.0)
    image_width = cfg.aspect * image_height

    up = np.array([0.0, 1.0, 0.0])
    u = np.cross(up, direction)
    u = u / np.linalg.norm(u)
    v = np.cross(direction, u)

    horizontal = image_width * u * cfg.focal_distance
    vertical = image_height * v * cfg.focal_distance
    lower_left = -horizontal / 2.0 - vertical / 2.0 - direction * cfg.focal_distance

    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
    return CameraParams(
        position=f32(cfg.position),
        lower_left=f32(lower_left),
        horizontal=f32(horizontal),
        vertical=f32(vertical),
        u=f32(u),
        v=f32(v),
        lens_radius=f32(cfg.lens_radius),
    )


def gen_rays(cam: CameraParams,
             interp: jnp.ndarray,
             lens_u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate thin-lens primary rays.

    Args:
      cam: camera params.
      interp: [N, 2] image-plane interpolation in [0,1)^2 ((pixel+jitter)/WH).
      lens_u: [N, 2] uniform randoms for the lens disk.

    Returns (origins [N,3], directions [N,3]); matches Camera::GenRay
    (Camera.cpp:58-69): phi = 2*pi*u0, r = sqrt(u1), offset = u*rd.x + v*rd.y,
    dir = normalize(lower_left + s*horizontal + t*vertical - offset).
    """
    phi = 2.0 * jnp.pi * lens_u[..., 0]
    r = jnp.sqrt(lens_u[..., 1])
    rd = cam.lens_radius * r
    offset = (cam.u[None, :] * (rd * jnp.cos(phi))[..., None]
              + cam.v[None, :] * (rd * jnp.sin(phi))[..., None])
    origin = cam.position[None, :] + offset
    target = (cam.lower_left[None, :]
              + interp[..., 0:1] * cam.horizontal[None, :]
              + interp[..., 1:2] * cam.vertical[None, :])
    direction = normalize(target - offset)
    return origin, direction
