import math

import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.config import CameraConfig
from gpupathtracer_tpu.math.camera import gen_rays, generate_image_plane


def test_default_camera_looks_down_negative_yaw_zero():
    # pitch=yaw=0: direction = -normalize([0,0,-1]) = +z?? Follow the math:
    # d = [cos0*sin0, sin0, cos0*-cos0] = [0,0,-1]; direction = -d = [0,0,1].
    cfg = CameraConfig(fov=math.radians(90.0), aspect=1.0, focal_distance=1.0)
    cam = generate_image_plane(cfg)
    # Center ray must go along -direction... check: lower_left + 0.5h + 0.5v
    # = -direction*focal => center dir = -[0,0,1] = [0,0,-1].
    interp = jnp.array([[0.5, 0.5]])
    o, d = gen_rays(cam, interp, jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(d[0]), [0.0, 0.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(o[0]), [0.0, 0.0, 0.0], atol=1e-6)


def test_fov_edges():
    # 90 deg vertical fov, aspect 1: the top-center ray hits y = +1 at z = -1.
    cfg = CameraConfig(fov=math.radians(90.0), aspect=1.0, focal_distance=1.0)
    cam = generate_image_plane(cfg)
    o, d = gen_rays(cam, jnp.array([[0.5, 1.0]]), jnp.zeros((1, 2)))
    dn = np.asarray(d[0])
    dn = dn / np.abs(dn[2])
    np.testing.assert_allclose(dn, [0.0, 1.0, -1.0], atol=1e-5)


def test_yaw_rotation():
    cfg = CameraConfig(fov=math.radians(90.0), aspect=1.0, yaw=math.pi / 2)
    cam = generate_image_plane(cfg)
    o, d = gen_rays(cam, jnp.array([[0.5, 0.5]]), jnp.zeros((1, 2)))
    # yaw=pi/2: d = [cos0*sin(pi/2),0,-0] = [1,0,0]; direction=-d=[-1,0,0];
    # center ray = -direction = [1,0,0].
    np.testing.assert_allclose(np.asarray(d[0]), [1.0, 0.0, 0.0], atol=1e-6)


def test_dof_rays_converge_at_focal_plane():
    cfg = CameraConfig(fov=math.radians(45.0), aspect=1.0, focal_distance=5.0,
                       aperture=0.4)
    cam = generate_image_plane(cfg)
    interp = jnp.broadcast_to(jnp.array([[0.7, 0.3]]), (64, 2))
    lens = jnp.stack([jnp.linspace(0, 0.99, 64), jnp.linspace(0.01, 0.99, 64)],
                     axis=1)
    o, d = gen_rays(cam, interp, lens)
    # All rays through the same image point must intersect at the focal plane.
    # Solve for t where each ray reaches the focal-plane target point.
    target = (np.asarray(cam.lower_left) + 0.7 * np.asarray(cam.horizontal)
              + 0.3 * np.asarray(cam.vertical))
    on, dn = np.asarray(o), np.asarray(d)
    t = np.linalg.norm(target[None] - on, axis=1)
    pts = on + dn * t[:, None]
    assert np.ptp(pts, axis=0).max() < 1e-4
    # Lens origins actually spread.
    assert np.ptp(on, axis=0).max() > 0.05


def test_zero_aperture_single_origin():
    cfg = CameraConfig(aperture=0.0)
    cam = generate_image_plane(cfg)
    o, _ = gen_rays(cam, jnp.array([[0.1, 0.9], [0.9, 0.1]]),
                    jnp.array([[0.3, 0.8], [0.9, 0.2]]))
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-7)
