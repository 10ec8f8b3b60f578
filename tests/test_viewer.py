"""Terminal viewer presenter (render/viewer.py): frame-to-ANSI conversion.

The interactive loop itself needs a tty; the presenter (the part that maps
the film to half-block truecolor lines, the role of the reference's
Present pass through a GLFW window) is pure and testable."""

import numpy as np

from gpupathtracer_tpu.render.viewer import _ansi_frame


def test_ansi_frame_geometry_and_colors():
    img = np.zeros((4, 3, 3), np.float32)
    img[3, 0] = (1.0, 0.0, 0.0)   # top-left scanline (row 0 = bottom)
    img[0, 2] = (0.0, 0.0, 1.0)   # bottom-right
    s = _ansi_frame(img)
    lines = s.split("\n")
    assert len(lines) == 2                      # 4 rows -> 2 half-block rows
    # Zero-padded SGR params (fixed-width vectorized encoder) are
    # equivalent escape codes.
    assert lines[0].startswith("\x1b[38;2;255;000;000m")  # red drawn first
    assert "\x1b[48;2;000;000;255m" in lines[1]           # blue in last line
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert lines[0].count("▀") == 3             # one glyph per column


def test_ansi_frame_clips_and_handles_odd_height():
    img = np.full((5, 2, 3), 2.0, np.float32)   # >1 clips to 255; odd H
    s = _ansi_frame(img)
    assert s.count("\n") == 1                   # 5 rows -> 2 rows used
    assert "255;255;255" in s
    img2 = np.full((2, 2, 3), -1.0, np.float32)
    assert "000;000;000" in _ansi_frame(img2)


def test_ansi_frame_decodes_back_to_the_image():
    """Parse every cell's fg/bg SGR back out and compare against the
    quantized source — the encoder must be a lossless presenter."""
    import re
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 1, (6, 5, 3)).astype(np.float32)
    expect = (np.clip(img, 0, 1) * 255).astype(np.uint8)[::-1]
    cell = re.compile(r"\x1b\[38;2;(\d{3});(\d{3});(\d{3})m"
                      r"\x1b\[48;2;(\d{3});(\d{3});(\d{3})m▀")
    for r, line in enumerate(_ansi_frame(img).split("\n")):
        cells = cell.findall(line)
        assert len(cells) == 5
        for x, c in enumerate(cells):
            np.testing.assert_array_equal(
                np.asarray(c[:3], np.int32), expect[2 * r, x])
            np.testing.assert_array_equal(
                np.asarray(c[3:], np.int32), expect[2 * r + 1, x])


def test_apply_keys_movement_and_reset():
    import math

    from gpupathtracer_tpu.config import CameraConfig
    from gpupathtracer_tpu.render.viewer import _apply_keys

    cam = CameraConfig(position=(0.0, 0.0, 0.0), yaw=math.pi, pitch=0.0)
    # yaw=pi looks +z (forward = -dir); 'w' must advance +z.
    c2, moved, reset = _apply_keys(cam, "w", 2.0, 0.1)
    assert moved and not reset
    assert abs(c2.position[2] - 2.0) < 1e-6 and abs(c2.position[0]) < 1e-6
    # Strafe right ('d') at yaw=pi is -x; 'r' is straight up.
    c3, _, _ = _apply_keys(c2, "dr", 1.0, 0.1)
    assert abs(c3.position[0] + 1.0) < 1e-6 and abs(c3.position[1] - 1.0) < 1e-6
    # Arrow-up turns pitch (clamped), space only resets.
    c4, moved, reset = _apply_keys(c3, "\x1b[A ", 1.0, 0.1)
    assert moved and reset and abs(c4.pitch - 0.1) < 1e-9
    c5, moved, reset = _apply_keys(c4, " ", 1.0, 0.1)
    assert (not moved) and reset and c5.position == c4.position


def test_apply_keys_forward_matches_camera_ray():
    """'w' must move the camera along the center-pixel primary-ray
    direction at ANY yaw/pitch — yaw=0/pi have sin(yaw)=0 and cannot
    see a sign error in the x/y components (the sponza default camera
    is yaw=pi/2, where the old basis walked backward)."""
    import math

    import jax.numpy as jnp

    from gpupathtracer_tpu.config import CameraConfig
    from gpupathtracer_tpu.math.camera import gen_rays, generate_image_plane
    from gpupathtracer_tpu.render.viewer import _apply_keys

    for yaw, pitch in [(math.pi / 2, -0.05), (0.7, 0.4), (-1.2, -0.3)]:
        cam = CameraConfig(position=(1.0, 2.0, 3.0), yaw=yaw, pitch=pitch,
                           aperture=0.0)
        _, d = gen_rays(generate_image_plane(cam),
                        jnp.array([[0.5, 0.5]]), jnp.array([[0.0, 0.0]]))
        c2, _, _ = _apply_keys(cam, "w", 1.0, 0.1)
        step = np.asarray(c2.position) - np.asarray(cam.position)
        np.testing.assert_allclose(step / np.linalg.norm(step),
                                   np.asarray(d[0]), atol=1e-6)
