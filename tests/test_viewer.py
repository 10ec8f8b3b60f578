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
    assert lines[0].startswith("\x1b[38;2;255;0;0m")   # red drawn first
    assert "\x1b[48;2;0;0;255m" in lines[1]            # blue in last line
    assert all(line.endswith("\x1b[0m") for line in lines)
    assert lines[0].count("▀") == 3             # one glyph per column


def test_ansi_frame_clips_and_handles_odd_height():
    img = np.full((5, 2, 3), 2.0, np.float32)   # >1 clips to 255; odd H
    s = _ansi_frame(img)
    assert s.count("\n") == 1                   # 5 rows -> 2 rows used
    assert "255;255;255" in s
    img2 = np.full((2, 2, 3), -1.0, np.float32)
    assert "0;0;0" in _ansi_frame(img2)
