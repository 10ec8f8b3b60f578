"""Interactive terminal viewer — the live-camera loop.

Role of the reference's GLFW window + WASD camera (src/Program.cpp:103-146):
a TPU host has no display, so frames are presented as ANSI truecolor
half-blocks in the terminal (two pixels per character cell) and the camera
is driven with WASD/arrow keys read raw from stdin. Camera movement resets
accumulation exactly like Program.cpp:115-120; standing still accumulates
progressively.

Keys: w/s forward/back, a/d strafe, r/f up/down, arrows (or hjkl) turn,
space reset accumulation, q quit.
"""

from __future__ import annotations

import dataclasses
import math
import select
import sys
import time


def _read_keys(timeout: float) -> str:
    """Drain pending keypresses (raw mode), waiting up to `timeout`."""
    keys = ""
    end = time.time() + timeout
    while True:
        remain = max(end - time.time(), 0.0)
        ready, _, _ = select.select([sys.stdin], [], [], remain)
        if not ready:
            break
        keys += sys.stdin.read(1)
        end = time.time()  # got one; only drain what's already buffered
    return keys


def _ansi_frame(img) -> str:
    """[H, W, 3] float in [0,1] -> ANSI truecolor half-block string.
    Row 0 is the bottom scanline (GL convention), so draw top-down."""
    import numpy as np
    rgb = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)[::-1]
    h = rgb.shape[0] // 2 * 2
    lines = []
    for y in range(0, h, 2):
        top, bot = rgb[y], rgb[y + 1]
        line = []
        for x in range(rgb.shape[1]):
            tr, tg, tb = top[x]
            br, bg, bb = bot[x]
            line.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                        f"\x1b[48;2;{br};{bg};{bb}m▀")
        lines.append("".join(line) + "\x1b[0m")
    return "\n".join(lines)


def run_viewer(renderer, move_speed: float = 1.0,
               turn_speed: float = 0.08, max_fps: float = 30.0) -> None:
    """Progressive interactive loop on an existing Renderer.

    The camera basis matches the reference's yaw/pitch forward vector
    (Camera.cpp; note gen_rays negates the stored direction, so "forward"
    here is -dir)."""
    import termios
    import tty

    cam = renderer.cfg.camera
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    sys.stdout.write("\x1b[2J")  # clear
    try:
        while True:
            renderer.render_frame()
            img = renderer.present()
            sys.stdout.write("\x1b[H" + _ansi_frame(img))
            sys.stdout.write(
                f"\x1b[0m\n[{renderer.num_samples:4d} spp] "
                f"pos=({cam.position[0]:.1f},{cam.position[1]:.1f},"
                f"{cam.position[2]:.1f}) yaw={cam.yaw:.2f} "
                f"pitch={cam.pitch:.2f} | wasd/rf move, arrows turn, "
                f"space reset, q quit\n")
            sys.stdout.flush()

            keys = _read_keys(1.0 / max_fps)
            if not keys:
                continue
            if "q" in keys or "\x03" in keys:
                break

            # Forward vector (the camera LOOKS along -dir; see gen_rays).
            fx = -math.cos(cam.pitch) * math.sin(cam.yaw)
            fy = -math.sin(cam.pitch)
            fz = -math.cos(cam.pitch) * math.cos(cam.yaw)
            rx, rz = -fz, fx  # right = forward x up (y-up)
            px, py, pz = cam.position
            yaw, pitch = cam.yaw, cam.pitch
            moved = False
            for k in keys.replace("\x1b[A", "k").replace("\x1b[B", "j") \
                         .replace("\x1b[C", "l").replace("\x1b[D", "h"):
                m = move_speed
                if k == "w":
                    px, py, pz = px + fx * m, py + fy * m, pz + fz * m
                elif k == "s":
                    px, py, pz = px - fx * m, py - fy * m, pz - fz * m
                elif k == "a":
                    px, pz = px - rx * m, pz - rz * m
                elif k == "d":
                    px, pz = px + rx * m, pz + rz * m
                elif k == "r":
                    py += m
                elif k == "f":
                    py -= m
                elif k == "h":
                    yaw -= turn_speed
                elif k == "l":
                    yaw += turn_speed
                elif k == "k":
                    pitch = min(pitch + turn_speed, 1.5)
                elif k == "j":
                    pitch = max(pitch - turn_speed, -1.5)
                elif k == " ":
                    renderer.reset_samples()
                    continue
                else:
                    continue
                moved = True
            if moved:
                cam = dataclasses.replace(cam, position=(px, py, pz),
                                          yaw=yaw, pitch=pitch)
                renderer.set_camera(cam)  # resets accumulation
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stdout.write("\x1b[0m\n")
