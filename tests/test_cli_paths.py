"""CLI surface coverage: orbit turntable, save-every, checkpoint flags.

These drive cli.main() itself (argument parsing through file output), the
role the reference exercises by hand through its window loop
(Program.cpp:103-150)."""

import os

import numpy as np

from gpupathtracer_tpu.cli import main


def _png_ok(path):
    assert os.path.exists(path)
    from gpupathtracer_tpu.utils.io import load_image
    img = load_image(path)
    assert np.isfinite(img).all()
    return img


def test_cli_orbit_turntable(tmp_path):
    out = str(tmp_path / "orb.png")
    rc = main(["proc:cornell", "--spp", "1", "--width", "16", "--height",
               "16", "--skybox", "GENERATE COLOR BLACK", "--max-bounces",
               "2", "--chunk", "256", "--orbit", "2", "--out", out])
    assert rc == 0
    a = _png_ok(str(tmp_path / "orb-000.png"))
    b = _png_ok(str(tmp_path / "orb-001.png"))
    assert not np.array_equal(a, b)  # camera moved between frames


def test_cli_save_every_and_checkpoint(tmp_path):
    out = str(tmp_path / "prog.png")
    ckpt = str(tmp_path / "state.ckpt")
    rc = main(["proc:cornell", "--spp", "2", "--width", "16", "--height",
               "16", "--skybox", "GENERATE COLOR BLACK", "--max-bounces",
               "2", "--chunk", "256", "--save-every", "1", "--out", out,
               "--checkpoint", ckpt])
    assert rc == 0
    _png_ok(out)
    assert os.path.exists(ckpt)

    # Resume adds samples on top of the checkpoint.
    rc = main(["proc:cornell", "--spp", "1", "--width", "16", "--height",
               "16", "--skybox", "GENERATE COLOR BLACK", "--max-bounces",
               "2", "--chunk", "256", "--resume", ckpt, "--out", out])
    assert rc == 0
    _png_ok(out)
