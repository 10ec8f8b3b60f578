import json
import math
import os

import numpy as np


def test_config_json_roundtrip():
    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    cfg = RenderConfig(scene_path="proc:table", skybox="GENERATE COLOR BLACK",
                       width=320, height=200, max_bounces=7,
                       microfacet="beckmann", sun_enabled=True,
                       sun_direction=(1.0, 2.0, 3.0), packet_size=256)
    cfg.camera = CameraConfig(position=(1, 2, 3), yaw=0.5, pitch=-0.2,
                              aperture=0.3)
    cfg2 = RenderConfig.from_json(cfg.to_json())
    assert cfg2 == cfg


def test_cli_end_to_end(tmp_path, capsys):
    """Drive the CLI main() in-process: proc scene, default camera, stats
    JSON, checkpoint, PNG output."""
    from gpupathtracer_tpu import cli
    out = str(tmp_path / "r.png")
    stats = str(tmp_path / "stats.json")
    ckpt = str(tmp_path / "r.ckpt.npz")
    rc = cli.main([
        "proc:cornell", "--spp", "2", "--width", "32", "--height", "32",
        "--skybox", "GENERATE COLOR BLACK", "--out", out,
        "--stats-json", stats, "--checkpoint", ckpt,
        "--max-bounces", "4", "--chunk", "1024",
    ])
    assert rc == 0
    assert os.path.exists(out)
    with open(stats) as f:
        st = json.load(f)
    assert st["spp"] == 2 and st["triangles"] == 36
    assert st["rays"] > 1024

    # Resume from the checkpoint and render 1 more sample.
    out2 = str(tmp_path / "r2.png")
    rc = cli.main(["proc:cornell", "--spp", "1", "--out", out2,
                   "--resume", ckpt, "--width", "32", "--height", "32"])
    assert rc == 0 and os.path.exists(out2)


def test_cli_scene_txt(tmp_path):
    from gpupathtracer_tpu import cli
    (tmp_path / "tri.obj").write_text(
        "v -5 0 -5\nv 5 0 -5\nv 0 0 5\nvn 0 1 0\nf 1//1 3//1 2//1\n")
    (tmp_path / "scene.txt").write_text(
        f"{tmp_path}/tri.obj\nGENERATE COLOR WHITE\n0 2 -6\n3.14159 -0.2\n")
    out = str(tmp_path / "s.png")
    rc = cli.main([str(tmp_path / "scene.txt"), "--spp", "1", "--width", "32",
                   "--height", "32", "--out", out, "--max-bounces", "2"])
    assert rc == 0 and os.path.exists(out)


def test_sbvh_quality_vs_object_only():
    """Spatial splits must not degrade tree quality (SAH regression guard,
    role of the reference's printed build metrics, BVH.cpp:2218-2222)."""
    from gpupathtracer_tpu.bvh.cpp import build_sbvh_cpp
    rng = np.random.RandomState(5)
    # Long thin triangles (spatial splits shine here, Stich et al. §1).
    n = 4000
    base = rng.uniform(-10, 10, (n, 1, 3))
    along = rng.normal(size=(n, 1, 3)) * 3.0
    off = rng.normal(size=(n, 2, 3)) * 0.05
    p0 = base[:, 0]
    p1 = base[:, 0] + along[:, 0]
    p2 = base[:, 0] + along[:, 0] * 0.5 + off[:, 0]
    p0, p1, p2 = (x.astype(np.float32) for x in (p0, p1, p2))
    _, s_spatial = build_sbvh_cpp(p0, p1, p2, spatial_splits=True)
    _, s_object = build_sbvh_cpp(p0, p1, p2, spatial_splits=False)
    assert s_spatial.spatial_splits > 0
    assert s_object.spatial_splits == 0
    # On long thin triangles spatial splits must WIN on SAH...
    assert s_spatial.sah_cost < s_object.sah_cost
    # ...within the builder's 30% reference-duplication budget.
    assert s_spatial.duplication_pct < 35.0
    # Realistic scenes stay low: Sponza-class measures ~8% (see PERF.md).
