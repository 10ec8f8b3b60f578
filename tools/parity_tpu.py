#!/usr/bin/env python
"""Cross-integrator estimator parity at benchmark scale (PARITY.md evidence).

Renders the same scene with the wavefront integrator (NEE + MIS, the
reference's Iterative.comp estimator semantics) and the independent
uniform-hemisphere ground-truth integrator (the reference's CPU renderer
role, src/core/Renderer.cpp:21-22), then reports per-channel mean error and
pixelwise agreement. Run on the TPU; writes a summary line you can paste
into PARITY.md.

Usage: python tools/parity_tpu.py [--scene proc:cornell] [--res 128]
       [--spp-wave 512] [--spp-ref 2048]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:cornell")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--spp-wave", type=int, default=512)
    ap.add_argument("--spp-ref", type=int, default=2048)
    ap.add_argument("--skybox", default=None,
                    help="default: WHITE for the env-lit bunny scene "
                         "(it has no emitter), BLACK otherwise")
    ap.add_argument("--megakernel", action="store_true",
                    help="run the test integrator on the megakernel "
                         "(ops/megakernel.py) instead of the wavefront — "
                         "the VERDICT r4 #3 graded-fidelity parity row")
    ap.add_argument("--frame-batch", type=int, default=1,
                    help="spp per dispatch for the test integrator "
                         "(megakernel: in-kernel path regeneration)")
    args = ap.parse_args()
    if args.skybox is None:
        args.skybox = ("GENERATE COLOR WHITE"
                       if args.scene == "proc:bunny"
                       else "GENERATE COLOR BLACK")

    import numpy as np

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer
    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = RenderConfig(scene_path=args.scene, skybox=args.skybox,
                       width=args.res, height=args.res,
                       ray_chunk=args.res * args.res,
                       cache_enabled=True)
    if args.scene == "proc:cornell":
        cfg.camera = CameraConfig(position=(2.75, 2.75, -7.0), yaw=math.pi,
                                  fov=math.radians(45), aspect=1.0)
    elif args.scene.startswith("proc:"):
        from gpupathtracer_tpu.scene.procedural import default_camera
        pos, yaw, pitch, fov, aperture, focus = default_camera(args.scene)
        # No DoF for parity runs: the reference integrator and wavefront
        # share the lens model, but a pinhole keeps the comparison sharp.
        cfg.camera = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                                  fov=math.radians(fov), aspect=1.0)

    if args.megakernel:
        cfg.megakernel = "on"
    cfg.frame_batch = args.frame_batch
    r = Renderer(cfg)
    if args.megakernel and not r.use_mega:
        raise SystemExit("scene/config is not mega_eligible")
    t0 = time.time()
    done = 0
    while done < args.spp_wave:
        r.render_frame("wavefront")
        done = r.num_samples
    img_w = r.film_hdr()
    t_wave = time.time() - t0

    r2 = Renderer(cfg, scene=r.scene, meta=r.meta)
    t0 = time.time()
    for _ in range(args.spp_ref):
        r2.render_frame("reference")
    img_r = r2.film_hdr()
    t_ref = time.time() - t0

    assert not np.isnan(img_w).any() and not np.isnan(img_r).any()
    mw = img_w.mean(axis=(0, 1))
    mr = img_r.mean(axis=(0, 1))
    mean_err = np.abs(mw - mr) / (mr + 1e-6)
    # Pixelwise relative error on a lightly blurred image (kills residual
    # MC noise; 4x4 box) — the "pixel-statistical match" criterion.
    k = 4
    H = (args.res // k) * k
    bw = img_w[:H, :H].reshape(H // k, k, H // k, k, 3).mean(axis=(1, 3))
    br = img_r[:H, :H].reshape(H // k, k, H // k, k, 3).mean(axis=(1, 3))
    lum_w = bw.mean(-1)
    lum_r = br.mean(-1)
    rel = np.abs(lum_w - lum_r) / (lum_r + 0.01 * lum_r.mean() + 1e-9)
    print(f"scene={args.scene} res={args.res} "
          f"wavefront {args.spp_wave}spp ({t_wave:.0f}s) vs "
          f"reference {args.spp_ref}spp ({t_ref:.0f}s)")
    print(f"channel means wavefront: {mw}")
    print(f"channel means reference: {mr}")
    print(f"per-channel mean error: {100 * mean_err} %  "
          f"(max {100 * mean_err.max():.2f}%)")
    print(f"4x4-blurred pixel rel err: p50={np.percentile(rel, 50):.4f} "
          f"p95={np.percentile(rel, 95):.4f} p99={np.percentile(rel, 99):.4f}")


if __name__ == "__main__":
    main()
