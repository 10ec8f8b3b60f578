#!/usr/bin/env python
"""Paired A/B of regen-megakernel spp-per-dispatch (frame_batch) points.

The table-PT batch sweep (PERF.md round-5 s2) kept gaining to fb=128
(21.0 spp/s); this pairs two fb points on the config-4 frame itself so
the bathroom headline rides the measured winner. Protocol: both
variants compiled first, then round-robin reps rendering the SAME
number of samples each (lcm of the fb points), per-rep ratios — valid
through tunnel drift like kernel_bench --paired.

Usage: python tools/regen_fb_ab.py [--fb 64 128] [--reps 5]
       [--width 1280 --height 720] [--scene proc:bathroom]
"""
import argparse
import dataclasses
import math
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:bathroom")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--max-bounces", type=int, default=64)
    ap.add_argument("--fb", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render.renderer import Renderer
    from gpupathtracer_tpu.scene.procedural import default_camera

    pos, yaw, pitch, fov, aperture, focus = default_camera(args.scene)
    rends = {}
    for fb in args.fb:
        cfg = RenderConfig(scene_path=args.scene,
                           skybox="GENERATE COLOR BLACK",
                           width=args.width, height=args.height,
                           integrator="wavefront", microfacet="beckmann",
                           max_bounces=args.max_bounces,
                           megakernel="on", frame_batch=fb,
                           ray_chunk=1 << 21, cache_enabled=True)
        cfg.camera = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                                  fov=math.radians(fov),
                                  aspect=args.width / args.height,
                                  aperture=aperture, focal_distance=focus)
        rends[fb] = Renderer(cfg)

    # Samples per rep: same for every variant (lcm of the fb points).
    per_rep = args.fb[0]
    for fb in args.fb[1:]:
        per_rep = per_rep * fb // math.gcd(per_rep, fb)

    for fb, r in rends.items():
        t0 = time.time()
        r.render_frame(sync=True)  # compile
        print(f"# fb={fb} compile+first {time.time() - t0:.1f}s",
              flush=True)

    walls = {fb: [] for fb in args.fb}
    for rep in range(args.reps):
        for fb, r in rends.items():
            r.reset_samples()
            t0 = time.time()
            for i in range(per_rep // fb):
                r.render_frame(sync=(i == per_rep // fb - 1))
            w = (time.time() - t0) / per_rep
            walls[fb].append(w)
            print(f"# rep {rep} fb={fb}: {w * 1e3:.1f} ms/sample",
                  flush=True)

    base = args.fb[0]
    med = {fb: statistics.median(w) for fb, w in walls.items()}
    spread = {fb: (max(w) - min(w)) / med[fb] for fb, w in walls.items()}
    ratios = {fb: statistics.median(b / a for a, b in
                                    zip(walls[base], walls[fb]))
              for fb in args.fb}
    for fb in args.fb:
        print(f"fb={fb}: median {med[fb] * 1e3:.1f} ms/sample "
              f"(spread {spread[fb] * 100:.1f}%), paired ratio vs "
              f"fb={base}: {ratios[fb]:.3f}", flush=True)


if __name__ == "__main__":
    main()
