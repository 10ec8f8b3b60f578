#!/usr/bin/env python
"""Headline benchmark: Mrays/s on the Sponza-class scene at 1080p, 1 spp
NEE real-time config (BASELINE.md config 3; target >= 100 Mrays/s/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}

Runs on whatever the default JAX platform is (the real TPU chip under the
driver). Ray counts come from the integrator's exact device-side counter
(primary + bounce closest-hit rays + NEE shadow rays), the same accounting
behind the reference's 40-80 Mrays/s GTX 980 estimate (BASELINE.md).
"""

from __future__ import annotations

import json
import math
import sys
import time


def main() -> None:
    import jax

    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render import Renderer

    quick = "--quick" in sys.argv

    width, height = (640, 360) if quick else (1920, 1080)
    cfg = RenderConfig(
        scene_path="proc:sponza",
        skybox="GENERATE COLOR BLACK",
        width=width, height=height,
        integrator="wavefront",
        max_bounces=64,
        ray_chunk=1 << 19,
        cache_enabled=True,
    )
    # Camera inside the atrium looking down the colonnade.
    cfg.camera = CameraConfig(position=(-18.0, 4.5, 0.0), yaw=math.pi / 2,
                              pitch=-0.05, fov=math.radians(60),
                              aspect=width / height)

    t0 = time.time()
    r = Renderer(cfg)
    build_s = time.time() - t0
    print(f"# scene: {r.meta.bvh_stats.report()} (total {build_s:.1f}s)",
          file=sys.stderr)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # Warmup / compile.
    t0 = time.time()
    r.render_frame(sync=True)
    print(f"# first frame (compile): {time.time() - t0:.1f}s", file=sys.stderr)

    # Timed frames: enqueue async, sync once on the last (total time is
    # attributed across the batch; per-sync cost ~33 ms on the tunnel).
    r.stats.frame_times.clear()
    r.stats.rays_traced = 0
    n_frames = 2 if quick else 8
    for i in range(n_frames):
        r.render_frame(sync=(i == n_frames - 1))

    mrays = r.stats.mrays_per_sec
    print(f"# {r.stats.report()}", file=sys.stderr)
    print(f"# avg frame: {1.0 / max(r.stats.avg_fps, 1e-9):.3f}s "
          f"({r.stats.avg_fps:.2f} fps @ {width}x{height} 1spp)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "mrays_per_sec_sponza_1080p",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
