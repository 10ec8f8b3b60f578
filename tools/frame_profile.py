#!/usr/bin/env python
"""Headline-frame cost bisection (PERF.md frame decomposition).

Renders the bench config with estimator stages toggled off to attribute
frame time; run on the TPU. Extend with more frame() variants as needed."""
import argparse
import sys, math, time, statistics
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.render import Renderer
from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()

_ap = argparse.ArgumentParser()
_ap.add_argument("variants", nargs="?", default="full,nonee")
_ap.add_argument("--scene", default="proc:sponza")
_ap.add_argument("--width", type=int, default=1920)
_ap.add_argument("--height", type=int, default=1080)
_ap.add_argument("--microfacet", default="trowbridge_reitz")
_ARGS = _ap.parse_args()

def frame(label, **kw):
    w, h = _ARGS.width, _ARGS.height
    kw.setdefault("max_bounces", 64)
    cfg = RenderConfig(scene_path=_ARGS.scene, skybox="GENERATE COLOR BLACK",
                       width=w, height=h, integrator="wavefront",
                       microfacet=_ARGS.microfacet,
                       ray_chunk=1 << 21, cache_enabled=True,
                       **kw)
    if _ARGS.scene == "proc:sponza":
        cfg.camera = CameraConfig(position=(-18.0, 4.5, 0.0), yaw=math.pi/2,
                                  pitch=-0.05, fov=math.radians(60),
                                  aspect=w/h)
    else:
        from gpupathtracer_tpu.scene.procedural import default_camera
        pos, yaw, pitch, fov, aperture, focus = default_camera(_ARGS.scene)
        cfg.camera = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                                  fov=math.radians(fov), aspect=w/h,
                                  aperture=aperture, focal_distance=focus)
    r = Renderer(cfg)
    r.render_frame(sync=True)
    batch = kw.get("frame_batch", 1)  # report per-spp when batched
    meds = []
    for _ in range(3):
        t0 = time.time()
        for i in range(3):
            r.render_frame(sync=(i == 2))
        meds.append((time.time() - t0) / (3 * batch))
    m = statistics.median(meds)
    print(f"{label}: {m:.3f} s/{'spp' if batch > 1 else 'frame'}", flush=True)
    return m

VARIANTS = {
    "full": dict(bounce_traversal="same"),
    "nonee": dict(bounce_traversal="same", nee_enabled=False),
    "tsort": dict(bounce_traversal="tsort"),
    "tsort-nonee": dict(bounce_traversal="tsort", nee_enabled=False),
    "shadowrev": dict(bounce_traversal="same", shadow_rev=True),
    "tsort-shadowrev": dict(bounce_traversal="tsort", shadow_rev=True),
    "tsort-shadowsort": dict(bounce_traversal="tsort", shadow_sort=True),
    # compaction bisect: phase-transition argsort+gather cost
    "tsort-nocompact": dict(bounce_traversal="tsort", shadow_sort=True,
                            compaction=False),
    # coarser compaction schedule: fewer transitions
    "tsort-coarse": dict(bounce_traversal="tsort", shadow_sort=True,
                         compaction_divs=(4, 16, 64)),
    "tsort-coarse2": dict(bounce_traversal="tsort", shadow_sort=True,
                          compaction_divs=(8, 64)),
    "tsort-coarse3": dict(bounce_traversal="tsort", shadow_sort=True,
                          compaction_divs=(4, 32, 256)),
    # alternate-bounce perm reuse (skip key+argsort on odd bounces)
    "tsort-alt": dict(bounce_traversal="tsort", shadow_sort=True,
                      tsort_alternate=True),
    # small-scene glue bisection (bathroom-class: tsort is off by size gate)
    "nocompact": dict(bounce_traversal="same", compaction=False),
    "batch4": dict(bounce_traversal="same", frame_batch=4),
    "batch8": dict(bounce_traversal="same", frame_batch=8),
    "bounces8": dict(bounce_traversal="same", max_bounces=8),
    "bounces16": dict(bounce_traversal="same", max_bounces=16),
    # primary floor: camera gen + ONE coherent trace + shade glue (+NEE)
    "b0-nonee": dict(bounce_traversal="same", nee_enabled=False,
                     max_bounces=0),
    "b0": dict(bounce_traversal="same", max_bounces=0),
    # schedule re-probe after the session-7 glue cuts
    "tsort-fine4": dict(bounce_traversal="tsort", shadow_sort=True,
                        compaction_divs=(2, 8, 32, 128)),
    "tsort-coarse4": dict(bounce_traversal="tsort", shadow_sort=True,
                          compaction_divs=(4, 16, 64, 256)),
    # round-4 megakernel (ops/megakernel.py): whole bounce loop on-core
    "mega": dict(megakernel="on"),
    "mega-nonee": dict(megakernel="on", nee_enabled=False),
    "mega-b0": dict(megakernel="on", max_bounces=0),
    "mega-batch8": dict(megakernel="on", frame_batch=8),
    "mega-bounces8": dict(megakernel="on", max_bounces=8),
    # fused-pair pop pairing (two packets per grid step, one region per
    # phase pair — the pop-latency-chain lever)
    "fpair": dict(bounce_traversal="same", fused_pair=True),
    "tsort-fpair": dict(bounce_traversal="tsort", shadow_sort=True,
                        fused_pair=True),
    # round-4 dense cluster leaves (bvh/cluster.py): subtree-sized MXU
    # pops; megacluster composes them into the on-core bounce loop.
    "cluster": dict(cluster_tris=128),
    "cluster256": dict(cluster_tris=256),
    "cluster-nonee": dict(cluster_tris=128, nee_enabled=False),
    "megacluster": dict(megakernel="on", cluster_tris=128),
    "megacluster256": dict(megakernel="on", cluster_tris=256),
}

names = _ARGS.variants.split(",")
res = {}
for name in names:
    res[name] = frame(f"{name:<16}", **VARIANTS[name])
if "full" in res and "nonee" in res:
    print(f"NEE share (shadow rays + light sampling): "
          f"{res['full'] - res['nonee']:.3f} s")
