#!/usr/bin/env python
"""Megakernel frame decomposition — where do the config-4 seconds go?

VERDICT r4 #2: the 197.5-s bathroom frame rides ops/megakernel.py, which
had no pop accounting. This tool runs ONE megakernel sample with the
in-kernel counters on (trace_mega with_stats=True) and decomposes the
frame into closest/any-hit node/leaf pops, the dead-tail share (pops
issued at bounce >= 8, where Russian roulette has thinned the packet but
the shared-stack walk still pays union cost), and the bounce-iteration
count per packet. Counters are exact and deterministic, so the numbers
are valid through a DEGRADED tunnel (PERF.md measurement protocol); the
optional --time pass adds same-session wall seconds so pops -> ns/pop.

Usage:
  python tools/mega_profile.py                          # bathroom 720p, TPU
  python tools/mega_profile.py --platform cpu --width 128 --height 128
  python tools/mega_profile.py --time --frames 5
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:bathroom")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--platform", default=None,
                    help="cpu forces the interpret-mode kernel")
    ap.add_argument("--max-bounces", type=int, default=64)
    ap.add_argument("--cluster-tris", type=int, default=0)
    ap.add_argument("--spp", type=int, default=1,
                    help="samples per dispatch: > 1 turns on in-kernel "
                         "path regeneration (the persistent-path-pool "
                         "composition) and the --time pass becomes a "
                         "PAIRED regen-vs-loop A/B")
    ap.add_argument("--fused-nee", action="store_true",
                    help="deferred-shadow fused walk (walk_fused); with "
                         "--time the A/B becomes PAIRED fused-vs-plain")
    ap.add_argument("--time", action="store_true",
                    help="also time --frames stat-free frames (wall)")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.render.renderer import Renderer
    from gpupathtracer_tpu.scene.procedural import default_camera
    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    w, h = args.width, args.height
    cfg = RenderConfig(scene_path=args.scene,
                       skybox="GENERATE COLOR BLACK",
                       width=w, height=h, integrator="wavefront",
                       microfacet="beckmann", max_bounces=args.max_bounces,
                       ray_chunk=1 << 21, cache_enabled=True,
                       megakernel="on", cluster_tris=args.cluster_tris)
    pos, yaw, pitch, fov, aperture, focus = default_camera(args.scene)
    cfg.camera = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                              fov=math.radians(fov), aspect=w / h,
                              aperture=aperture, focal_distance=focus)
    r = Renderer(cfg)
    if not r.use_mega:
        # The Renderer only routes to the megakernel on the TPU backend;
        # for CPU interpret-mode profiling build the tables directly.
        from gpupathtracer_tpu.ops.megakernel import (mega_eligible,
                                                      pack_mega_tables)
        if not mega_eligible(r.scene, r.meta, textured=r.meta.has_textures,
                             delta=getattr(r.meta, "has_delta", False),
                             sun=cfg.sun_enabled, sampler=cfg.sampler):
            raise SystemExit("scene/config is not mega_eligible")
        r.mega_tables = pack_mega_tables(r.scene)

    from gpupathtracer_tpu.ops.megakernel import render_sample_mega
    mk = dict(width=r.pad_w, height=r.pad_h,
              stack_depth=r.meta.stack_depth, leaf_size=r.meta.leaf_size,
              max_bounces=cfg.max_bounces, nee=cfg.nee_enabled,
              model=cfg.microfacet, n_mats=r.meta.num_materials,
              n_lights=int(r.scene.light_rows.shape[0]),
              packet_size=cfg.pallas_packet_size,
              interpret=jax.default_backend() != "tpu")
    key = jax.random.PRNGKey(7)
    spp = args.spp
    _, rays, stats = render_sample_mega(
        r.scene, r.mega_tables, r.camera, r.pixel_x, r.pixel_y, key,
        sample_idx=0, with_stats=True, spp=spp,
        fused_nee=args.fused_nee, **mk)
    st = (np.asarray(stats).astype(np.int64) / spp)  # [P, 9], per sample
    P = st.shape[0]
    K = mk["packet_size"]
    n = r.pad_w * r.pad_h

    bounce_rays, shadow_rays = st[:, 0].sum(), st[:, 1].sum()
    cn, cl = st[:, 2].sum(), st[:, 3].sum()
    an, al = st[:, 4].sum(), st[:, 5].sum()
    ctail, atail = st[:, 6].sum(), st[:, 7].sum()
    iters = st[:, 8]
    tot = cn + cl + an + al
    print(f"# {args.scene} {w}x{h} max_bounces={cfg.max_bounces} "
          f"P={P} K={K} rays/frame={n} spp/dispatch={spp} "
          f"(stats below are PER SAMPLE)")
    print(f"segments: bounce {bounce_rays:.0f} ({bounce_rays/n:.2f}/px) + "
          f"live shadow {shadow_rays:.0f} ({shadow_rays/n:.2f}/px) = "
          f"{(bounce_rays+shadow_rays)/n:.2f}/px/spp")
    print(f"pops/packet: closest node {cn/P:.0f} leaf {cl/P:.0f} | "
          f"anyhit node {an/P:.0f} leaf {al/P:.0f} | total {tot/P:.0f}")
    print(f"bounce iterations/packet: p50={np.median(iters):.0f} "
          f"mean={iters.mean():.1f} max={iters.max()}")
    print(f"dead-tail share (pops at bounce >= 8): closest "
          f"{ctail/max(cn+cl,1):.1%}  anyhit {atail/max(an+al,1):.1%}  "
          f"all {(ctail+atail)/max(tot,1):.1%}")
    print(f"pops/segment: closest {(cn+cl)/max(bounce_rays,1)*K:.1f} "
          f"anyhit {(an+al)/max(shadow_rays,1)*K:.1f} (packet-shared: "
          f"pops x K / segments)")

    if args.time:
        from gpupathtracer_tpu.ops.megakernel import \
            render_sample_mega_batch

        def mk_fn(fori, fused=False):
            if spp == 1:
                return lambda: render_sample_mega(
                    r.scene, r.mega_tables, r.camera, r.pixel_x,
                    r.pixel_y, key, sample_idx=0, fused_nee=fused,
                    **mk)[0]
            return lambda: render_sample_mega_batch(
                r.scene, r.mega_tables, r.camera, r.pixel_x, r.pixel_y,
                key, spp=spp, sample_idx=0, fori=fori, fused_nee=fused,
                **mk)[0]

        if args.fused_nee:
            # Paired fused-vs-plain A/B (both regen when spp > 1).
            variants = [("fused", mk_fn(False, True)),
                        ("plain", mk_fn(False, False))]
        elif spp > 1:
            variants = [("regen", mk_fn(False)), ("loop", mk_fn(True))]
        else:
            variants = [("mega", mk_fn(False))]
        for _, f in variants:
            float(jnp.sum(f()))  # compile
        out = variants[0][1]()
        float(jnp.sum(out))
        t0 = time.time()
        for _ in range(3):
            float(jnp.sum(out))
        readback = (time.time() - t0) / 3
        times = {nm: [] for nm, _ in variants}
        for _ in range(args.frames):
            for nm, f in variants:  # paired round-robin (drift-valid)
                t0 = time.time()
                float(jnp.sum(f()))
                times[nm].append(time.time() - t0 - readback)
        for i, (nm, f) in enumerate(variants):
            ts = times[nm]
            med = statistics.median(ts)
            spread = (max(ts) - min(ts)) / med
            line = (f"{nm}: wall/sample {med/spp*1e3:.1f} ms "
                    f"(dispatch {med*1e3:.1f} ms, spread {spread:.0%}, "
                    f"net of {readback*1e3:.1f} ms readback)")
            if i == 0:
                line += (f" | ns/pop "
                         f"{med / spp / max(tot, 1) * 1e9:.0f} | "
                         f"sustained "
                         f"{(bounce_rays+shadow_rays)*spp/med/1e6:.1f} "
                         f"Mrays/s")
            else:
                ratios = [a / b for a, b in
                          zip(ts, times[variants[0][0]])]
                line += (f" | paired ratio vs {variants[0][0]} "
                         f"{statistics.median(ratios):.3f}x")
            print(line)


if __name__ == "__main__":
    main()
