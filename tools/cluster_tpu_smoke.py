#!/usr/bin/env python
"""Mosaic compile + correctness smoke for the round-4 cluster kernels.

The cluster kernels (_kernel_cluster, the megakernel cluster walks) were
developed against interpret mode; this script is the first REAL-CHIP
gate: it compiles and runs each on the TPU and cross-checks hits against
the CPU per-lane reference (tolerance-based — MXU accumulation order
differs from interpret mode). Valid under a DEGRADED tunnel: correctness
does not care about RTT, and compile failures are what we are hunting.

Usage: python tools/cluster_tpu_smoke.py [--scene proc:bathroom]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:bathroom")
    ap.add_argument("--tc", type=int, default=128)
    ap.add_argument("--n", type=int, default=8192)
    args = ap.parse_args()

    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpupathtracer_tpu.config import RenderConfig
    from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
    from gpupathtracer_tpu.ops.traverse import closest_hit, any_hit
    from gpupathtracer_tpu.scene import load_scene

    dev = jax.devices()[0]
    print(f"# device: {dev} ({dev.platform})", flush=True)
    if dev.platform != "tpu":
        print("# NOT a TPU — this smoke is for the real chip", flush=True)

    cfg = RenderConfig(scene_path=args.scene, skybox="GENERATE COLOR BLACK",
                       width=64, height=64, cache_enabled=True,
                       cluster_tris=args.tc)
    scene, meta = load_scene(cfg)
    ncl = scene.bvh.cluster_rows.shape[0] // 8
    print(f"# {args.scene}: {meta.num_triangles} tris, {ncl} clusters "
          f"x Tc={args.tc}, top tree {scene.bvh.node_rows.shape[0]} rows",
          flush=True)

    N, K = args.n, 2048
    rng = np.random.RandomState(11)
    o = jnp.asarray(rng.uniform(-6, 6, (N, 3)).astype(np.float32))
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    act = jnp.ones((N,), bool)
    P = N // K

    failures = 0

    def check(label, fn, ref_occ=None, ref_hit=None):
        nonlocal failures
        t0 = time.time()
        try:
            out = fn()
            out = [np.asarray(x) for x in out]
        except Exception as e:
            print(f"FAIL {label}: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            failures += 1
            return None
        print(f"ok   {label} ({time.time() - t0:.1f}s incl. compile)",
              flush=True)
        return out

    # CPU reference hits (per-lane, full tree).
    ref = closest_hit(scene.bvh, scene.tri_geom, o, d, tmax, act,
                      stack_depth=meta.stack_depth,
                      leaf_size=meta.leaf_size)
    ref_t = np.asarray(ref.t)
    ref_p = np.asarray(ref.prim)

    # 1. cluster closest (ordered) + stats variant
    out = check("cluster closest", lambda: traverse_pallas(
        scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), act.reshape(P, K),
        stack_depth=meta.stack_depth,
        cluster_rows=scene.bvh.cluster_rows))
    if out is not None:
        t = out[0].reshape(-1)
        pl_ = out[1].reshape(-1)
        prim = np.where(pl_ >= 0,
                        np.asarray(scene.bvh.cluster_refs)[
                            np.clip(pl_, 0, None)], -1)
        agree = ((prim >= 0) == (ref_p >= 0)).mean()
        tclose = np.isclose(t, ref_t, rtol=1e-3, atol=1e-4)
        both = (prim >= 0) & (ref_p >= 0)
        print(f"     hit/miss agree {agree:.4f}; t close "
              f"{tclose[both].mean():.4f}", flush=True)
        if agree < 0.995 or tclose[both].mean() < 0.995:
            print("FAIL correctness drift vs CPU reference", flush=True)
            failures += 1

    out = check("cluster closest +stats", lambda: traverse_pallas(
        scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), act.reshape(P, K),
        stack_depth=meta.stack_depth, with_stats=True,
        cluster_rows=scene.bvh.cluster_rows))
    if out is not None:
        st = out[4]
        print(f"     pops/packet: node p50={np.median(st[:, 0]):.0f} "
              f"cluster RUN p50={np.median(st[:, 1]):.0f} "
              f"SKIPPED p50={np.median(st[:, 2]):.0f}", flush=True)

    # 2. cluster any-hit (unordered)
    tshort = jnp.full((N,), 4.0, jnp.float32)
    occ_ref = np.asarray(any_hit(scene.bvh, scene.tri_geom, o, d, tshort,
                                 act, stack_depth=meta.stack_depth,
                                 leaf_size=meta.leaf_size))
    out = check("cluster any-hit", lambda: traverse_pallas(
        scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tshort.reshape(P, K), act.reshape(P, K),
        stack_depth=meta.stack_depth, any_hit=True, ordered=False,
        cluster_rows=scene.bvh.cluster_rows))
    if out is not None:
        occ = out[1].reshape(-1) >= 0
        m = (occ == occ_ref).mean()
        print(f"     occlusion agree {m:.4f}", flush=True)
        if m < 0.99:
            print("FAIL any-hit drift", flush=True)
            failures += 1

    # 3. megakernel cluster walks (compile + finite output)
    import math

    from gpupathtracer_tpu.config import CameraConfig
    from gpupathtracer_tpu.math.camera import generate_image_plane
    from gpupathtracer_tpu.ops.megakernel import (mega_eligible,
                                                  pack_mega_tables,
                                                  render_sample_mega)
    from gpupathtracer_tpu.scene.procedural import default_camera
    if mega_eligible(scene, meta, textured=meta.has_textures,
                     delta=meta.has_delta, sun=False):
        pos, yaw, pitch, fov, aperture, focus = default_camera(args.scene)
        ccfg = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                            fov=math.radians(fov), aspect=1.0,
                            aperture=aperture, focal_distance=focus)
        cam = generate_image_plane(ccfg)
        w = 64
        idx = np.arange(w * w)
        px = jnp.asarray((idx % w).astype(np.float32))
        py = jnp.asarray((idx // w).astype(np.float32))
        tables = pack_mega_tables(scene)
        out = check("megakernel cluster", lambda: render_sample_mega(
            scene, tables, cam, px, py, jax.random.PRNGKey(0),
            width=w, height=w, stack_depth=meta.stack_depth,
            leaf_size=meta.leaf_size, max_bounces=4, nee=True,
            n_mats=meta.num_materials,
            n_lights=int(scene.light_rows.shape[0]),
            packet_size=2048))
        if out is not None:
            c = out[0]
            print(f"     contribution mean {c.mean():.4f} "
                  f"finite={np.isfinite(c).all()}", flush=True)
            if not np.isfinite(c).all() or not (0 < c.mean() < 100):
                print("FAIL megakernel output implausible", flush=True)
                failures += 1
    else:
        print("# megakernel not eligible on this scene/config", flush=True)

    print(f"# smoke result: {'PASS' if failures == 0 else 'FAIL'} "
          f"({failures} failures)", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
