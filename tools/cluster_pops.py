#!/usr/bin/env python
"""Cluster-leaf pop-counter A/B — hardware-independent (PERF.md protocol).

Pop counts of the shared-stack packet kernel are DETERMINISTIC in
(rays, table, K): the same numbers come out of the TPU kernel and the
interpret-mode kernel, so this A/B stays valid when the tunnel is
degraded or down (CLAUDE.md outage playbook). It compares, on the same
ray sets kernel_bench uses:

  baseline   MT-leaf table (leaf_size rows), tsort-sorted packets
  cluster    dense cluster top tree at --tc (bvh/cluster.py), same sort

and reports node/leaf pops per packet. Composing with the measured pop
costs (PERF.md: ~460 ns/pop latency chain; cluster pops add the dense
epilogue, priced by tools/roofline.py when hardware is up) gives the
modeled frame win; the wall-clock A/B (kernel_bench --cluster-tc) banks
the real number in a healthy window.

Interpret mode is slow (~5-10 s/packet on Sponza): default N is small.
Caveat: tsort grouping at small N is slightly coarser than at the 512k
kernel_bench uses — compare like against like (same N on both sides).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:sponza")
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--tc", default="0,128,256",
                    help="comma list; 0 = MT-leaf baseline")
    ap.add_argument("--sets", default="incoherent",
                    help="coherent,incoherent")
    ap.add_argument("--sort", default="tsort", choices=["tsort", "none"])
    ap.add_argument("--any-hit", action="store_true")
    ap.add_argument("--pop-skip", action="store_true",
                    help="t-pruned cluster-pop skip (MEASURED 0 skips on "
                         "sponza/bathroom incoherent — kept for re-checks)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import gen_rays, generate_image_plane
    from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
    from gpupathtracer_tpu.ops.traverse import closest_hit
    from gpupathtracer_tpu.ops.tsort import _sort_perm
    from gpupathtracer_tpu.scene import load_scene
    from gpupathtracer_tpu.scene.procedural import default_camera
    from gpupathtracer_tpu.utils.morton import ray_order

    N, K = args.n, args.k

    def build(tc):
        cfg = RenderConfig(scene_path=args.scene,
                           skybox="GENERATE COLOR BLACK",
                           width=64, height=64, cache_enabled=True,
                           cluster_tris=tc)
        return load_scene(cfg)

    scene0, meta = build(0)

    # Ray sets (kernel_bench recipe, CPU per-lane traversal for hits).
    w = 1 << math.ceil(math.log2(math.sqrt(N * 16 / 9)))
    h = N // w
    pos, yaw, pitch, fov, aperture, focus = default_camera(args.scene)
    ccfg = CameraConfig(position=pos, yaw=yaw, pitch=pitch,
                        fov=math.radians(fov), aspect=w / h)
    cam = generate_image_plane(ccfg)
    order = ray_order(w, h, "morton")[:N]
    px = (order % w).astype(np.float32)
    py = (order // w).astype(np.float32)
    interp = jnp.stack([jnp.asarray(px) / w, jnp.asarray(py) / h], axis=-1)
    lens_u = jnp.full((N, 2), 0.5, jnp.float32)
    o_coh, d_coh = gen_rays(cam, interp, lens_u)
    tmax = jnp.full((N,), 1e20, jnp.float32)
    hit = closest_hit(scene0.bvh, scene0.tri_geom, o_coh, d_coh, tmax,
                      stack_depth=meta.stack_depth,
                      leaf_size=meta.leaf_size)
    hitp = jnp.where((hit.prim >= 0)[:, None],
                     o_coh + d_coh * (hit.t[:, None] * 0.999), o_coh)
    rng = np.random.RandomState(11)
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    perm = rng.permutation(N)
    rays = {"coherent": (o_coh, d_coh),
            "incoherent": (jnp.asarray(np.asarray(hitp)[perm]),
                           jnp.asarray(dirs))}

    act = jnp.ones((N,), bool)
    P = N // K
    for tc in (int(s) for s in str(args.tc).split(",")):
        scene = scene0 if tc == 0 else build(tc)[0]
        rows = scene.bvh.node_rows
        for name in args.sets.split(","):
            o, d = rays[name]
            if args.sort == "tsort":
                p = _sort_perm(scene.bvh.cut_bounds, o, d, tmax, act)
                o, d = o[p], d[p]
            out = traverse_pallas(
                rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
                tmax.reshape(P, K), act.reshape(P, K),
                stack_depth=meta.stack_depth,
                leaf_size=meta.leaf_size, any_hit=args.any_hit,
                ordered=not args.any_hit, with_stats=True, interpret=True,
                pop_skip=args.pop_skip,
                cluster_rows=(scene.bvh.cluster_rows if tc else None))
            st = np.asarray(out[4])
            label = f"tc={tc or 'MT'} {name}"
            skip = (f" skipped p50={np.median(st[:, 2]):.0f} "
                    f"mean={st[:, 2].mean():.0f}"
                    if st.shape[1] > 2 else "")
            print(f"{label}: node pops/packet p50="
                  f"{np.median(st[:, 0]):.0f} mean={st[:, 0].mean():.0f} "
                  f"| {'cluster' if tc else 'leaf'} pops/packet "
                  f"p50={np.median(st[:, 1]):.0f} "
                  f"mean={st[:, 1].mean():.0f}{skip} "
                  f"| total RUN/ray={(st[:, 0:2].sum()) / N:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
