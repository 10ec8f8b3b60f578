#!/usr/bin/env python
"""Traversal-kernel microbench — same-session A/B harness.

All PERF.md kernel numbers come from here. Protocol (PERF.md): throughput is
non-stationary across sessions, so only same-session comparisons are valid;
every number is the median of --reps back-to-back runs, reported net of the
~33 ms tunnel readback (measured per-run via an empty sync).

Ray sets:
  coherent    Morton-tiled camera primaries on the scene's default view.
  incoherent  random-direction rays from the primaries' hit points,
              randomly permuted (the diffuse-bounce worst case).

Usage:
  python tools/kernel_bench.py --scene proc:sponza --k 2048 --reps 5
  python tools/kernel_bench.py --ordered 0 --stats   # A/B + pop counters
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_net(fn, out_probe, reps, inner=4):
    """Median per-call seconds of fn(), net of one host-readback latency.

    Each rep enqueues `inner` launches and syncs once (the device queue
    serializes them), so the ~33 ms tunnel readback is amortized and then
    subtracted — kernels faster than one readback still measure positive.
    """
    # Measure the readback cost itself: sync on an already-computed array
    # (warm once first so the .sum() compile isn't counted).
    probe = out_probe()
    float(probe.sum())
    t0 = time.time()
    for _ in range(3):
        float(probe.sum())
    readback = (time.time() - t0) / 3
    times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            r = fn()
        float(r.sum())          # force completion (block_until_ready lies)
        times.append((time.time() - t0 - readback) / inner)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med > 0 else 0.0
    return med, spread


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:sponza")
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--k", default="2048",
                    help="packet size, or comma-separated list to sweep")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ordered", default="1",
                    help="1 = near-first descent; comma list to sweep")
    ap.add_argument("--stats", action="store_true",
                    help="also report pop counters (slower variant)")
    ap.add_argument("--sets", default="coherent,incoherent")
    ap.add_argument("--any-hit", action="store_true")
    ap.add_argument("--mode", default="packet",
                    help="comma-separated sweep over: packet (single "
                         "shared stack), subpacket (per-sublane 128-ray "
                         "packets), treelet (subtree-binned rounds), "
                         "tsort (treelet-sorted packets), tsort-sub "
                         "(treelet-sorted + subpacket kernel), dense "
                         "(brute-force MXU ray x tri, small scenes), "
                         "dense-vpu (same with the dots on the VPU)")
    ap.add_argument("--dense-tile", type=int, default=512,
                    help="dense mode: triangles per tile")
    ap.add_argument("--cap-factor", type=float, default=2.0)
    ap.add_argument("--fanout", type=int, default=4)
    ap.add_argument("--multi-pop", type=int, default=1,
                    help="entries retired per kernel iteration (packet mode)")
    ap.add_argument("--tsort-kernel", default="packet",
                    choices=["packet", "subpacket"],
                    help="inner kernel for tsort mode")
    ap.add_argument("--interleave", default="1",
                    help="independent packets co-scheduled per grid step "
                         "(packet mode); comma-separated list to sweep")
    ap.add_argument("--fused-pair", action="store_true",
                    help="with --interleave 2: fuse both packets' pops "
                         "into one region per phase pair (_kernel_pair)")
    ap.add_argument("--leaf", default="0",
                    help="override builder leaf_size (0 = config default); "
                         "comma-separated list sweeps scene builds")
    ap.add_argument("--paired", action="store_true",
                    help="interleave reps ACROSS variants round-robin and "
                         "report per-rep ratios vs the first variant — "
                         "tunnel drift hits every variant equally, so the "
                         "ratio stays valid through a DEGRADED window "
                         "(PERF.md r4 session-9 drift record)")
    ap.add_argument("--reinsert", type=int, default=0,
                    help="Bittner reinsertion optimizer rounds (builder)")
    ap.add_argument("--arity", type=int, default=8,
                    help="wide-BVH branching factor (8 default; 16 packs "
                         "16 children per 128-lane row — Pallas path only)")
    ap.add_argument("--cluster-tc", type=int, default=0,
                    help="dense cluster leaves: subtrees of <= this many "
                         "tris (multiple of 128) become single MXU pops "
                         "(bvh/cluster.py). Applies to packet/tsort modes.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import gen_rays, generate_image_plane
    from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
    from gpupathtracer_tpu.ops.subpacket_traverse import traverse_subpacket
    from gpupathtracer_tpu.scene import load_scene
    from gpupathtracer_tpu.scene.procedural import default_camera
    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
    from gpupathtracer_tpu.utils.morton import ray_order

    enable_compile_cache()
    N = args.n
    k_list = [int(s) for s in str(args.k).split(",")]
    ilv_list = [int(s) for s in str(args.interleave).split(",")]
    ord_list = [int(s) for s in str(args.ordered).split(",")]

    leaf_list = [int(s) for s in str(args.leaf).split(",")]
    scenes = {}
    for lf in leaf_list:
        cfg = RenderConfig(scene_path=args.scene,
                           skybox="GENERATE COLOR BLACK",
                           width=64, height=64, cache_enabled=True)
        cfg.wide_arity = args.arity
        if lf:
            cfg.leaf_size = lf
        cfg.reinsert_rounds = args.reinsert
        cfg.cluster_tris = args.cluster_tc
        scenes[lf] = load_scene(cfg)
        scene, meta = scenes[lf]
        rows = scene.bvh.node_rows
        print(f"# {args.scene} leaf={meta.leaf_size}: rows={rows.shape} "
              f"({rows.size * rows.dtype.itemsize / 1e6:.1f} MB) "
              f"stack={meta.stack_depth} "
              f"K={k_list} N={N} ordered={ord_list}", file=sys.stderr)
        if args.cluster_tc:
            cl = scene.bvh.cluster_rows
            print(f"# clusters: {cl.shape[0] // 8} x Tc={args.cluster_tc} "
                  f"({cl.size * cl.dtype.itemsize / 1e6:.1f} MB), "
                  f"top tree {rows.shape[0]} rows", file=sys.stderr)
    scene, meta = scenes[leaf_list[0]]
    rows = scene.bvh.node_rows

    # Coherent set: Morton-tiled primaries at a resolution covering N rays.
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

    def make_run(mode, scene=scene, meta=meta):
        rows = scene.bvh.node_rows
        if mode == "treelet":
            from gpupathtracer_tpu.ops.treelet import (
                trace_closest_treelet, trace_occluded_treelet)
            print(f"# treelet cut: C={scene.bvh.cut_entry.shape[0]} "
                  f"cap_factor={args.cap_factor}", file=sys.stderr)

            def run(o, d, K, with_stats=False, ilv=1, ordered=None):
                tmax = jnp.full((N,), 1e20, jnp.float32)
                act = jnp.ones((N,), bool)
                kw = dict(stack_depth=meta.stack_depth,
                          leaf_size=meta.leaf_size, packet_size=K,
                          cap_factor=args.cap_factor, fanout=args.fanout,
                          interpret=False)
                if args.any_hit:
                    occ = trace_occluded_treelet(scene, o, d, tmax, act,
                                                 **kw)
                    return (occ.astype(jnp.float32),) * 5
                hit = trace_closest_treelet(scene, o, d, tmax, act, **kw)
                return (hit.t, hit.prim, hit.u, hit.v,
                        jnp.zeros((1, 2), jnp.int32))
        elif mode in ("dense", "dense-vpu"):
            from gpupathtracer_tpu.ops.dense_intersect import (
                dense_intersect, pack_dense_tris)
            wd, wo = pack_dense_tris(scene.tri_geom)
            print(f"# dense: padded tris={wd.shape[1] // 3} "
                  f"tile={args.dense_tile} mxu={mode == 'dense'}",
                  file=sys.stderr)

            def run(o, d, K, with_stats=False, ilv=1, ordered=None):
                tmax = jnp.full((N,), 1e20, jnp.float32)
                act = jnp.ones((N,), bool)
                t, prim, u, v = dense_intersect(
                    wd, wo, o, d, tmax, act, any_hit=args.any_hit,
                    use_mxu=(mode == "dense"), block=K,
                    tile=args.dense_tile, interpret=False)
                return (t, prim, u, v, jnp.zeros((1, 2), jnp.int32))
        elif mode in ("tsort", "tsort2", "tsort3", "tsort-sub"):
            from gpupathtracer_tpu.ops.tsort import (trace_closest_tsort,
                                                     trace_occluded_tsort)
            # "tsort" = top1 key, "tsort2" = top2 (the library default);
            # explicit so the mode names keep meaning across default flips.
            inner = "subpacket" if mode == "tsort-sub" else args.tsort_kernel
            kmode = {"tsort2": "top2", "tsort3": "deep"}.get(mode, "top1")

            def run(o, d, K, with_stats=False, ilv=1, ordered=None):
                tmax = jnp.full((N,), 1e20, jnp.float32)
                act = jnp.ones((N,), bool)
                kw = dict(stack_depth=meta.stack_depth,
                          leaf_size=meta.leaf_size, packet_size=K,
                          interleave=ilv,
                          fused_pair=args.fused_pair and ilv == 2,
                          kernel=inner, key_mode=kmode,
                          interpret=False)
                if args.any_hit:
                    occ = trace_occluded_tsort(scene, o, d, tmax, act, **kw)
                    return (occ.astype(jnp.float32),) * 5
                hit = trace_closest_tsort(scene, o, d, tmax, act, **kw)
                return (hit.t, hit.prim, hit.u, hit.v,
                        jnp.zeros((1, 2), jnp.int32))
        else:
            tfn = (traverse_subpacket if mode == "subpacket"
                   else traverse_pallas)

            if mode == "subpacket" and args.arity != 8:
                raise SystemExit("subpacket kernel supports arity 8 only")
            if mode == "subpacket" and args.cluster_tc:
                raise SystemExit("cluster leaves are packet/tsort only")

            def run(o, d, K, with_stats=False, ilv=1, ordered=None):
                P = N // K
                return tfn(rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
                           jnp.full((P, K), 1e20, jnp.float32),
                           jnp.ones((P, K), bool),
                           stack_depth=meta.stack_depth,
                           leaf_size=meta.leaf_size,
                           any_hit=args.any_hit,
                           **({"arity": args.arity} if mode != "subpacket"
                              else {}),
                           ordered=bool(ord_list[0] if ordered is None
                                        else ordered),
                           **({"multi_pop": args.multi_pop,
                               "interleave": ilv,
                               "fused_pair": args.fused_pair and ilv == 2,
                               "cluster_rows": scene.bvh.cluster_rows}
                              if mode == "packet" else {}),
                           with_stats=with_stats)
        return run

    mode_list = str(args.mode).split(",")

    # Incoherent set: random dirs from the coherent hit points, permuted.
    run = make_run(mode_list[0])
    t, prim = run(o_coh, d_coh, k_list[0])[:2]
    t = t.reshape(N)
    hitp = jnp.where((prim.reshape(N) >= 0)[:, None],
                     o_coh + d_coh * (t[:, None] * 0.999), o_coh)
    rng = np.random.RandomState(11)
    dirs = rng.normal(size=(N, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    perm = rng.permutation(N)
    o_inc = jnp.asarray(np.asarray(hitp)[perm])
    d_inc = jnp.asarray(dirs)

    rays = {"coherent": (o_coh, d_coh), "incoherent": (o_inc, d_inc)}
    variants = []  # (tag, key, f, run, o, d, K, ilv, mode)
    for mode in mode_list:
      for lf in leaf_list:
        sc, mt = scenes[lf]
        run = make_run(mode, sc, mt)
        for K in k_list:
          for od in ord_list:
            for ilv in ilv_list:
                for name in args.sets.split(","):
                    o, d = rays[name]
                    f = lambda o=o, d=d, K=K, ilv=ilv, od=od, run=run: \
                        run(o, d, K, ilv=ilv, ordered=od)[0]
                    tag = (mode if len(mode_list) > 1 else "") \
                        + (f" leaf={lf}" if len(leaf_list) > 1 else "") \
                        + f" K={K}" + (f" W={ilv}" if len(ilv_list) > 1
                                       else "") \
                        + (f" ord={od}" if len(ord_list) > 1 else "")
                    key = f"{mode}:{name}@{K}l{lf}w{ilv}o{od}"
                    variants.append((tag.strip(), key, f, run, o, d, K,
                                     ilv, mode, name))

    out = {}

    def stats_suffix(run, o, d, K, ilv, med, mode):
        if not (args.stats and mode in ("packet", "subpacket")):
            return ""
        st = np.asarray(run(o, d, K, with_stats=True, ilv=ilv)[4])
        tot = st[:, :2].sum(0)
        line = (f" | pops/step node p50={np.median(st[:, 0]):.0f}"
                f" leaf p50={np.median(st[:, 1]):.0f};"
                f" ns/pop={med * 1e9 / max(tot.sum(), 1):.0f}")
        if st.shape[1] > 2 and st[:, 2].sum() > 0:
            line += f" | STACK OVERFLOWS={st[:, 2].sum()}"
        return line

    if args.paired and len(variants) > 1:
        # Degradation-valid protocol: compile everything first, then take
        # reps ROUND-ROBIN across variants so tunnel drift is shared; the
        # per-rep time RATIO vs variant 0 is the decision number.
        inner = 4
        for _, _, f, *_ in variants:
            f()  # compile
        probe = variants[0][2]()
        float(probe.sum())
        t0 = time.time()
        for _ in range(3):
            float(probe.sum())
        readback = (time.time() - t0) / 3
        times = {v[1]: [] for v in variants}
        for rep in range(args.reps):
            for tag, key, f, *_ in variants:
                t0 = time.time()
                for _ in range(inner):
                    r = f()
                float(r.sum())
                times[key].append((time.time() - t0 - readback) / inner)
        base_key = variants[0][1]
        for i, (tag, key, f, run, o, d, K, ilv, mode, name) in \
                enumerate(variants):
            ts = times[key]
            med = statistics.median(ts)
            spread = (max(ts) - min(ts)) / med if med > 0 else 0.0
            mrays = N / med / 1e6
            ratios = [a / b for a, b in zip(ts, times[base_key])]
            rmed = statistics.median(ratios)
            rspread = ((max(ratios) - min(ratios)) / rmed
                       if rmed > 0 else 0.0)
            line = (f"{tag} {name}: {mrays:.2f} Mrays/s "
                    f"(net {med * 1e3:.1f} ms, spread {spread:.1%})")
            if i > 0:
                line += (f" | paired ratio vs [0] {rmed:.3f}x "
                         f"(spread {rspread:.1%})")
                out[f"ratio:{key}"] = round(rmed, 4)
            line += stats_suffix(run, o, d, K, ilv, med, mode)
            print(line, flush=True)
            out[key] = round(mrays, 2)
    else:
        for tag, key, f, run, o, d, K, ilv, mode, name in variants:
            f()  # compile outside the timed region
            med, spread = _median_net(
                f, lambda K=K, ilv=ilv, run=run: run(
                    o_coh, d_coh, K, ilv=ilv)[0],
                args.reps)
            mrays = N / med / 1e6
            line = (f"{tag} {name}: {mrays:.2f} Mrays/s "
                    f"(net {med * 1e3:.1f} ms, spread {spread:.1%})")
            line += stats_suffix(run, o, d, K, ilv, med, mode)
            print(line, flush=True)
            out[key] = round(mrays, 2)
    print(f"# summary {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
