#!/usr/bin/env python
"""Same-session A/B over merged-table LAYOUT variants (arity x leaf size).

A 16-wide node still fits one 128-lane row (16*6 bounds + 16 entries =
112 lanes), halving INTERNAL node count. The pop is latency-bound with
the VPU mostly idle (PERF.md), so the doubled slab work should be ~free;
the bet is fewer node pops per ray. The counter-bet: leaf pops are
unchanged, and the ordered push pays a 63-comparator network vs 19.

Protocol: PERF.md same-session A/B — both scenes loaded in ONE process,
identical ray sets, median-of-reps net of readback (kernel_bench's
_median_net discipline).
"""
import argparse
import math
import statistics
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))


def median_net(fn, probe_out, reps=5, inner=4):
    probe = probe_out()
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
        float(r.sum())
        times.append((time.time() - t0 - readback) / inner)
    med = statistics.median(times)
    spread = (max(times) - min(times)) / med if med > 0 else 0.0
    return med, spread


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="proc:sponza")
    ap.add_argument("--n", type=int, default=1 << 19)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="8x10,8x15",
                    help="comma list of <arity>x<leaf_size> table layouts")
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from gpupathtracer_tpu.config import CameraConfig, RenderConfig
    from gpupathtracer_tpu.math.camera import gen_rays, generate_image_plane
    from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
    from gpupathtracer_tpu.scene import load_scene
    from gpupathtracer_tpu.scene.procedural import default_camera
    from gpupathtracer_tpu.utils.compile_cache import enable_compile_cache
    from gpupathtracer_tpu.utils.morton import ray_order

    enable_compile_cache()
    N, K = args.n, args.k
    variants = []
    for v in args.variants.split(","):
        a, _, l = v.partition("x")
        variants.append((int(a), int(l) if l else 10))
    scenes = {}
    for var in variants:
        arity, leaf = var
        cfg = RenderConfig(scene_path=args.scene,
                           skybox="GENERATE COLOR BLACK",
                           width=64, height=64, cache_enabled=True)
        cfg.wide_arity = arity
        cfg.leaf_size = leaf
        scene, meta = load_scene(cfg)
        rows = scene.bvh.node_rows
        W = scene.bvh.child_entry.shape[0]
        print(f"# {arity}x{leaf}: rows={rows.shape[0]} (internal {W}, "
              f"leaf {rows.shape[0] - W}) "
              f"{rows.size * 4 / 1e6:.1f} MB stack={meta.stack_depth}",
              flush=True)
        scenes[var] = (scene, meta)

    # Shared ray sets (geometry identical across arities).
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

    def run(var, o, d, any_hit=False, with_stats=False):
        scene, meta = scenes[var]
        P = N // K
        return traverse_pallas(
            scene.bvh.node_rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
            jnp.full((P, K), 1e20, jnp.float32), jnp.ones((P, K), bool),
            stack_depth=meta.stack_depth, leaf_size=meta.leaf_size,
            any_hit=any_hit, ordered=not any_hit, arity=var[0],
            with_stats=with_stats)

    # Incoherent set from the first variant's hit points (same for all).
    a0 = variants[0]
    t, prim = run(a0, o_coh, d_coh)[:2]
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

    ref = {}
    for var in scenes:
        for name, (o, d) in rays.items():
            for any_hit in (False, True):
                tag = (f"{var[0]}x{var[1]} {name} "
                       f"{'any' if any_hit else 'closest'}")
                f = lambda o=o, d=d, var=var, any_hit=any_hit: run(
                    var, o, d, any_hit=any_hit)[0 if not any_hit else 1]
                r0 = f()  # compile outside timed region
                # Equivalence vs the first arity's result.
                key = (name, any_hit)
                val = np.asarray(run(var, o, d, any_hit=any_hit)[1])
                if key in ref:
                    same = (np.array_equal(val >= 0, ref[key] >= 0)
                            if any_hit else np.array_equal(val, ref[key]))
                    if not same:
                        diff = int((val != ref[key]).sum())
                        print(f"!! {tag}: prim mismatch on {diff} rays "
                              f"(spatial-split duplicate ties are benign "
                              f"if t matches)", flush=True)
                else:
                    ref[key] = val
                med, spread = median_net(f, lambda: run(a0, o_coh, d_coh)[0],
                                         args.reps)
                line = (f"{tag}: {N / med / 1e6:.2f} Mrays/s "
                        f"(net {med * 1e3:.1f} ms, spread {spread:.1%})")
                if args.stats:
                    st = np.asarray(run(var, o, d, any_hit=any_hit,
                                        with_stats=True)[4])
                    tot = st[:, :2].sum(0)
                    line += (f" | pops node={tot[0]} leaf={tot[1]} "
                             f"ns/pop={med * 1e9 / max(tot.sum(), 1):.0f}")
                print(line, flush=True)


if __name__ == "__main__":
    main()
