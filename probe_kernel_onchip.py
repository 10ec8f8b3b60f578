"""On-chip smoke + timing of the Pallas traversal kernel vs the XLA packet
path, on Sponza-class coherent primaries. Back-to-back same-session timings
(PERF.md measurement protocol)."""
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpupathtracer_tpu.bvh import WideBVH, build_wide_bvh
from gpupathtracer_tpu.bvh.wide import pack_for_packets
from gpupathtracer_tpu.ops.intersect import pack_tri_geom
from gpupathtracer_tpu.ops.pallas_traverse import traverse_pallas
from gpupathtracer_tpu.ops.traverse import closest_hit

print("device:", jax.devices()[0])

if "--skip-small" not in sys.argv:
    rng = np.random.RandomState(7)
    n = 400
    base = rng.uniform(-5, 5, (n, 1, 3))
    offs = rng.uniform(-0.6, 0.6, (n, 3, 3))
    tri = (base + offs).astype(np.float32)
    p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
    wide, stats = build_wide_bvh(p0, p1, p2, leaf_size=4, builder="numpy")
    wide = pack_for_packets(wide, p0, p1 - p0, p2 - p0, 4)
    rows = jnp.asarray(wide.node_rows)
    geom = jnp.asarray(pack_tri_geom(p0, p1 - p0, p2 - p0))
    dev = WideBVH(*((jnp.asarray(a) if a is not None else None) for a in wide))
    depth = stats.max_depth * 7 + 2

    K, P = 128, 4
    N = P * K
    o = rng.uniform(-8, 8, (N, 3)).astype(np.float32)
    tgt = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)
    tmax = jnp.full((N,), 1e20, jnp.float32)

    ref = closest_hit(dev, geom, o, d, tmax, stack_depth=depth)
    t0 = time.time()
    t, prim, u, v = traverse_pallas(
        rows, o.reshape(P, K, 3), d.reshape(P, K, 3),
        tmax.reshape(P, K), jnp.ones((P, K), bool),
        stack_depth=depth, interpret=False)
    t = np.asarray(t)
    print(f"compile+run small: {time.time()-t0:.1f}s")
    np.testing.assert_allclose(t.reshape(N), np.asarray(ref.t), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(prim).reshape(N) < 0,
                                  np.asarray(ref.prim) < 0)
    print("CORRECTNESS: on-chip kernel matches per-ray reference")

# ---- throughput on sponza-class coherent primaries -----------------------
from gpupathtracer_tpu.scene.scenedata import load_scene
from gpupathtracer_tpu.config import CameraConfig, RenderConfig
from gpupathtracer_tpu.math.camera import generate_image_plane, gen_rays
from gpupathtracer_tpu.ops.packet_traverse import closest_hit_packets
from gpupathtracer_tpu.utils.morton import ray_order

cfg = RenderConfig(scene_path="proc:sponza", leaf_size=4,
                   skybox="GENERATE COLOR BLACK", cache_enabled=True)
t0 = time.time()
sd, meta = load_scene(cfg)
print(f"tris {meta.num_triangles}, pack+build: {time.time()-t0:.1f}s, "
      f"rows {sd.bvh.node_rows.shape} "
      f"({sd.bvh.node_rows.size*4/1e6:.1f} MB)")

W, H = 1024, 512
ccfg = CameraConfig(position=(-18.0, 4.5, 0.0), yaw=math.pi / 2, pitch=-0.05,
                    fov=math.radians(60), aspect=W / H)
cam = generate_image_plane(ccfg)
order = ray_order(W, H, "morton")
pix = jnp.asarray(order)
xs = ((pix % W).astype(jnp.float32) + 0.5) / W
ys = ((pix // W).astype(jnp.float32) + 0.5) / H
interp = jnp.stack([xs, ys], axis=-1)
o, d = gen_rays(cam, interp, jnp.zeros((W * H, 2), jnp.float32))
N = W * H
rows = sd.bvh.node_rows
tmaxN = jnp.full((N,), 1e20, jnp.float32)
actN = jnp.ones((N,), bool)

for Kk in (256, 512):
    Pp = N // Kk
    oP = o.reshape(Pp, Kk, 3)
    dP = d.reshape(Pp, Kk, 3)
    tmax = tmaxN.reshape(Pp, Kk)
    act = actN.reshape(Pp, Kk)
    t0 = time.time()
    out = traverse_pallas(rows, oP, dP, tmax, act, stack_depth=96)
    s = float(jnp.sum(out[0]))
    print(f"K={Kk} pallas compile+first: {time.time()-t0:.1f}s (chk {s:.6g})")
    for rep in range(3):
        t0 = time.time()
        out = traverse_pallas(rows, oP, dP, tmax, act, stack_depth=96)
        s = float(jnp.sum(out[0]))
        dt = time.time() - t0
        print(f"K={Kk} pallas run {rep}: {dt*1e3:7.1f} ms -> "
              f"{N/dt/1e6:6.2f} Mrays/s (chk {s:.6g})")

# XLA packet path, same session for comparison
t0 = time.time()
hit = closest_hit_packets(sd.bvh, o, d, tmaxN, actN, stack_depth=96,
                          leaf_size=4)
s = float(jnp.sum(hit.t))
print(f"xla-packet compile+first: {time.time()-t0:.1f}s (chk {s:.6g})")
for rep in range(3):
    t0 = time.time()
    hit = closest_hit_packets(sd.bvh, o, d, tmaxN, actN, stack_depth=96,
                              leaf_size=4)
    s = float(jnp.sum(hit.t))
    dt = time.time() - t0
    print(f"xla-packet run {rep}: {dt*1e3:7.1f} ms -> {N/dt/1e6:6.2f} Mrays/s"
          f" (chk {s:.6g})")
