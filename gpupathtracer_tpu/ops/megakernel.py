"""Megakernel integrator: the WHOLE bounce loop on-core for small scenes.

The reference is a literal megakernel — one persistent-thread compute
shader per sample path (src/shaders/Iterative.comp:214-307). The
wavefront integrator (models/wavefront.py) replays its estimator through
XLA ops between Pallas traversals, which costs ~20 ns/lane/bounce of
HBM-pass glue plus dispatch — measured at ~37% of the bathroom frame
(PERF.md small-scene glue decomposition), the dominant term once the
traversal is fast. This kernel is the TPU-native megakernel: rays,
throughput, and film contribution stay resident in VMEM across ALL
bounces of a packet; shading, NEE, BSDF sampling, and Russian roulette
run as fused VPU arithmetic between the in-kernel stack walks; the only
HBM traffic per packet is the initial rays in and the contribution out.

Scope (checked by `mega_eligible`): untextured materials (constant
albedo — the benchmark configs 1/2/4), constant-color environment, no
delta materials, no sun, <= 64 emitters, <= 64 materials, table pinned
in VMEM. Everything else falls back to the wavefront integrator.

Estimator semantics are the wavefront's exactly (same formulas, cited
there); the per-bounce RNG is the TPU core PRNG (pltpu.prng_*) seeded
per packet instead of threefry — renders are deterministic given
(seed, packet layout) but not bitwise-equal to the wavefront path;
agreement is statistical (tests/test_megakernel.py).

Shading data flows through HIT-TIME CAPTURE: the leaf phase selects the
winning triangle's e1/e2 (for the geometric normal), material id, and
normal sign (bvh/wide.py packs them in the spare tri-slot floats), so
shading needs no gather at all; material/light constants broadcast from
VMEM-resident tables via a static select loop over the scene's <= 64
rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpupathtracer_tpu.bvh.types import INVALID_ENTRY

_INVALID = INVALID_ENTRY
LANES = 128
PI = float(np.pi)

# Reuse the hand-kept 8-key sort network from the traversal kernel.
from gpupathtracer_tpu.ops.pallas_traverse import (VMEM_TABLE_LIMIT,
                                                   _sort_net)


def mega_eligible(scene, meta, *, textured: bool, delta: bool, sun: bool,
                  sampler: str = "random") -> bool:
    """Static gate: can this scene/config run on the megakernel?"""
    env = np.asarray(scene.env.image)
    const_env = (env.size <= 3 * 64
                 and bool((env == env.reshape(-1, 3)[0]).all()))
    cl = getattr(scene.bvh, "cluster_rows", None)
    table_bytes = (scene.bvh.node_rows.size
                   * scene.bvh.node_rows.dtype.itemsize
                   + (cl.size * cl.dtype.itemsize if cl is not None else 0))
    return (not textured and not delta and not sun
            and sampler == "random"
            and const_env
            and meta.num_materials <= 64
            and scene.light_rows.shape[0] <= 64
            and table_bytes <= VMEM_TABLE_LIMIT)


def pack_mega_tables(scene):
    """Material/light constants as 128-lane VMEM rows + SMEM scalars."""
    mats = np.zeros((max(scene.mat_rows.shape[0], 1), LANES), np.float32)
    mats[:, 0:16] = np.asarray(scene.mat_rows)
    lights = np.zeros((max(scene.light_rows.shape[0], 1), LANES),
                      np.float32)
    lights[:, 0:16] = np.asarray(scene.light_rows)
    cdf = np.zeros((max(scene.light_cdf.shape[0], 1),), np.float32)
    cdf[:scene.light_cdf.shape[0]] = np.asarray(scene.light_cdf)
    total = float(scene.total_light_area)
    env = np.asarray(scene.env.image).reshape(-1, 3)[0]
    # [total_area, nee_pdf, env_r, env_g, env_b]
    nee_pdf = 0.5 / total if total > 0 else np.inf
    params = np.asarray([total, nee_pdf, env[0], env[1], env[2]],
                        np.float32)
    return jnp.asarray(mats), jnp.asarray(lights), jnp.asarray(cdf), \
        jnp.asarray(params)


# --- component-form vector math (x/y/z as separate [G, 128] tiles) ----------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _normalize(v, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(_dot(v, v), eps))
    return [c * inv for c in v]


def _scale(v, s):
    return [c * s for c in v]


def _add(a, b):
    return [x + y for x, y in zip(a, b)]


def _sub(a, b):
    return [x - y for x, y in zip(a, b)]


def _where(m, a, b):
    return [jnp.where(m, x, y) for x, y in zip(a, b)]


def _tbn(n):
    """construct_tbn (vecmath.py / Material.glsl:71-76): helper +X when
    |n.y| > 0.99 else +Y; t = normalize(helper x n); b = t x n."""
    use_x = jnp.abs(n[1]) > 0.99
    hx = jnp.where(use_x, 1.0, 0.0)
    hy = jnp.where(use_x, 0.0, 1.0)
    # helper x n with helper = (hx, hy, 0)
    t = _normalize([hy * n[2], -hx * n[2], hx * n[1] - hy * n[0]])
    b = _cross(t, n)
    return t, b


def _mis(top, bottom):
    return 1.0 / (1.0 + bottom / jnp.maximum(top, 1e-30))


def _fresnel(f0, cos_theta):
    x = 1.0 - cos_theta
    x5 = x * x
    x5 = x5 * x5 * x
    return [f + (1.0 - f) * x5 for f in f0]


def _distribution(model, rough, rough2, ndm, ndm2):
    if model == "trowbridge_reitz":
        divisor = (rough2 - 1.0) * ndm2 + 1.0
        return rough2 / jnp.maximum(PI * divisor * divisor, 1e-20)
    if model == "beckmann":
        sub = 2.0 * jnp.log(jnp.sqrt(PI) * rough
                            * jnp.maximum(ndm, 1e-8))
        add = (ndm2 - 1.0) / jnp.maximum(ndm2 * rough2, 1e-20)
        return jnp.exp(add - sub)
    if model == "blinn_phong":
        nb = 2.0 / rough - 2.0
        return ((nb + 1.0) / (2.0 * PI)
                * jnp.exp(jnp.log(jnp.maximum(ndm, 1e-20)) * nb))
    raise ValueError(model)


def _sample_microfacet(model, rough, rough2, r0, r1):
    """Half-vector in tangent space (radius*(sin, cos), z)."""
    if model == "trowbridge_reitz":
        z2 = jnp.maximum((1.0 - r0) / (r0 * (rough2 - 1.0) + 1.0), 0.0)
    elif model == "beckmann":
        g = -rough2 * jnp.log(jnp.maximum(1.0 - r0, 1e-20))
        z2 = 1.0 / (1.0 + g)
    elif model == "blinn_phong":
        nb = 2.0 / rough - 2.0
        z = jnp.exp(jnp.log(jnp.maximum(r0, 1e-20)) / (nb + 1.0))
        z2 = z * z
    else:
        raise ValueError(model)
    z = jnp.sqrt(z2)
    phi = 2.0 * PI * r1
    radius = jnp.sqrt(jnp.maximum(1.0 - z2, 0.0))
    return [radius * jnp.sin(phi), radius * jnp.cos(phi), z]


def _vis_ggx(rough2, ndx):
    return 1.0 / jnp.maximum(
        ndx + jnp.sqrt(rough2 * (1.0 - rough2) * ndx * ndx), 1e-5)


def _mega_kernel(seed_ref, params_ref, cdf_ref,
                 in0_ref, in1_ref, act_ref,
                 rows_ref, mats_ref, lights_ref, cl_ref,
                 contrib_out, rays_out,
                 stack, sp_ref, ctr,
                 st_o, st_d, st_tp, st_ct, st_lp,
                 st_pdf0, st_pdf1, st_alive,
                 cap_t, cap_prim, cap_e1, cap_e2, cap_ms,
                 st_bounce, st_sample,
                 stack_b, occl, sh_o, sh_d, sh_add, sh_tmax, sh_live,
                 *, stack_depth: int, leaf_size: int, max_bounces: int,
                 nee: bool, model: str, n_mats: int, n_lights: int,
                 arity: int = 8, cluster: bool = False, tc: int = 0,
                 with_stats: bool = False, tail_start: int = 8,
                 spp: int = 1, regen: bool = False,
                 fused_nee: bool = False):
    """One packet; the full path-tracing estimator per lane.

    seed: SMEM (P,); params: SMEM (5,) [total_area, nee_pdf, env rgb];
    cdf: SMEM (L,). in0/in1: ray o/d as [3, G, 128] VMEM blocks (regen
    False) or normalized pixel coords px/w, py/h as [G, 128] (regen
    True); act: [G, 128].
    contrib_out: [3, G, 128]; rays_out: [1, 128] i32 (lane 0 = bounce
    rays, lane 1 = live shadow rays — the honest Mrays/s numerators).
    State scratch: st_* as in the wavefront Carry; cap_* hit capture
    (cap_ms packs [mat_id (int bits), nsign] as 2 G-rows: [2, G, 128]).

    regen/spp: IN-KERNEL PATH REGENERATION — the TPU-native analogue of
    the reference's persistent-threads atomic path pool
    (Iterative.comp:214-307 + the pool dispatch, Renderer.cpp): when a
    lane's path dies (miss or Russian roulette), the lane immediately
    starts the NEXT sample of the SAME pixel — thin-lens raygen
    (Camera.cpp:58-69 semantics) runs on-core from the camera scalars in
    params[5:26]. Packets therefore stay ~full-live for all spp samples
    where the plain loop decays to a dead-lane tail (measured: ALL
    bathroom packets run the full 66 bounce iterations while RR thins
    lanes — 922 pops/packet vs the ~362 full-live ideal,
    tools/mega_profile.py). Each lane runs its own (sample, bounce)
    state; RNG is keyed per (seed, sample, bounce, slot, lane), so
    renders stay deterministic given (seed, packet layout).

    fused_nee: DEFERRED-SHADOW FUSION — each bounce's NEE shadow ray is
    stored (sh_* scratch) instead of walked immediately, and the NEXT
    bounce's closest walk runs it as the partner stream of a fused
    two-stack walk (walk_fused): one pl.when region per
    (closest_phase, anyhit_phase) pair, the _kernel_pair schedule
    (PERF.md round-5 fused-pair adjudication — the sync share of the
    minority walk's pops retires under the partner's slab/MT vector
    work). Estimator-identical: the deferred contribution is added one
    loop iteration later; any-hit pops are ~40% of the megakernel pop
    wall (tools/mega_profile.py), so the ceiling is that share of pop
    time. Not composable with cluster.

    cluster: rows_ref is the cluster TOP tree and cl_ref holds the dense
    [Ncl*8, 3*tc] inverse-matrix blocks (bvh/cluster.py). Leaf pops run
    the MXU dense epilogue; the winner's shading data comes back through
    ONE one-hot [4, tc] x [tc, 128] matmul per ray tile — rows 0:3 are
    the stored C rows (parallel to e1 x e2, so no extra normal storage),
    row 3 the signed material float (mat_id + 1) * nsign. cap_e1 then
    holds the C vector and cap_ms[0] the signed material; cap_e2 and
    cap_ms[1] are unused.
    """
    G = in0_ref.shape[0] if regen else in0_ref.shape[1]
    pid = pl.program_id(0)
    seed = seed_ref[pid]

    total_area = params_ref[0]
    nee_pdf = params_ref[1]

    # Counter-based lowbias32 hash RNG on (seed, bounce, draw slot, lane):
    # plain integer ops, so the SAME stream lowers on the TPU core and in
    # interpret mode (pltpu.prng_* has no CPU lowering) — renders are
    # bitwise-identical across platforms given (seed, packet layout).
    # Same hash family as math/sampling.pixel_rotation; the [0,1) value
    # keeps the repo's 24-bit truncation contract (sampling.py:85-92).
    lane32 = (jax.lax.broadcasted_iota(jnp.int32, (G, LANES), 0) * LANES
              + jax.lax.broadcasted_iota(jnp.int32, (G, LANES), 1)
              ).astype(jnp.uint32)

    def uni(sample, bounce, slot: int):
        # Keyed per (seed, sample, bounce, slot, lane); the sample term
        # is 0 on the non-regen path, so that stream matches the
        # pre-regen kernel exactly. sample/bounce may be [G, LANES]
        # vectors (regen: every lane at its own sample/bounce).
        s = (seed.astype(jnp.uint32)
             + (bounce + 1).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
             + sample.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
             + jnp.uint32((slot * 0x85EBCA6B) & 0xFFFFFFFF))
        x = lane32 ^ s
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        # Mosaic has no uint32 -> float32 cast (measured on-chip,
        # cluster_tpu_smoke r4 s2); x >> 8 < 2^24 so the int32 view is
        # value-identical and int32 -> f32 lowers fine.
        x24 = jax.lax.bitcast_convert_type(x >> 8, jnp.int32)
        return x24.astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)

    # --- state init --------------------------------------------------------
    for a in range(3):
        if regen:
            st_o[a] = jnp.zeros((G, LANES), jnp.float32)
            st_d[a] = jnp.zeros((G, LANES), jnp.float32)
            st_lp[a] = jnp.zeros((G, LANES), jnp.float32)
        else:
            st_o[a] = in0_ref[a]
            st_d[a] = in1_ref[a]
            st_lp[a] = in0_ref[a]
        st_tp[a] = jnp.ones((G, LANES), jnp.float32)
        st_ct[a] = jnp.zeros((G, LANES), jnp.float32)
    st_pdf0[...] = jnp.ones((G, LANES), jnp.float32)
    st_pdf1[...] = jnp.ones((G, LANES), jnp.float32)
    st_bounce[...] = jnp.zeros((G, LANES), jnp.int32)
    if regen:
        # Every lane starts dead awaiting its first regeneration.
        st_alive[...] = jnp.zeros((G, LANES), jnp.int32)
        st_sample[...] = jnp.full((G, LANES), -1, jnp.int32)
    else:
        st_alive[...] = act_ref[...].astype(jnp.int32)
        st_sample[...] = jnp.zeros((G, LANES), jnp.int32)
    ctr[0] = 0  # bounce rays traced
    ctr[1] = 0  # live shadow rays traced
    if fused_nee:
        sh_live[...] = jnp.zeros((G, LANES), jnp.int32)
        sh_tmax[...] = jnp.zeros((G, LANES), jnp.float32)
        for a in range(3):
            sh_o[a] = jnp.zeros((G, LANES), jnp.float32)
            sh_d[a] = jnp.full((G, LANES), 1.0 if a == 2 else 0.0,
                               jnp.float32)
            sh_add[a] = jnp.zeros((G, LANES), jnp.float32)
    if with_stats:
        # [2] closest node pops, [3] closest leaf pops, [4] anyhit node,
        # [5] anyhit leaf, [6] closest pops at bounce >= tail_start,
        # [7] anyhit pops at bounce >= tail_start (the dead-tail share).
        for k in range(2, 8):
            ctr[k] = 0

    # --- in-kernel traversal walks ----------------------------------------
    def walk_closest(o, d, on, bounce_i=None):
        """Ordered closest-hit stack walk; writes cap_* refs."""
        inv = [jnp.where(d[a] >= 0, 1.0, -1.0)
               / jnp.maximum(jnp.abs(d[a]), 1e-12) for a in range(3)]
        oi = [o[a] * inv[a] for a in range(3)]
        cap_t[...] = jnp.full((G, LANES), 1e20, jnp.float32)
        cap_prim[...] = jnp.full((G, LANES), -1, jnp.int32)
        cap_e1[0] = jnp.ones((G, LANES), jnp.float32)
        cap_e1[1] = jnp.zeros((G, LANES), jnp.float32)
        cap_e1[2] = jnp.zeros((G, LANES), jnp.float32)
        cap_e2[0] = jnp.zeros((G, LANES), jnp.float32)
        cap_e2[1] = jnp.ones((G, LANES), jnp.float32)
        cap_e2[2] = jnp.zeros((G, LANES), jnp.float32)
        cap_ms[0] = jnp.zeros((G, LANES), jnp.float32)
        cap_ms[1] = jnp.ones((G, LANES), jnp.float32)

        any_on = jnp.sum(jnp.where(on, 1, 0)) > 0
        stack[0] = 0

        def body(sp):
            entry = stack[sp - 1]
            sp = sp - 1
            is_leaf = entry < 0
            packed = jnp.where(is_leaf, -(entry + 1), 0)
            if cluster:
                # Leaf entries index cl_ref, not rows_ref: clamp the node
                # row fetch (cluster counts can exceed top-tree rows).
                ridx = jnp.where(is_leaf, 0, jnp.maximum(entry, 0))
            else:
                ridx = jnp.where(is_leaf, packed >> 4,
                                 jnp.maximum(entry, 0))
            row = rows_ref[pl.ds(ridx, 1), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rowG = pltpu.repeat(row, G, axis=0) if G > 1 else row
            rowGi = jax.lax.bitcast_convert_type(rowG, jnp.int32)
            sp_ref[0] = sp
            if with_stats:
                isl = jnp.where(is_leaf, 1, 0)
                ctr[2] = ctr[2] + (1 - isl)
                ctr[3] = ctr[3] + isl
                ctr[6] = ctr[6] + jnp.where(bounce_i >= tail_start, 1, 0)

            @pl.when(jnp.logical_not(is_leaf))
            def _():
                t_cur = cap_t[...]
                hits, tmins = [], []
                for j in range(arity):
                    tmin = None
                    tmax_ = None
                    for a in range(3):
                        lo = rowG[:, j * 6 + a:j * 6 + a + 1]
                        hi = rowG[:, j * 6 + 3 + a:j * 6 + 4 + a]
                        t0 = lo * inv[a] - oi[a]
                        t1 = hi * inv[a] - oi[a]
                        lo_t = jnp.minimum(t0, t1)
                        hi_t = jnp.maximum(t0, t1)
                        tmin = (lo_t if tmin is None
                                else jnp.maximum(tmin, lo_t))
                        tmax_ = (hi_t if tmax_ is None
                                 else jnp.minimum(tmax_, hi_t))
                    hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                                & (tmin < t_cur) & on)
                    tmins.append(tmin)
                h8 = jnp.stack(hits)
                t8 = jnp.stack(tmins)
                keyv = jnp.min(jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                               axis=1, keepdims=True)
                pairs = []
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    k = jnp.where(centry == _INVALID, jnp.inf, keyv[j, 0])
                    pairs.append((k, centry))
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
                new_sp = sp
                for k, centry in pairs:
                    pushed = k < jnp.inf
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp

            if cluster:
                @pl.when(is_leaf)
                def _():
                    cidx = packed >> 4
                    blk = cl_ref[pl.ds(cidx * 8, 8), :]   # [8, 3*tc]
                    wd = blk[0:3, :]
                    wo4 = blk[3:7, :]
                    # Capture operand: C rows (parallel to e1 x e2) + the
                    # signed material float — one matmul per ray tile.
                    capop = jnp.concatenate(
                        [wd[:, 2 * tc:3 * tc], blk[7:8, 0:tc]], axis=0)
                    ones = jnp.ones((1, LANES), jnp.float32)
                    subi = jax.lax.broadcasted_iota(jnp.int32, (tc, LANES),
                                                    0)
                    dn = (((0,), (0,)), ((), ()))
                    dnc = (((1,), (0,)), ((), ()))
                    for g in range(G):
                        dg = jnp.concatenate(
                            [d[a][g:g + 1, :] for a in range(3)], axis=0)
                        og4 = jnp.concatenate(
                            [o[a][g:g + 1, :] for a in range(3)] + [ones],
                            axis=0)
                        md = jax.lax.dot_general(
                            wd, dg, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                        mo = jax.lax.dot_general(
                            wo4, og4, dn,
                            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                        da = md[0:tc]
                        db = md[tc:2 * tc]
                        dc = md[2 * tc:3 * tc]
                        oa = mo[0:tc]
                        ob = mo[tc:2 * tc]
                        num = mo[2 * tc:3 * tc]
                        t = num / dc
                        uu = oa + t * da
                        vv = ob + t * db
                        tb = cap_t[g:g + 1, :]
                        on_g = on[g:g + 1, :]
                        # t<tb / activity mask on the [1,128] reduced
                        # result, not per pair (see _kernel_cluster): the
                        # argmin winner is identical and writes are
                        # masked — two fewer [tc,128] passes per pop.
                        valid = ((uu > 0.0) & (vv > 0.0) & (uu + vv < 1.0)
                                 & (t > 0.0))
                        score = jnp.where(valid, t, jnp.inf)
                        tmin = jnp.min(score, axis=0, keepdims=True)
                        improved = (tmin < tb) & on_g
                        sel = score <= tmin
                        idx = jnp.min(jnp.where(sel, subi, tc), axis=0,
                                      keepdims=True)
                        onef = jnp.where(sel & (subi == idx), 1.0, 0.0)
                        cap = jax.lax.dot_general(
                            capop, onef, dnc,
                            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)  # [4, 128]
                        cap_t[g:g + 1, :] = jnp.where(improved, tmin, tb)
                        cap_prim[g:g + 1, :] = jnp.where(
                            improved, cidx * tc + idx,
                            cap_prim[g:g + 1, :])
                        for a in range(3):
                            cap_e1[a, g:g + 1, :] = jnp.where(
                                improved, cap[a:a + 1],
                                cap_e1[a, g:g + 1, :])
                        cap_ms[0, g:g + 1, :] = jnp.where(
                            improved, cap[3:4], cap_ms[0, g:g + 1, :])
            else:
                @pl.when(is_leaf)
                def _():
                    count = packed & 15
                    t_c = cap_t[...]
                    p_c = cap_prim[...]
                    e1c = [cap_e1[a] for a in range(3)]
                    e2c = [cap_e2[a] for a in range(3)]
                    mc = cap_ms[0]
                    sc = cap_ms[1]
                    for k in range(leaf_size):
                        b = k * 12
                        p0 = [rowG[:, b + a:b + a + 1] for a in range(3)]
                        e1 = [rowG[:, b + 3 + a:b + 4 + a]
                              for a in range(3)]
                        e2 = [rowG[:, b + 6 + a:b + 7 + a]
                              for a in range(3)]
                        pid_ = rowGi[:, b + 9:b + 10]
                        mat_f = rowG[:, b + 10:b + 11]
                        sgn = rowG[:, b + 11:b + 12]
                        px = d[1] * e2[2] - d[2] * e2[1]
                        py = d[2] * e2[0] - d[0] * e2[2]
                        pz = d[0] * e2[1] - d[1] * e2[0]
                        det = e1[0] * px + e1[1] * py + e1[2] * pz
                        idet = 1.0 / det
                        tx = o[0] - p0[0]
                        ty = o[1] - p0[1]
                        tz = o[2] - p0[2]
                        uu = (tx * px + ty * py + tz * pz) * idet
                        qx = ty * e1[2] - tz * e1[1]
                        qy = tz * e1[0] - tx * e1[2]
                        qz = tx * e1[1] - ty * e1[0]
                        vv = (d[0] * qx + d[1] * qy + d[2] * qz) * idet
                        tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                        ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                              & (uu + vv < 1.0) & (tt > 0.0) & (tt < t_c)
                              & on & (k < count))
                        t_c = jnp.where(ok, tt, t_c)
                        p_c = jnp.where(ok, pid_, p_c)
                        for a in range(3):
                            e1c[a] = jnp.where(ok, e1[a], e1c[a])
                            e2c[a] = jnp.where(ok, e2[a], e2c[a])
                        mc = jnp.where(ok, mat_f, mc)
                        sc = jnp.where(ok, sgn, sc)
                    cap_t[...] = t_c
                    cap_prim[...] = p_c
                    for a in range(3):
                        cap_e1[a] = e1c[a]
                        cap_e2[a] = e2c[a]
                    cap_ms[0] = mc
                    cap_ms[1] = sc

            return sp_ref[0]

        sp0 = jnp.where(any_on, 1, 0)
        jax.lax.while_loop(lambda sp: sp > 0, body, sp0)

    def walk_anyhit(o, d, tmax, on, bounce_i=None):
        """Unordered any-hit walk (occlusion): returns nothing; uses
        cap_prim as the hit flag buffer (>= 0 means occluded)."""
        inv = [jnp.where(d[a] >= 0, 1.0, -1.0)
               / jnp.maximum(jnp.abs(d[a]), 1e-12) for a in range(3)]
        oi = [o[a] * inv[a] for a in range(3)]
        cap_prim[...] = jnp.full((G, LANES), -1, jnp.int32)

        any_on = jnp.sum(jnp.where(on, 1, 0)) > 0
        stack[0] = 0

        def body(sp):
            entry = stack[sp - 1]
            sp = sp - 1
            is_leaf = entry < 0
            packed = jnp.where(is_leaf, -(entry + 1), 0)
            if cluster:
                ridx = jnp.where(is_leaf, 0, jnp.maximum(entry, 0))
            else:
                ridx = jnp.where(is_leaf, packed >> 4,
                                 jnp.maximum(entry, 0))
            row = rows_ref[pl.ds(ridx, 1), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rowG = pltpu.repeat(row, G, axis=0) if G > 1 else row
            rowGi = jax.lax.bitcast_convert_type(rowG, jnp.int32)
            sp_ref[0] = sp
            if with_stats:
                isl = jnp.where(is_leaf, 1, 0)
                ctr[4] = ctr[4] + (1 - isl)
                ctr[5] = ctr[5] + isl
                ctr[7] = ctr[7] + jnp.where(bounce_i >= tail_start, 1, 0)
            rays_on = on & (cap_prim[...] < 0)

            @pl.when(jnp.logical_not(is_leaf))
            def _():
                hits = []
                for j in range(arity):
                    tmin = None
                    tmax_ = None
                    for a in range(3):
                        lo = rowG[:, j * 6 + a:j * 6 + a + 1]
                        hi = rowG[:, j * 6 + 3 + a:j * 6 + 4 + a]
                        t0 = lo * inv[a] - oi[a]
                        t1 = hi * inv[a] - oi[a]
                        lo_t = jnp.minimum(t0, t1)
                        hi_t = jnp.maximum(t0, t1)
                        tmin = (lo_t if tmin is None
                                else jnp.maximum(tmin, lo_t))
                        tmax_ = (hi_t if tmax_ is None
                                 else jnp.minimum(tmax_, hi_t))
                    hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                                & (tmin < tmax) & rays_on)
                # Unordered: ONE packed-bitmask sync (2.9x for occlusion,
                # PERF.md any-hit ordering A/B).
                h8 = jnp.stack(hits).astype(jnp.int32)
                cnt = jnp.sum(jnp.sum(h8, axis=2), axis=1, keepdims=True)
                w = jnp.left_shift(1, jax.lax.broadcasted_iota(
                    jnp.int32, (arity, 1), 0))
                bits = jnp.sum(jnp.where(cnt > 0, w, 0))
                new_sp = sp
                for j in range(arity):
                    centry = row_i[0, 6 * arity + j]
                    pushed = ((jax.lax.shift_right_logical(bits, j) & 1 > 0)
                              & (centry != _INVALID))
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp

            if cluster:
                @pl.when(is_leaf)
                def _():
                    cidx = packed >> 4
                    blk = cl_ref[pl.ds(cidx * 8, 8), :]
                    wd = blk[0:3, :]
                    wo4 = blk[3:7, :]
                    ones = jnp.ones((1, LANES), jnp.float32)
                    dn = (((0,), (0,)), ((), ()))
                    for g in range(G):
                        dg = jnp.concatenate(
                            [d[a][g:g + 1, :] for a in range(3)], axis=0)
                        og4 = jnp.concatenate(
                            [o[a][g:g + 1, :] for a in range(3)] + [ones],
                            axis=0)
                        md = jax.lax.dot_general(
                            wd, dg, dn, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                        mo = jax.lax.dot_general(
                            wo4, og4, dn,
                            preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                        t = mo[2 * tc:3 * tc] / md[2 * tc:3 * tc]
                        uu = mo[0:tc] + t * md[0:tc]
                        vv = mo[tc:2 * tc] + t * md[tc:2 * tc]
                        tm_g = tmax[g:g + 1, :]
                        on_g = rays_on[g:g + 1, :]
                        # Occluded iff min valid t < tmax — the per-pair
                        # t<tm_g / mask passes collapse onto the [1,128]
                        # reduced result (see _kernel_cluster).
                        valid = ((uu > 0.0) & (vv > 0.0) & (uu + vv < 1.0)
                                 & (t > 0.0))
                        tmin = jnp.min(jnp.where(valid, t, jnp.inf),
                                       axis=0, keepdims=True)
                        hit = (tmin < tm_g) & on_g
                        cap_prim[g:g + 1, :] = jnp.where(
                            hit, 0, cap_prim[g:g + 1, :])
            else:
                @pl.when(is_leaf)
                def _():
                    count = packed & 15
                    p_c = cap_prim[...]
                    for k in range(leaf_size):
                        b = k * 12
                        p0 = [rowG[:, b + a:b + a + 1] for a in range(3)]
                        e1 = [rowG[:, b + 3 + a:b + 4 + a]
                              for a in range(3)]
                        e2 = [rowG[:, b + 6 + a:b + 7 + a]
                              for a in range(3)]
                        pid_ = rowGi[:, b + 9:b + 10]
                        px = d[1] * e2[2] - d[2] * e2[1]
                        py = d[2] * e2[0] - d[0] * e2[2]
                        pz = d[0] * e2[1] - d[1] * e2[0]
                        det = e1[0] * px + e1[1] * py + e1[2] * pz
                        idet = 1.0 / det
                        tx = o[0] - p0[0]
                        ty = o[1] - p0[1]
                        tz = o[2] - p0[2]
                        uu = (tx * px + ty * py + tz * pz) * idet
                        qx = ty * e1[2] - tz * e1[1]
                        qy = tz * e1[0] - tx * e1[2]
                        qz = tx * e1[1] - ty * e1[0]
                        vv = (d[0] * qx + d[1] * qy + d[2] * qz) * idet
                        tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                        ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                              & (uu + vv < 1.0) & (tt > 0.0) & (tt < tmax)
                              & rays_on & (k < count))
                        p_c = jnp.where(ok, pid_, p_c)
                    cap_prim[...] = p_c

            sp = sp_ref[0]
            done = jnp.sum((on & (cap_prim[...] < 0))
                           .astype(jnp.int32)) == 0
            return jnp.where(done, 0, sp)

        sp0 = jnp.where(any_on, 1, 0)
        jax.lax.while_loop(lambda sp: sp > 0, body, sp0)

    def walk_fused(o, d, on_c, so, sd, stmax, on_a, bounce_i=None):
        """Fused closest (this bounce) + any-hit (deferred shadow) walk.

        Two independent stack walks, ONE pl.when region per
        (closest_phase, anyhit_phase) combination so each stream's
        vector->scalar sync (~125-250 ns of the 460 ns pop, PERF.md MFU
        account) retires under the partner's slab/MT vector work — the
        _kernel_pair schedule applied across walk TYPES. Pops, order,
        and results are identical to walk_closest + walk_anyhit run
        serially; only the schedule changes. Closest side writes cap_*;
        any-hit side writes occl (>= 0 means occluded). A drained side
        flows through whichever region its stale top-of-stack selects,
        fully masked (the _kernel_pair tail protocol)."""
        inv_c = [jnp.where(d[a] >= 0, 1.0, -1.0)
                 / jnp.maximum(jnp.abs(d[a]), 1e-12) for a in range(3)]
        oi_c = [o[a] * inv_c[a] for a in range(3)]
        inv_a = [jnp.where(sd[a] >= 0, 1.0, -1.0)
                 / jnp.maximum(jnp.abs(sd[a]), 1e-12) for a in range(3)]
        oi_a = [so[a] * inv_a[a] for a in range(3)]
        cap_t[...] = jnp.full((G, LANES), 1e20, jnp.float32)
        cap_prim[...] = jnp.full((G, LANES), -1, jnp.int32)
        cap_e1[0] = jnp.ones((G, LANES), jnp.float32)
        cap_e1[1] = jnp.zeros((G, LANES), jnp.float32)
        cap_e1[2] = jnp.zeros((G, LANES), jnp.float32)
        cap_e2[0] = jnp.zeros((G, LANES), jnp.float32)
        cap_e2[1] = jnp.ones((G, LANES), jnp.float32)
        cap_e2[2] = jnp.zeros((G, LANES), jnp.float32)
        cap_ms[0] = jnp.zeros((G, LANES), jnp.float32)
        cap_ms[1] = jnp.ones((G, LANES), jnp.float32)
        occl[...] = jnp.full((G, LANES), -1, jnp.int32)

        stack[0] = 0
        stack_b[0] = 0
        sp_c0 = jnp.where(jnp.sum(jnp.where(on_c, 1, 0)) > 0, 1, 0)
        sp_a0 = jnp.where(jnp.sum(jnp.where(on_a, 1, 0)) > 0, 1, 0)
        sp_ref[0] = sp_c0
        sp_ref[1] = sp_a0

        def body(tot):
            del tot
            sp_c = sp_ref[0]
            have_c = sp_c > 0
            entry_c = stack[jnp.maximum(sp_c - 1, 0)]
            sp_ref[0] = jnp.where(have_c, sp_c - 1, sp_c)
            leaf_c = have_c & (entry_c < 0)
            packed_c = jnp.where(leaf_c, -(entry_c + 1), 0)
            ridx_c = jnp.where(leaf_c, packed_c >> 4,
                               jnp.maximum(entry_c, 0))
            ridx_c = jnp.where(have_c, ridx_c, 0)

            sp_a = sp_ref[1]
            have_a = sp_a > 0
            entry_a = stack_b[jnp.maximum(sp_a - 1, 0)]
            sp_ref[1] = jnp.where(have_a, sp_a - 1, sp_a)
            leaf_a = have_a & (entry_a < 0)
            packed_a = jnp.where(leaf_a, -(entry_a + 1), 0)
            ridx_a = jnp.where(leaf_a, packed_a >> 4,
                               jnp.maximum(entry_a, 0))
            ridx_a = jnp.where(have_a, ridx_a, 0)

            row_c = rows_ref[pl.ds(ridx_c, 1), :]
            row_ci = jax.lax.bitcast_convert_type(row_c, jnp.int32)
            rowGc = pltpu.repeat(row_c, G, axis=0) if G > 1 else row_c
            rowGci = jax.lax.bitcast_convert_type(rowGc, jnp.int32)
            row_a = rows_ref[pl.ds(ridx_a, 1), :]
            row_ai = jax.lax.bitcast_convert_type(row_a, jnp.int32)
            rowGa = pltpu.repeat(row_a, G, axis=0) if G > 1 else row_a
            rowGai = jax.lax.bitcast_convert_type(rowGa, jnp.int32)

            if with_stats:
                hc = have_c.astype(jnp.int32)
                lc = leaf_c.astype(jnp.int32)
                ha = have_a.astype(jnp.int32)
                la = leaf_a.astype(jnp.int32)
                ctr[2] = ctr[2] + hc - lc
                ctr[3] = ctr[3] + lc
                ctr[4] = ctr[4] + ha - la
                ctr[5] = ctr[5] + la
                tails = jnp.where(bounce_i >= tail_start, 1, 0)
                ctr[6] = ctr[6] + hc * tails
                ctr[7] = ctr[7] + ha * tails

            rays_on_a = on_a & (occl[...] < 0) & have_a
            onc = on_c & have_c

            def node_c_vec():
                t_cur = cap_t[...]
                hits, tmins = [], []
                for j in range(arity):
                    tmin = None
                    tmax_ = None
                    for a in range(3):
                        lo = rowGc[:, j * 6 + a:j * 6 + a + 1]
                        hi = rowGc[:, j * 6 + 3 + a:j * 6 + 4 + a]
                        t0 = lo * inv_c[a] - oi_c[a]
                        t1 = hi * inv_c[a] - oi_c[a]
                        lo_t = jnp.minimum(t0, t1)
                        hi_t = jnp.maximum(t0, t1)
                        tmin = (lo_t if tmin is None
                                else jnp.maximum(tmin, lo_t))
                        tmax_ = (hi_t if tmax_ is None
                                 else jnp.minimum(tmax_, hi_t))
                    hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                                & (tmin < t_cur) & onc)
                    tmins.append(tmin)
                h8 = jnp.stack(hits)
                t8 = jnp.stack(tmins)
                return jnp.min(
                    jnp.min(jnp.where(h8, t8, jnp.inf), axis=2),
                    axis=1, keepdims=True)

            def node_c_scalar(keyv):
                pairs = []
                for j in range(arity):
                    centry = row_ci[0, 6 * arity + j]
                    k = jnp.where(centry == _INVALID, jnp.inf, keyv[j, 0])
                    pairs.append((k, centry))
                for a, b in _sort_net(arity):
                    ka, ea = pairs[a]
                    kb, eb = pairs[b]
                    swap = ka < kb
                    pairs[a] = (jnp.where(swap, kb, ka),
                                jnp.where(swap, eb, ea))
                    pairs[b] = (jnp.where(swap, ka, kb),
                                jnp.where(swap, ea, eb))
                new_sp = sp_ref[0]
                for k, centry in pairs:
                    pushed = (k < jnp.inf) & have_c
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack[idx] = jnp.where(pushed, centry, stack[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[0] = new_sp

            def leaf_c_body():
                count = packed_c & 15
                t_c = cap_t[...]
                p_c = cap_prim[...]
                e1c = [cap_e1[a] for a in range(3)]
                e2c = [cap_e2[a] for a in range(3)]
                mc = cap_ms[0]
                sc = cap_ms[1]
                for k in range(leaf_size):
                    b = k * 12
                    p0 = [rowGc[:, b + a:b + a + 1] for a in range(3)]
                    e1 = [rowGc[:, b + 3 + a:b + 4 + a] for a in range(3)]
                    e2 = [rowGc[:, b + 6 + a:b + 7 + a] for a in range(3)]
                    pid_ = rowGci[:, b + 9:b + 10]
                    mat_f = rowGc[:, b + 10:b + 11]
                    sgn = rowGc[:, b + 11:b + 12]
                    px = d[1] * e2[2] - d[2] * e2[1]
                    py = d[2] * e2[0] - d[0] * e2[2]
                    pz = d[0] * e2[1] - d[1] * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    idet = 1.0 / det
                    tx = o[0] - p0[0]
                    ty = o[1] - p0[1]
                    tz = o[2] - p0[2]
                    uu = (tx * px + ty * py + tz * pz) * idet
                    qx = ty * e1[2] - tz * e1[1]
                    qy = tz * e1[0] - tx * e1[2]
                    qz = tx * e1[1] - ty * e1[0]
                    vv = (d[0] * qx + d[1] * qy + d[2] * qz) * idet
                    tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                    ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                          & (uu + vv < 1.0) & (tt > 0.0) & (tt < t_c)
                          & onc & (k < count))
                    t_c = jnp.where(ok, tt, t_c)
                    p_c = jnp.where(ok, pid_, p_c)
                    for a in range(3):
                        e1c[a] = jnp.where(ok, e1[a], e1c[a])
                        e2c[a] = jnp.where(ok, e2[a], e2c[a])
                    mc = jnp.where(ok, mat_f, mc)
                    sc = jnp.where(ok, sgn, sc)
                cap_t[...] = t_c
                cap_prim[...] = p_c
                for a in range(3):
                    cap_e1[a] = e1c[a]
                    cap_e2[a] = e2c[a]
                cap_ms[0] = mc
                cap_ms[1] = sc

            def node_a_vec():
                hits = []
                for j in range(arity):
                    tmin = None
                    tmax_ = None
                    for a in range(3):
                        lo = rowGa[:, j * 6 + a:j * 6 + a + 1]
                        hi = rowGa[:, j * 6 + 3 + a:j * 6 + 4 + a]
                        t0 = lo * inv_a[a] - oi_a[a]
                        t1 = hi * inv_a[a] - oi_a[a]
                        lo_t = jnp.minimum(t0, t1)
                        hi_t = jnp.maximum(t0, t1)
                        tmin = (lo_t if tmin is None
                                else jnp.maximum(tmin, lo_t))
                        tmax_ = (hi_t if tmax_ is None
                                 else jnp.minimum(tmax_, hi_t))
                    hits.append((tmin <= tmax_) & (tmax_ > 0.0)
                                & (tmin < stmax) & rays_on_a)
                h8 = jnp.stack(hits).astype(jnp.int32)
                return jnp.sum(jnp.sum(h8, axis=2), axis=1, keepdims=True)

            def node_a_scalar(cnt):
                w = jnp.left_shift(1, jax.lax.broadcasted_iota(
                    jnp.int32, (arity, 1), 0))
                bits = jnp.sum(jnp.where(cnt > 0, w, 0))
                new_sp = sp_ref[1]
                for j in range(arity):
                    centry = row_ai[0, 6 * arity + j]
                    pushed = ((jax.lax.shift_right_logical(bits, j) & 1
                               > 0) & (centry != _INVALID))
                    idx = jnp.minimum(new_sp, stack_depth - 1)
                    stack_b[idx] = jnp.where(pushed, centry, stack_b[idx])
                    new_sp = new_sp + jnp.where(pushed, 1, 0)
                sp_ref[1] = new_sp

            def leaf_a_body():
                count = packed_a & 15
                p_c = occl[...]
                for k in range(leaf_size):
                    b = k * 12
                    p0 = [rowGa[:, b + a:b + a + 1] for a in range(3)]
                    e1 = [rowGa[:, b + 3 + a:b + 4 + a] for a in range(3)]
                    e2 = [rowGa[:, b + 6 + a:b + 7 + a] for a in range(3)]
                    pid_ = rowGai[:, b + 9:b + 10]
                    px = sd[1] * e2[2] - sd[2] * e2[1]
                    py = sd[2] * e2[0] - sd[0] * e2[2]
                    pz = sd[0] * e2[1] - sd[1] * e2[0]
                    det = e1[0] * px + e1[1] * py + e1[2] * pz
                    idet = 1.0 / det
                    tx = so[0] - p0[0]
                    ty = so[1] - p0[1]
                    tz = so[2] - p0[2]
                    uu = (tx * px + ty * py + tz * pz) * idet
                    qx = ty * e1[2] - tz * e1[1]
                    qy = tz * e1[0] - tx * e1[2]
                    qz = tx * e1[1] - ty * e1[0]
                    vv = (sd[0] * qx + sd[1] * qy + sd[2] * qz) * idet
                    tt = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * idet
                    ok = ((uu > 0.0) & (uu < 1.0) & (vv > 0.0)
                          & (uu + vv < 1.0) & (tt > 0.0) & (tt < stmax)
                          & rays_on_a & (k < count))
                    p_c = jnp.where(ok, pid_, p_c)
                occl[...] = p_c

            # ONE region per phase pair: both streams' vector work issues
            # before either stream's scalar sync (_kernel_pair layout).
            for lc in (False, True):
                for la in (False, True):
                    cond = (leaf_c == lc) & (leaf_a == la)

                    @pl.when(cond)
                    def _(lc=lc, la=la):
                        kv = None
                        cnt = None
                        if lc:
                            leaf_c_body()
                        else:
                            kv = node_c_vec()
                        if la:
                            leaf_a_body()
                        else:
                            cnt = node_a_vec()
                        if not lc:
                            node_c_scalar(kv)
                        if not la:
                            node_a_scalar(cnt)

            sp_a2 = sp_ref[1]
            done_a = jnp.sum((on_a & (occl[...] < 0))
                             .astype(jnp.int32)) == 0
            sp_ref[1] = jnp.where(done_a, 0, sp_a2)
            return sp_ref[0] + sp_ref[1]

        jax.lax.while_loop(lambda t: t > 0, body, sp_c0 + sp_a0)

    # --- material / light table broadcast select ---------------------------
    def mat_fields(mid):
        """Albedo, rough_g, metallic, emission via static select loop."""
        alb = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        emi = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        g = jnp.zeros((G, LANES), jnp.float32)
        metal = jnp.zeros((G, LANES), jnp.float32)
        for m in range(n_mats):
            rowG = (pltpu.repeat(mats_ref[pl.ds(m, 1), :], G, axis=0)
                    if G > 1 else mats_ref[pl.ds(m, 1), :])
            sel = mid == m
            for a in range(3):
                alb[a] = jnp.where(sel, rowG[:, a:a + 1], alb[a])
                emi[a] = jnp.where(sel, rowG[:, 5 + a:6 + a], emi[a])
            g = jnp.where(sel, rowG[:, 3:4], g)
            metal = jnp.where(sel, rowG[:, 4:5], metal)
        rough = jnp.maximum(g * g, 1e-4)
        return alb, emi, rough, rough * rough, metal

    def light_fields(li):
        p0 = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        e1 = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        e2 = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        ln = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        em = [jnp.zeros((G, LANES), jnp.float32) for _ in range(3)]
        for l in range(n_lights):
            rowG = (pltpu.repeat(lights_ref[pl.ds(l, 1), :], G, axis=0)
                    if G > 1 else lights_ref[pl.ds(l, 1), :])
            sel = li == l
            for a in range(3):
                p0[a] = jnp.where(sel, rowG[:, a:a + 1], p0[a])
                e1[a] = jnp.where(sel, rowG[:, 3 + a:4 + a], e1[a])
                e2[a] = jnp.where(sel, rowG[:, 6 + a:7 + a], e2[a])
                ln[a] = jnp.where(sel, rowG[:, 9 + a:10 + a], ln[a])
                em[a] = jnp.where(sel, rowG[:, 12 + a:13 + a], em[a])
        return p0, e1, e2, ln, em

    # --- shared BSDF terms --------------------------------------------------
    def diffuse_pmf_of(alb, metal, ndo):
        """CalcDiffusePmf: energy at ndi = 0.5 (Microfacet.glsl:156-161);
        luminance = RGB mean (Util.glsl)."""
        f0 = [0.04 * (1.0 - metal) + a * metal for a in alb]
        fi = _fresnel(f0, jnp.full((G, LANES), 0.5, jnp.float32))
        fo = _fresnel(f0, ndo)
        terms = [(1.0 - metal) * (1.0 - x) * (1.0 - y)
                 for x, y in zip(fi, fo)]
        lum = (terms[0] + terms[1] + terms[2]) / 3.0
        return jnp.clip(lum, 0.0, 1.0), f0

    def bsdf_eval(alb, metal, f0, rough, rough2, n, view, inc, ndo, ndi,
                  ndm, ndm2, idm):
        below = (_dot(n, inc) < 0.0) | (_dot(n, view) < 0.0)
        D = _distribution(model, rough, rough2, ndm, ndm2)
        vis = _vis_ggx(rough2, ndi) * _vis_ggx(rough2, ndo) / 4.0
        fm = _fresnel(f0, idm)
        fi = _fresnel(f0, ndi)
        fo = _fresnel(f0, ndo)
        out = []
        for a in range(3):
            spec = fm[a] * D * vis
            diff = (alb[a] / PI
                    * (1.0 - metal) * (1.0 - fi[a]) * (1.0 - fo[a]))
            out.append(jnp.where(below, 0.0, spec + diff))
        return out

    def pdf_mf(rough, rough2, ndm, ndm2, idm):
        D = _distribution(model, rough, rough2, ndm, ndm2)
        return jnp.maximum(D * ndm / jnp.maximum(4.0 * idm, 1e-20), 1e-10)

    # --- the bounce loop ----------------------------------------------------
    def bounce(i):
        if regen:
            # Lanes whose path ended start the next sample of their pixel:
            # thin-lens raygen (Camera.cpp:58-69) from the camera scalars.
            dead = st_alive[...] == 0
            smp0 = st_sample[...]
            want = dead & (smp0 < spp - 1) & act_ref[...]
            smp = smp0 + jnp.where(want, 1, 0)
            st_sample[...] = smp
            zb = jnp.zeros((G, LANES), jnp.int32)
            u_j0 = uni(smp, zb, 16)
            u_j1 = uni(smp, zb, 17)
            u_l0 = uni(smp, zb, 18)
            u_l1 = uni(smp, zb, 19)
            sx = in0_ref[...] + u_j0 * params_ref[24]
            sy = in1_ref[...] + u_j1 * params_ref[25]
            phi = 2.0 * PI * u_l0
            rd = params_ref[23] * jnp.sqrt(u_l1)
            rdx = rd * jnp.cos(phi)
            rdy = rd * jnp.sin(phi)
            off = [params_ref[17 + a] * rdx + params_ref[20 + a] * rdy
                   for a in range(3)]
            tgt = [params_ref[8 + a] + sx * params_ref[11 + a]
                   + sy * params_ref[14 + a] - off[a] for a in range(3)]
            nd = _normalize(tgt)
            for a in range(3):
                o_new = params_ref[5 + a] + off[a]
                st_o[a] = jnp.where(want, o_new, st_o[a])
                st_lp[a] = jnp.where(want, o_new, st_lp[a])
                st_d[a] = jnp.where(want, nd[a], st_d[a])
                st_tp[a] = jnp.where(want, 1.0, st_tp[a])
            st_pdf0[...] = jnp.where(want, 1.0, st_pdf0[...])
            st_pdf1[...] = jnp.where(want, 1.0, st_pdf1[...])
            st_bounce[...] = jnp.where(want, 0, st_bounce[...])
            st_alive[...] = jnp.where(want, 1, st_alive[...])

        o = [st_o[a] for a in range(3)]
        d = [st_d[a] for a in range(3)]
        alive = st_alive[...] > 0
        b = st_bounce[...]
        smp_v = st_sample[...]
        ctr[0] = ctr[0] + jnp.sum(jnp.where(alive, 1, 0))
        if with_stats:
            bstat = jnp.min(jnp.where(alive, b, jnp.int32(1 << 30)))
        else:
            bstat = i

        if fused_nee:
            # Deferred shadow rays from the previous bounce run as the
            # partner stream of this bounce's closest walk; their
            # contribution settles right after (estimator-identical).
            sh_on = sh_live[...] > 0
            walk_fused(o, d, alive,
                       [sh_o[a] for a in range(3)],
                       [sh_d[a] for a in range(3)],
                       sh_tmax[...], sh_on, bounce_i=bstat)
            add_sh = sh_on & (occl[...] < 0)
            for a in range(3):
                st_ct[a] = st_ct[a] + jnp.where(add_sh, sh_add[a], 0.0)
            sh_live[...] = jnp.zeros((G, LANES), jnp.int32)
        else:
            walk_closest(o, d, alive, bounce_i=bstat)
        t = cap_t[...]
        prim = cap_prim[...]
        miss = prim < 0
        if cluster:
            # cap_e1 holds the winner's C row (parallel to e1 x e2, det>0);
            # cap_ms[0] the signed material float (mat_id + 1) * nsign.
            sm = cap_ms[0]
            nsign = jnp.where(sm < 0.0, -1.0, 1.0)
            mid = jnp.maximum(jnp.abs(sm).astype(jnp.int32) - 1, -1)
            n = _scale(_normalize([cap_e1[a] for a in range(3)]), nsign)
        else:
            e1 = [cap_e1[a] for a in range(3)]
            e2 = [cap_e2[a] for a in range(3)]
            mid = jax.lax.bitcast_convert_type(cap_ms[0], jnp.int32)
            nsign = cap_ms[1]
            n = _scale(_normalize(_cross(e1, e2)), nsign)
        pos = [o[a] + d[a] * t + 0.003 * n[a] for a in range(3)]
        view = [-d[a] for a in range(3)]
        ndo = jnp.maximum(_dot(n, view), 0.0)

        alb, emi_m, rough, rough2, metal = mat_fields(mid)
        env = [jnp.full((G, LANES), params_ref[2 + a], jnp.float32)
               for a in range(3)]
        emission = _where(miss, env, emi_m)

        # L_e accumulation with the MIS rewrite (wavefront.py:299-317).
        dvec = _sub([st_lp[a] for a in range(3)], pos)
        dist2 = jnp.maximum(_dot(dvec, dvec), 1e-12)
        pdf0 = st_pdf0[...]
        pdf1 = st_pdf1[...]
        old_mis = _mis(pdf0, pdf1)
        factor = 0.5 * jnp.abs(_dot(n, view)) / dist2
        p0n = pdf0 * factor
        p1n = pdf1 * factor
        idt_scale = (p0n / (p0n + p1n + nee_pdf)
                     / jnp.maximum(old_mis, 1e-30))
        if nee:
            use_rw = (~miss) & (b != 0)
        else:
            use_rw = jnp.zeros((G, LANES), bool)
        scale = jnp.where(use_rw, idt_scale, 1.0)
        tp = [st_tp[a] for a in range(3)]
        for a in range(3):
            st_ct[a] = st_ct[a] + jnp.where(alive,
                                            tp[a] * scale * emission[a],
                                            0.0)
        alive = alive & ~miss
        st_alive[...] = jnp.where(alive, 1, 0)

        # --- NEE (wavefront.py:331-387 / Iterative.comp:113-147) ----------
        if nee:
            u_sel = uni(smp_v, b, 0)
            u_t0 = uni(smp_v, b, 1)
            u_t1 = uni(smp_v, b, 2)
            selected = u_sel * total_area
            li = jnp.zeros((G, LANES), jnp.int32)
            for l in range(n_lights):
                li = li + jnp.where(cdf_ref[l] <= selected, 1, 0)
            li = jnp.clip(li, 0, max(n_lights - 1, 0))
            lp0, le1, le2, ln, lem = light_fields(li)
            sr = jnp.sqrt(u_t0)
            bv = u_t1 * sr
            bt = 1.0 - (1.0 - sr) - bv
            lpos = [lp0[a] + le1[a] * bv + le2[a] * bt for a in range(3)]
            delta = _sub(lpos, pos)
            radius = jnp.sqrt(jnp.maximum(_dot(delta, delta), 1e-20))
            light_pdf = 1.0 / total_area
            shadow_tmax = radius - 0.005
            ldir = [delta[a] / radius for a in range(3)]
            # set_incoming: half vector + dots
            m_h = _normalize(_add(view, ldir))
            ndi_l = jnp.maximum(_dot(n, ldir), 0.0)
            ndm_l = jnp.maximum(_dot(n, m_h), 0.0)
            idm_l = jnp.maximum(_dot(ldir, m_h), 0.0)
            cos_l = jnp.abs(-_dot(ln, ldir))
            r2 = radius * radius
            dpmf, f0 = diffuse_pmf_of(alb, metal, ndo)
            pdf_dir = (dpmf * ndi_l / PI
                       + (1.0 - dpmf) * pdf_mf(rough, rough2, ndm_l,
                                               ndm_l * ndm_l, idm_l))
            bounce_pdf = pdf_dir * cos_l / r2
            weight = _mis(light_pdf, bounce_pdf)
            bsdf_l = bsdf_eval(alb, metal, f0, rough, rough2, n, view,
                               ldir, ndo, ndi_l, ndm_l, ndm_l * ndm_l,
                               idm_l)
            lscale = ndi_l * cos_l * weight / (light_pdf * r2)
            lt = [tp[a] * bsdf_l[a] * lscale for a in range(3)]
            contrib_ok = ((lt[0] * lem[0] != 0.0)
                          | (lt[1] * lem[1] != 0.0)
                          | (lt[2] * lem[2] != 0.0))
            shadow_live = alive & contrib_ok
            ctr[1] = ctr[1] + jnp.sum(jnp.where(shadow_live, 1, 0))
            so = [pos[a] + 0.001 * n[a] for a in range(3)]
            if fused_nee:
                # Defer: next iteration's fused walk traces this batch.
                for a in range(3):
                    sh_o[a] = so[a]
                    sh_d[a] = ldir[a]
                    sh_add[a] = lt[a] * lem[a]
                sh_tmax[...] = shadow_tmax
                sh_live[...] = jnp.where(shadow_live, 1, 0)
            else:
                walk_anyhit(so, ldir, shadow_tmax, shadow_live,
                            bounce_i=bstat)
                occluded = cap_prim[...] >= 0
                add = shadow_live & ~occluded
                for a in range(3):
                    st_ct[a] = st_ct[a] + jnp.where(add, lt[a] * lem[a],
                                                    0.0)

        if max_bounces == 0:
            # Pure direct lighting: no continuation (wavefront.py:390-399).
            st_alive[...] = jnp.zeros((G, LANES), jnp.int32)
            for a in range(3):
                st_lp[a] = pos[a]
                st_o[a] = pos[a]
            return

        # --- BSDF importance sample (Microfacet.glsl:172-193) -------------
        u_c = uni(smp_v, b, 3)
        u_s0 = uni(smp_v, b, 4)
        u_s1 = uni(smp_v, b, 5)
        u_rr = uni(smp_v, b, 6)
        dpmf2, f0b = diffuse_pmf_of(alb, metal, ndo)
        pick_diffuse = u_c < dpmf2
        tgt, tgb = _tbn(n)
        # cosine hemisphere local sample (sampling.py:29-38)
        radius_d = jnp.sqrt(u_s0)
        phi_d = 2.0 * PI * u_s1
        loc_d = [radius_d * jnp.sin(phi_d), radius_d * jnp.cos(phi_d),
                 jnp.sqrt(jnp.maximum(1.0 - u_s0, 0.0))]
        loc_m = _sample_microfacet(model, rough, rough2, u_s0, u_s1)

        def to_world(loc):
            return [tgt[a] * loc[0] + tgb[a] * loc[1] + n[a] * loc[2]
                    for a in range(3)]

        dir_d = to_world(loc_d)
        m_w = to_world(loc_m)
        odm = _dot(view, m_w)
        dir_s = [2.0 * odm * m_w[a] - view[a] for a in range(3)]
        inc = _where(pick_diffuse, dir_d, dir_s)
        # set_incoming at the final direction
        m_f = _normalize(_add(view, inc))
        ndi_b = jnp.maximum(_dot(n, inc), 0.0)
        ndm_b = jnp.maximum(_dot(n, m_f), 0.0)
        idm_b = jnp.maximum(_dot(inc, m_f), 0.0)
        pdf_d = dpmf2 * ndi_b / PI
        pdf_s = (1.0 - dpmf2) * pdf_mf(rough, rough2, ndm_b,
                                       ndm_b * ndm_b, idm_b)
        npdf0 = jnp.where(pick_diffuse, pdf_d, pdf_s)
        npdf1 = jnp.where(pick_diffuse, pdf_s, pdf_d)
        bsdf_b = bsdf_eval(alb, metal, f0b, rough, rough2, n, view, inc,
                           ndo, ndi_b, ndm_b, ndm_b * ndm_b, idm_b)
        tscale = ndi_b * _mis(npdf0, npdf1) / jnp.maximum(npdf0, 1e-30)
        ntp = [tp[a] * bsdf_b[a] * tscale for a in range(3)]

        # --- Russian roulette (Iterative.comp:291-300) ---------------------
        continuation = jnp.clip(
            jnp.maximum(ntp[0], jnp.maximum(ntp[1], ntp[2])), 0.0, 1.0)
        inv_c = 1.0 / jnp.maximum(continuation, 1e-12)
        kill = (u_rr > continuation) | (b > max_bounces)
        alive = alive & ~kill
        st_alive[...] = jnp.where(alive, 1, 0)
        for a in range(3):
            st_tp[a] = ntp[a] * inv_c
            st_o[a] = pos[a]
            st_d[a] = inc[a]
            st_lp[a] = pos[a]
        st_pdf0[...] = npdf0
        st_pdf1[...] = npdf1
        st_bounce[...] = b + 1

    def loop_body(i):
        bounce(i)
        return i + 1

    if regen:
        def loop_cond(i):
            pending = (st_alive[...] > 0) | ((st_sample[...] < spp - 1)
                                             & act_ref[...])
            if fused_nee:
                pending = pending | (sh_live[...] > 0)
            return (jnp.sum(jnp.where(pending, 1, 0)) > 0) \
                & (i < spp * (max_bounces + 2) + 1)
    elif fused_nee:
        def loop_cond(i):
            pending = (jnp.sum(st_alive[...]) > 0) \
                | (jnp.sum(sh_live[...]) > 0)
            return pending & (i <= max_bounces + 2)
    else:
        def loop_cond(i):
            any_alive = jnp.sum(st_alive[...]) > 0
            return any_alive & (i <= max_bounces + 1)

    i_final = jax.lax.while_loop(loop_cond, loop_body, jnp.int32(0))

    for a in range(3):
        contrib_out[a] = st_ct[a]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    vals = [ctr[0], ctr[1]]
    if with_stats:
        vals += [ctr[k] for k in range(2, 8)] + [i_final]
    acc = jnp.zeros((1, LANES), jnp.int32)
    for k, v in enumerate(vals):
        acc = acc + jnp.where(lane == k, v, 0)
    rays_out[...] = acc


@functools.partial(jax.jit, static_argnames=(
    "stack_depth", "leaf_size", "max_bounces", "nee", "model", "n_mats",
    "n_lights", "packet_size", "interpret", "with_stats", "spp",
    "fused_nee"))
def trace_mega(rows, mats, lights, cdf, params, o, d, active, seeds,
               *, stack_depth: int, leaf_size: int, max_bounces: int,
               nee: bool, model: str, n_mats: int, n_lights: int,
               packet_size: int = 2048, interpret: bool = False,
               cluster_rows=None, with_stats: bool = False,
               spp: int = 1, pxn=None, pyn=None,
               fused_nee: bool = False):
    """Run the megakernel over [N] primary rays.

    Returns (contribution [N, 3], rays i32 scalar). N must divide
    packet_size; seeds is [P] i32 (one PRNG stream per packet).
    cluster_rows: optional dense cluster-leaf table — `rows` must then be
    the cluster top tree (bvh/cluster.py) and the in-kernel walks run the
    MXU dense leaf phase.

    spp > 1 enables IN-KERNEL PATH REGENERATION: pass pxn/pyn
    ([N] normalized pixel coords, pixel/width) instead of o/d (ignored),
    and params extended with the camera scalars (see _mega_kernel);
    the returned contribution is the SUM over spp samples per lane.
    """
    N = active.shape[0]
    K = packet_size
    if N % K != 0:
        raise ValueError(f"N={N} must be a multiple of packet_size={K}")
    P = N // K
    G = K // LANES
    regen = spp > 1
    if regen:
        in0 = pxn.reshape(P, G, LANES)
        in1 = pyn.reshape(P, G, LANES)
    else:
        in0 = jnp.transpose(o, (1, 0)).reshape(3, P, G, LANES).transpose(
            1, 0, 2, 3)
        in1 = jnp.transpose(d, (1, 0)).reshape(3, P, G, LANES).transpose(
            1, 0, 2, 3)

    cluster = cluster_rows is not None
    if cluster and fused_nee:
        raise ValueError("fused_nee does not compose with cluster leaves")
    tc = cluster_rows.shape[1] // 3 if cluster else 0
    if not cluster:
        # Dummy 1-row table keeps the pallas_call signature static.
        cluster_rows = jnp.zeros((8, 3 * LANES), jnp.float32)
    kernel = functools.partial(
        _mega_kernel, stack_depth=stack_depth, leaf_size=leaf_size,
        max_bounces=max_bounces, nee=nee, model=model, n_mats=n_mats,
        n_lights=n_lights, cluster=cluster, tc=tc, with_stats=with_stats,
        spp=spp, regen=regen, fused_nee=fused_nee)

    ray_spec = pl.BlockSpec((1, 3, G, LANES), lambda p: (p, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, G, LANES), lambda p: (p, 0, 0),
                             memory_space=pltpu.VMEM)
    in_spec01 = lane_spec if regen else ray_spec

    def entry(seed_r, params_r, cdf_r, o_r, d_r, act_r, rows_r, mats_r,
              lights_r, cl_r, ct_o, rays_o, *scratch):
        kernel(seed_r, params_r, cdf_r, o_r.at[0], d_r.at[0], act_r.at[0],
               rows_r, mats_r, lights_r, cl_r, ct_o.at[0], rays_o.at[0],
               *scratch)

    G_scr = lambda: pltpu.VMEM((G, LANES), jnp.float32)
    G3_scr = lambda: pltpu.VMEM((3, G, LANES), jnp.float32)
    outs = pl.pallas_call(
        entry,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  in_spec01, in_spec01, lane_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 3, G, LANES), lambda p: (p, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, LANES), lambda p: (p, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((P, 3, G, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((P, 1, LANES), jnp.int32)],
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.SMEM((8,), jnp.int32),
                        G3_scr(), G3_scr(), G3_scr(), G3_scr(), G3_scr(),
                        G_scr(), G_scr(),
                        pltpu.VMEM((G, LANES), jnp.int32),
                        G_scr(),
                        pltpu.VMEM((G, LANES), jnp.int32),
                        G3_scr(), G3_scr(),
                        pltpu.VMEM((2, G, LANES), jnp.float32),
                        pltpu.VMEM((G, LANES), jnp.int32),
                        pltpu.VMEM((G, LANES), jnp.int32),
                        # fused_nee scratch (stack_b, occl, sh_*):
                        pltpu.SMEM((stack_depth,), jnp.int32),
                        pltpu.VMEM((G, LANES), jnp.int32),
                        G3_scr(), G3_scr(), G3_scr(),
                        G_scr(),
                        pltpu.VMEM((G, LANES), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                rows.size * rows.dtype.itemsize
                + cluster_rows.size * cluster_rows.dtype.itemsize
                + (mats.size + lights.size) * 4
                + (2 * 3 * tc * LANES * 4 * 4 if cluster else 0)
                + 56 * G * LANES * 4 + 8 * 1024 * 1024,
                120 * 1024 * 1024)),
        interpret=interpret,
    )(seeds.astype(jnp.int32), params, cdf, in0, in1,
      active.reshape(P, G, LANES), rows, mats, lights, cluster_rows)
    ct, rays = outs
    contribution = ct.transpose(0, 2, 3, 1).reshape(N, 3)
    if with_stats:
        # [P, 9]: bounce rays, live shadow rays, closest node/leaf pops,
        # anyhit node/leaf pops, closest/anyhit pops at bounce >= 8,
        # bounce iterations run.
        return contribution, jnp.sum(rays[:, 0, 0:2]), rays[:, 0, 0:9]
    return contribution, jnp.sum(rays[:, 0, 0:2])


_MEGA_STATICS = ("width", "height", "stack_depth", "leaf_size",
                 "max_bounces", "nee", "model", "n_mats", "n_lights",
                 "packet_size", "interpret", "with_stats", "spp",
                 "fused_nee")


@functools.partial(jax.jit, static_argnames=_MEGA_STATICS)
def render_sample_mega(scene, mega_tables, cam, pixel_x, pixel_y, key,
                       *, width: int, height: int, stack_depth: int,
                       leaf_size: int, max_bounces: int = 64,
                       nee: bool = True, model: str = "trowbridge_reitz",
                       n_mats: int = 1, n_lights: int = 1,
                       packet_size: int = 2048, interpret: bool = False,
                       sample_idx=0, with_stats: bool = False,
                       spp: int = 1, fused_nee: bool = False):
    """Wavefront-compatible entry: raygen (identical jitter/lens threefry
    draws to models/wavefront.py) + the megakernel. Returns
    ([N, 3] contributions, rays i32).

    spp > 1 runs ALL spp samples in ONE dispatch with in-kernel path
    regeneration (raygen moves on-core; jitter/lens draws come from the
    kernel's counter-based stream instead of threefry — statistically
    identical, not bitwise). The contribution is the SUM over samples."""
    import jax.random as jrandom

    from gpupathtracer_tpu.math.camera import gen_rays

    n = pixel_x.shape[0]
    K = min(packet_size, max(n, LANES))
    pad = (-n) % K
    act = (jnp.arange(n + pad) < n)
    P = (n + pad) // K
    mats, lights, cdf, params = mega_tables
    kw = dict(stack_depth=stack_depth, leaf_size=leaf_size,
              max_bounces=max_bounces, nee=nee, model=model,
              n_mats=n_mats, n_lights=n_lights, packet_size=K,
              interpret=interpret, with_stats=with_stats,
              fused_nee=fused_nee,
              cluster_rows=getattr(scene.bvh, "cluster_rows", None))

    if spp > 1:
        key = jrandom.fold_in(key, sample_idx)
        seeds = jrandom.randint(key, (P,), 0, jnp.iinfo(jnp.int32).max,
                                dtype=jnp.int32)
        pxn = pixel_x / jnp.float32(width)
        pyn = pixel_y / jnp.float32(height)
        if pad:
            pxn = jnp.concatenate([pxn, jnp.zeros((pad,))], axis=0)
            pyn = jnp.concatenate([pyn, jnp.zeros((pad,))], axis=0)
        # params[5:26]: camera scalars + jitter scales for on-core raygen.
        params_x = jnp.concatenate([
            params, cam.position, cam.lower_left, cam.horizontal,
            cam.vertical, cam.u, cam.v, cam.lens_radius[None],
            jnp.asarray([1.0 / width, 1.0 / height], jnp.float32)])
        res = trace_mega(scene.bvh.node_rows, mats, lights, cdf, params_x,
                         None, None, act, seeds, spp=spp, pxn=pxn, pyn=pyn,
                         **kw)
    else:
        key, k_jitter, k_lens = jrandom.split(key, 3)
        jitter = jrandom.uniform(k_jitter, (n, 2))
        interp = (jnp.stack([pixel_x, pixel_y], axis=-1) + jitter) \
            / jnp.array([width, height], jnp.float32)
        lens_u = jrandom.uniform(k_lens, (n, 2))
        ray_o, ray_d = gen_rays(cam, interp, lens_u)
        if pad:
            ray_o = jnp.concatenate([ray_o, jnp.zeros((pad, 3))], axis=0)
            ray_d = jnp.concatenate(
                [ray_d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (pad, 1))],
                axis=0)
        seeds = jrandom.randint(jrandom.fold_in(key, sample_idx), (P,),
                                0, jnp.iinfo(jnp.int32).max,
                                dtype=jnp.int32)
        res = trace_mega(scene.bvh.node_rows, mats, lights, cdf, params,
                         ray_o, ray_d, act, seeds, **kw)
    if with_stats:
        return res[0][:n], res[1], res[2]
    return res[0][:n], res[1]


@functools.partial(jax.jit,
                   static_argnames=_MEGA_STATICS + ("fori",))
def render_sample_mega_batch(scene, mega_tables, cam, pixel_x, pixel_y,
                             key, spp: int = 1, sample_idx=0,
                             fori: bool = False, **statics):
    """spp megakernel samples in ONE dispatch — the frame_batch analogue
    of models/wavefront.render_sample_batch. Default: in-kernel path
    regeneration (render_sample_mega spp=), the persistent-path-pool
    composition; fori=True keeps the old one-kernel-per-sample loop for
    A/B (the regen win is measured per PERF.md round 5)."""
    n = pixel_x.shape[0]
    if not fori:
        return render_sample_mega(scene, mega_tables, cam, pixel_x,
                                  pixel_y, key, sample_idx=sample_idx,
                                  spp=spp, **statics)

    def body(i, carry):
        acc, rays = carry
        c, r = render_sample_mega(scene, mega_tables, cam, pixel_x,
                                  pixel_y, jax.random.fold_in(key, i),
                                  sample_idx=sample_idx + i, **statics)
        return acc + c, rays + r

    return jax.lax.fori_loop(
        0, spp, body, (jnp.zeros((n, 3), jnp.float32), jnp.int32(0)))
