"""Round-2 re-probe of the round-1 Mosaic blocker (PERF.md round-2 plan).

Each probe compiles + runs a minimal kernel on the real chip and prints
PASS/FAIL with the error class. Run: python probe_mosaic.py
"""
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"PASS  {name}: {out}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        head = msg[0][:200] if msg else repr(e)
        print(f"FAIL  {name}: {type(e).__name__}: {head}")
        return False


# 1. trivial VMEM kernel
def p1():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return float(jnp.sum(out))


# 2. ANY-space ref + static-index make_async_copy (round-1 blocker repro)
def p2():
    def k(x_ref, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 1)], buf.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...]
    x = jnp.ones((16, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    return float(jnp.sum(out))


# 2b. same but dynamic index from SMEM scalar
def p2b():
    def k(i_ref, x_ref, o_ref, buf, sem):
        i = i_ref[0]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(i, 1)], buf.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...]
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.array([3], jnp.int32), x)
    return float(out[0, 0])  # expect 3*128=384


# 3. full-table VMEM input + dynamic-slice row read (planned workaround)
def p3():
    def k(i_ref, tab_ref, o_ref):
        i = i_ref[0]
        o_ref[...] = tab_ref[pl.ds(i, 1), :]
    tab = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(1024, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([7], jnp.int32), tab)
    return float(out[0, 0])  # expect 7*128=896


# 3b. dynamic-slice row read inside a while_loop with SMEM stack scratch
def p3b():
    def k(tab_ref, o_ref, stack):
        stack[0] = 0
        def body(c):
            sp, acc = c
            idx = stack[sp - 1]
            row = tab_ref[pl.ds(idx, 1), :]
            nxt = idx + 1
            push = nxt < 5
            stack[jnp.where(push, sp - 1, 0)] = jnp.where(push, nxt, stack[0])
            return jnp.where(push, sp, sp - 1), acc + jnp.sum(row)
        _, acc = jax.lax.while_loop(lambda c: c[0] > 0, body, (1, 0.0))
        o_ref[0, 0] = acc
    tab = jnp.ones((256, 128), jnp.float32)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )(tab)
    return float(out[0, 0])  # expect 5*128=640


# 4. VMEM capacity: biggest full-array VMEM input that compiles
def p4():
    def k(tab_ref, o_ref):
        o_ref[...] = tab_ref[pl.ds(0, 8), :]
    results = []
    for mb in (4, 8, 12, 16, 24, 32, 48, 64, 96):
        rows = mb * 1024 * 1024 // (128 * 4)
        try:
            tab = jnp.ones((rows, 128), jnp.float32)
            out = pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(tab)
            float(jnp.sum(out))
            results.append(f"{mb}MB ok")
        except Exception as e:  # noqa: BLE001
            results.append(f"{mb}MB FAIL({type(e).__name__})")
            break
    return " ".join(results)


# 5. HBM-space ref (explicit) + DMA
def p5():
    def k(x_ref, o_ref, buf, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(2, 1)], buf.at[pl.ds(0, 1)], sem)
        cp.start()
        cp.wait()
        o_ref[...] = buf[...]
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(x)
    return float(out[0, 0])  # expect 256


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("1  trivial VMEM", p1)
    run("2  ANY-ref static DMA (r1 blocker)", p2)
    run("2b ANY-ref dynamic DMA", p2b)
    run("3  VMEM table dynamic-slice read", p3)
    run("3b while_loop + SMEM stack + dyn slice", p3b)
    run("4  VMEM capacity sweep", p4)
    run("5  HBM-ref static DMA", p5)
