"""Round-2b Mosaic probes: the primitives the brick-encode kernel needs.

1. VMEM capacity (how big a scratch compiles+runs)
2. dynamic-start row load from a VMEM table: table_ref[pl.ds(idx, 1), :]
   inside fori_loop, idx from a VMEM int vector -> the gather primitive
3. same but 8-row tile RMW accumulate (scatter-add primitive)
4. rate test: gather 128k rows from a [4096, 256] f32 VMEM table
Each probe prints one JSON line; failures print the error head.
"""
import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


key = jax.random.PRNGKey(0)

# ------------------------------------------------ 1: VMEM capacity
for mb in (16, 32, 64, 100):
    try:
        n = mb * 1024 * 1024 // (128 * 4)

        def k_cap(out_ref):
            def body(scratch):
                scratch[0, :] = jnp.ones((128,), jnp.float32)
                scratch[n - 1, :] = jnp.ones((128,), jnp.float32)
                out_ref[0, 0] = scratch[0, 0] + scratch[n - 1, 0]
            pl.run_scoped(body, pltpu.VMEM((n, 128), jnp.float32))

        out = pl.pallas_call(
            k_cap,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )()
        emit(f"vmem_scratch_{mb}MB", ok=bool(sync(out) == 2.0))
    except Exception as e:
        emit(f"vmem_scratch_{mb}MB", error=str(e)[:200])
        break

# ------------------------------------------------ 2: dynamic row load from VMEM
T, W = 4096, 256
tab = jax.random.normal(key, (T, W), jnp.float32)
NIDX = 1024
idx = jax.random.randint(jax.random.fold_in(key, 1), (NIDX, 1), 0, T,
                         dtype=jnp.int32)

def k_dyn_gather(tab_ref, idx_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, NIDX, body, 0)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_dyn_gather,
        out_shape=jax.ShapeDtypeStruct((NIDX, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    out = f(tab, idx)
    expect = np.asarray(tab)[np.asarray(idx)[:, 0]]
    emit("dyn_row_gather_vmem", compiled=True,
         correct=bool(np.allclose(np.asarray(out), expect)))
except Exception as e:
    emit("dyn_row_gather_vmem", error=str(e)[:300])

# ------------------------------------------------ 2b: idx via SMEM scalar loop + rate
NBIG = 1 << 17  # 128k rows
idx_big = jax.random.randint(jax.random.fold_in(key, 2), (NBIG, 1), 0, T,
                             dtype=jnp.int32)

def k_gather_rate(tab_ref, idx_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0, unroll=8)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_gather_rate,
        out_shape=jax.ShapeDtypeStruct((NBIG, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    sync(f(tab, idx_big))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(tab, idx_big)
    s = sync(out)
    dt = (time.perf_counter() - t0) / reps
    emit("dyn_row_gather_rate", ms=round(dt * 1e3, 2),
         mrows_per_s=round(NBIG / dt / 1e6, 1))
except Exception as e:
    emit("dyn_row_gather_rate", error=str(e)[:300])

# ------------------------------------------------ 3: dynamic row RMW (scatter-add)
def k_dyn_scatter(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + val_ref[pl.ds(i, 1), :]
        return 0
    jax.lax.fori_loop(0, NIDX, body, 0)

try:
    vals = jax.random.normal(jax.random.fold_in(key, 3), (NIDX, W), jnp.float32)
    f = jax.jit(lambda i, v: pl.pallas_call(
        k_dyn_scatter,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, v))
    out = f(idx, vals)
    expect = np.zeros((T, W), np.float32)
    np.add.at(expect, np.asarray(idx)[:, 0], np.asarray(vals))
    emit("dyn_row_scatter_vmem", compiled=True,
         correct=bool(np.allclose(np.asarray(out), expect, atol=1e-4)))
except Exception as e:
    emit("dyn_row_scatter_vmem", error=str(e)[:300])

# ------------------------------------------------ 3b: scatter rate
def k_scatter_rate(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + val_ref[pl.ds(i, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0, unroll=8)

try:
    vals_big = jax.random.normal(jax.random.fold_in(key, 4), (NBIG, W),
                                 jnp.float32)
    f = jax.jit(lambda i, v: pl.pallas_call(
        k_scatter_rate,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, v))
    sync(f(idx_big, vals_big))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(idx_big, vals_big)
    s = sync(out)
    dt = (time.perf_counter() - t0) / reps
    emit("dyn_row_scatter_rate", ms=round(dt * 1e3, 2),
         mrows_per_s=round(NBIG / dt / 1e6, 1))
except Exception as e:
    emit("dyn_row_scatter_rate", error=str(e)[:300])
