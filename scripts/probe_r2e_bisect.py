"""Bisect which kernel feature crashes the remote Mosaic compiler.

Baseline that WORKED (probe_r2b): no grid, idx (1024,1) whole-array SMEM,
fori_loop 1024 dynamic row gather. Each probe below changes ONE thing.
"""
import json
import time

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
T, W = 4096, 256
tab = jax.random.normal(key, (T, W), jnp.float32)
tab_np = np.asarray(tab)


def gather_kernel(n):
    def k(idx_ref, tab_ref, out_ref):
        def body(i, _):
            j = idx_ref[i, 0]
            out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
            return 0
        jax.lax.fori_loop(0, n, body, 0)
    return k


def check_gather(out, idx):
    return np.allclose(np.asarray(out[:50]), tab_np[np.asarray(idx)[:50, 0]])


# ---- A: trip count 4096, no grid, whole SMEM idx
def probe_A():
    idx = jax.random.randint(key, (4096, 1), 0, T, dtype=jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        gather_kernel(4096),
        out_shape=jax.ShapeDtypeStruct((4096, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t))
    out = f(tab, idx)
    sync(out)
    emit("A_fori4096_nogrid", compiled=True, correct=bool(check_gather(out, idx)))


# ---- B: trip count 16384, no grid
def probe_B():
    idx = jax.random.randint(key, (16384, 1), 0, T, dtype=jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        gather_kernel(16384),
        out_shape=jax.ShapeDtypeStruct((16384, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, t))
    out = f(tab, idx)
    sync(out)
    # rate at 16k rows (dispatch floor dominates; still informative)
    t0 = time.perf_counter()
    for _ in range(5):
        out = f(tab, idx)
    sync(out)
    dt = (time.perf_counter() - t0) / 5
    emit("B_fori16384_nogrid", compiled=True,
         correct=bool(check_gather(out, idx)),
         ms=round(dt * 1e3, 2), mrows_per_s=round(16384 / dt / 1e6, 2))


# ---- C: grid=(4,), SMEM idx blocked (1024,1)
def probe_C():
    idx = jax.random.randint(key, (4096, 1), 0, T, dtype=jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        gather_kernel(1024),
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((4096, W), jnp.float32),
        in_specs=[pl.BlockSpec((1024, 1), lambda g: (g, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1024, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(i, t))
    out = f(tab, idx)
    sync(out)
    emit("C_grid4_smemblock", compiled=True, correct=bool(check_gather(out, idx)))


# ---- D: grid=(4,), idx VMEM-blocked, scalar read from VMEM
def probe_D():
    idx = jax.random.randint(key, (4096, 1), 0, T, dtype=jnp.int32)
    f = jax.jit(lambda t, i: pl.pallas_call(
        gather_kernel(1024),
        grid=(4,),
        out_shape=jax.ShapeDtypeStruct((4096, W), jnp.float32),
        in_specs=[pl.BlockSpec((1024, 1), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((T, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1024, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(i, t))
    out = f(tab, idx)
    sync(out)
    emit("D_grid4_vmemidx", compiled=True, correct=bool(check_gather(out, idx)))


# ---- F: RMW scatter rate at 1024 rows
def probe_F():
    idx = jax.random.randint(key, (1024, 1), 0, T, dtype=jnp.int32)
    vals = jax.random.normal(jax.random.fold_in(key, 4), (1024, W), jnp.float32)

    def k_rmw(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[i, 0]
            out_ref[pl.ds(j, 1), :] = (out_ref[pl.ds(j, 1), :]
                                       + val_ref[pl.ds(i, 1), :])
            return 0
        jax.lax.fori_loop(0, 1024, body, 0)

    f = jax.jit(lambda i, v: pl.pallas_call(
        k_rmw,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, v))
    sync(f(idx, vals))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(idx, vals)
    sync(out)
    dt = (time.perf_counter() - t0) / 20
    emit("F_rmw1024", ms=round(dt * 1e3, 3),
         mrows_per_s=round(1024 / dt / 1e6, 2))


PROBES = [("A_fori4096_nogrid", probe_A), ("B_fori16384_nogrid", probe_B),
          ("C_grid4_smemblock", probe_C), ("D_grid4_vmemidx", probe_D),
          ("F_rmw1024", probe_F)]

for name, fn in PROBES:
    try:
        fn()
    except Exception as e:
        emit(name, error=str(e)[:200])
