"""Rate probes for in-kernel dynamic VMEM row gather / scatter-add.

Variants: fori_loop unroll=1; manual 8-way unroll; gather+interp fused.
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


def rate(f, *args, n_rows, reps=5):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    s = sync(out)
    dt = (time.perf_counter() - t0) / reps
    return round(dt * 1e3, 2), round(n_rows / dt / 1e6, 1)


key = jax.random.PRNGKey(0)
T, W = 4096, 256
NBIG = 1 << 17
tab = jax.random.normal(key, (T, W), jnp.float32)
idx_big = jax.random.randint(jax.random.fold_in(key, 2), (NBIG, 1), 0, T,
                             dtype=jnp.int32)

# ---------------- gather, unroll=1
def k_g1(tab_ref, idx_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_g1,
        out_shape=jax.ShapeDtypeStruct((NBIG, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    ms, mr = rate(f, tab, idx_big, n_rows=NBIG)
    emit("gather_u1", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("gather_u1", error=str(e)[:200])

# ---------------- gather, manual 8x unroll
def k_g8(tab_ref, idx_ref, out_ref):
    def body(i8, _):
        base = i8 * 8
        for k in range(8):
            j = idx_ref[base + k, 0]
            out_ref[pl.ds(base + k, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG // 8, body, 0)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_g8,
        out_shape=jax.ShapeDtypeStruct((NBIG, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    ms, mr = rate(f, tab, idx_big, n_rows=NBIG)
    emit("gather_u8", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("gather_u8", error=str(e)[:200])

# ---------------- gather 8 rows into an (8, W) tile then one tile store
def k_g8t(tab_ref, idx_ref, out_ref):
    def inner(scratch):
        def body(i8, _):
            base = i8 * 8
            for k in range(8):
                j = idx_ref[base + k, 0]
                scratch[pl.ds(k, 1), :] = tab_ref[pl.ds(j, 1), :]
            out_ref[pl.ds(base, 8), :] = scratch[:]
            return 0
        jax.lax.fori_loop(0, NBIG // 8, body, 0)
    pl.run_scoped(inner, pltpu.VMEM((8, W), jnp.float32))

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_g8t,
        out_shape=jax.ShapeDtypeStruct((NBIG, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    ms, mr = rate(f, tab, idx_big, n_rows=NBIG)
    emit("gather_u8_tile", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("gather_u8_tile", error=str(e)[:200])

# ---------------- scatter-add, unroll=1
vals_big = jax.random.normal(jax.random.fold_in(key, 4), (NBIG, W), jnp.float32)

def k_s1(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + val_ref[pl.ds(i, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0)

try:
    f = jax.jit(lambda i, v: pl.pallas_call(
        k_s1,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, v))
    ms, mr = rate(f, idx_big, vals_big, n_rows=NBIG)
    emit("scatter_u1", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("scatter_u1", error=str(e)[:200])

# ---------------- scatter-add, manual 8x unroll
def k_s8(idx_ref, val_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i8, _):
        base = i8 * 8
        for k in range(8):
            j = idx_ref[base + k, 0]
            out_ref[pl.ds(j, 1), :] = (out_ref[pl.ds(j, 1), :]
                                       + val_ref[pl.ds(base + k, 1), :])
        return 0
    jax.lax.fori_loop(0, NBIG // 8, body, 0)

try:
    f = jax.jit(lambda i, v: pl.pallas_call(
        k_s8,
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, v))
    ms, mr = rate(f, idx_big, vals_big, n_rows=NBIG)
    emit("scatter_u8", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("scatter_u8", error=str(e)[:200])

# ---------------- bf16 table gather rate (half the bytes)
tab16 = tab.astype(jnp.bfloat16)

def k_g1b(tab_ref, idx_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_g1b,
        out_shape=jax.ShapeDtypeStruct((NBIG, W), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    ms, mr = rate(f, tab16, idx_big, n_rows=NBIG)
    emit("gather_u1_bf16", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("gather_u1_bf16", error=str(e)[:200])

# ---------------- gather + hat-weight interp fused (the real fwd kernel body)
# per row: load row, mul by weight row [1, W], accumulate per-feature sums
hat_big = jax.random.uniform(jax.random.fold_in(key, 5), (NBIG, 128),
                             jnp.float32)

def k_gi(tab_ref, idx_ref, hat_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        row = tab_ref[pl.ds(j, 1), :]              # [1, 256] = 2 features
        w = hat_ref[pl.ds(i, 1), :]                # [1, 128]
        f0 = jnp.sum(row[:, :128] * w)
        f1 = jnp.sum(row[:, 128:] * w)
        out_ref[i, 0] = f0
        out_ref[i, 1] = f1
        return 0
    jax.lax.fori_loop(0, NBIG, body, 0)

try:
    f = jax.jit(lambda t, i, h: pl.pallas_call(
        k_gi,
        out_shape=jax.ShapeDtypeStruct((NBIG, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i, h))
    ms, mr = rate(f, tab, idx_big, hat_big, n_rows=NBIG)
    emit("gather_interp_u1", ms=ms, mrows_per_s=mr)
except Exception as e:
    emit("gather_interp_u1", error=str(e)[:200])
