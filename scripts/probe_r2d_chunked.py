"""Chunked-grid probes for the brick-encode kernels.

Indices stream through SMEM in per-grid-step blocks (whole-array SMEM
inputs at 128k rows blew the compiler in probe_r2c). Measures:
  1. fwd gather+interp kernel: grid over sample chunks, table VMEM-resident
  2. bwd RMW scatter-add kernel: same chunking, f32 accumulator as output
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
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    return round(dt * 1e3, 2), round(n_rows / dt / 1e6, 1)


key = jax.random.PRNGKey(0)
T, W = 4096, 256
N = 1 << 17
CHUNK = 2048
tab = jax.random.normal(key, (T, W), jnp.float32)
idx = jax.random.randint(jax.random.fold_in(key, 2), (N, 1), 0, T,
                         dtype=jnp.int32)
hat = jax.random.uniform(jax.random.fold_in(key, 5), (N, 128), jnp.float32)

# ---------------------------------------------- 1. plain gather, chunked grid
def k_gather(idx_ref, tab_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, CHUNK, body, 0)

try:
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_gather,
        grid=(N // CHUNK,),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.float32),
        in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(i, t))
    out = f(tab, idx)
    expect = np.asarray(tab)[np.asarray(idx)[:200, 0]]
    ok = bool(np.allclose(np.asarray(out[:200]), expect))
    ms, mr = rate(f, tab, idx, n_rows=N)
    emit("chunked_gather", ms=ms, mrows_per_s=mr, correct=ok)
except Exception as e:
    emit("chunked_gather", error=str(e)[:250])

# ------------------------------- 2. fwd gather + interp (8-sample tile, MXU reduce)
SEL = np.zeros((W, 2), np.float32)
SEL[:128, 0] = 1.0
SEL[128:, 1] = 1.0
sel = jnp.asarray(SEL)

def k_fwd(idx_ref, tab_ref, hat_ref, sel_ref, out_ref):
    def inner(scratch):
        def body(i8, _):
            base = i8 * 8
            for k in range(8):
                j = idx_ref[base + k, 0]
                scratch[pl.ds(k, 1), :] = tab_ref[pl.ds(j, 1), :]
            h = hat_ref[pl.ds(base, 8), :]                     # [8, 128]
            h2 = jnp.concatenate([h, h], axis=1)               # [8, 256]
            tmp = scratch[:] * h2
            out_ref[pl.ds(base, 8), :] = jnp.dot(
                tmp, sel_ref[:], preferred_element_type=jnp.float32)
            return 0
        jax.lax.fori_loop(0, CHUNK // 8, body, 0)
    pl.run_scoped(inner, pltpu.VMEM((8, W), jnp.float32))

try:
    f = jax.jit(lambda t, i, h: pl.pallas_call(
        k_fwd,
        grid=(N // CHUNK,),
        out_shape=jax.ShapeDtypeStruct((N, 2), jnp.float32),
        in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((T, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((W, 2), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CHUNK, 2), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
    )(i, t, h, sel))
    out = f(tab, idx, hat)
    tn, inp, hn = (np.asarray(x) for x in (tab, idx, hat))
    rows = tn[inp[:64, 0]]
    exp0 = (rows[:, :128] * hn[:64]).sum(1)
    exp1 = (rows[:, 128:] * hn[:64]).sum(1)
    ok = bool(np.allclose(np.asarray(out[:64, 0]), exp0, atol=1e-3)
              and np.allclose(np.asarray(out[:64, 1]), exp1, atol=1e-3))
    ms, mr = rate(f, tab, idx, hat, n_rows=N)
    emit("fwd_gather_interp", ms=ms, mrows_per_s=mr, correct=ok)
except Exception as e:
    emit("fwd_gather_interp", error=str(e)[:250])

# ---------------------------------------------- 3. bwd RMW scatter-add
vals = jax.random.normal(jax.random.fold_in(key, 4), (N, W), jnp.float32)

def k_scatter(idx_ref, val_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(j, 1), :] = (out_ref[pl.ds(j, 1), :]
                                   + val_ref[pl.ds(i, 1), :])
        return 0
    jax.lax.fori_loop(0, CHUNK, body, 0)

try:
    f = jax.jit(lambda i, v: pl.pallas_call(
        k_scatter,
        grid=(N // CHUNK,),
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((CHUNK, W), lambda g: (g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, W), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
    )(i, v))
    out = f(idx, vals)
    expect = np.zeros((T, W), np.float32)
    np.add.at(expect, np.asarray(idx)[:, 0], np.asarray(vals))
    ok = bool(np.allclose(np.asarray(out), expect, atol=1e-2))
    ms, mr = rate(f, idx, vals, n_rows=N)
    emit("bwd_rmw_scatter", ms=ms, mrows_per_s=mr, correct=ok)
except Exception as e:
    emit("bwd_rmw_scatter", error=str(e)[:250])

# ---------------- 4. bwd scatter with on-the-fly contribution (outer wl*g)
g2 = jax.random.normal(jax.random.fold_in(key, 6), (N, 2), jnp.float32)

def k_scatter2(idx_ref, hat_ref, g_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        j = idx_ref[i, 0]
        h = hat_ref[pl.ds(i, 1), :]                       # [1, 128]
        gf = g_ref[pl.ds(i, 1), :]                        # [1, 2]
        contrib = jnp.concatenate([h * gf[0, 0], h * gf[0, 1]], axis=1)
        out_ref[pl.ds(j, 1), :] = out_ref[pl.ds(j, 1), :] + contrib
        return 0
    jax.lax.fori_loop(0, CHUNK, body, 0)

try:
    f = jax.jit(lambda i, h, g: pl.pallas_call(
        k_scatter2,
        grid=(N // CHUNK,),
        out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
        in_specs=[pl.BlockSpec((CHUNK, 1), lambda gg: (gg, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((CHUNK, 128), lambda gg: (gg, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CHUNK, 2), lambda gg: (gg, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, W), lambda gg: (0, 0),
                               memory_space=pltpu.VMEM),
    )(i, h, g))
    out = f(idx, hat, g2)
    inp, hn, gn = (np.asarray(x) for x in (idx, hat, g2))
    expect = np.zeros((T, W), np.float32)
    np.add.at(expect, inp[:, 0],
              np.concatenate([hn * gn[:, :1], hn * gn[:, 1:]], axis=1))
    ok = bool(np.allclose(np.asarray(out), expect, atol=1e-2))
    ms, mr = rate(f, idx, hat, g2, n_rows=N)
    emit("bwd_fused_scatter", ms=ms, mrows_per_s=mr, correct=ok)
except Exception as e:
    emit("bwd_fused_scatter", error=str(e)[:250])
