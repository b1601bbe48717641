"""Rate probes at scale for the D recipe (grid + VMEM idx + scalar reads).

G: fwd-shaped gather+interp kernel (rows consumed in-kernel, narrow out)
S: bwd-shaped RMW scatter-add into a VMEM-resident accumulator
Marginal rate via two sizes.
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
CHUNK = 2048
GRP = 128
tab = jax.random.normal(key, (T, W), jnp.float32)
hatc = jax.random.uniform(jax.random.fold_in(key, 1), (GRP, W), jnp.float32)
SEL = np.zeros((W, 128), np.float32)
SEL[:128, 0] = 1.0
SEL[128:, 1] = 1.0
sel = jnp.asarray(SEL)


def make_fwd(n):
    n_chunks = n // CHUNK

    def k_fwd(idx_ref, tab_ref, hat_ref, sel_ref, out_ref):
        def inner(scratch):
            def body(g, _):
                base = g * GRP
                def load8(q, _):
                    b2 = base + q * 8
                    for k in range(8):
                        j = idx_ref[b2 + k, 0]
                        scratch[pl.ds(q * 8 + k, 1), :] = tab_ref[pl.ds(j, 1), :]
                    return 0
                jax.lax.fori_loop(0, GRP // 8, load8, 0)
                tmp = scratch[:] * hat_ref[:]
                out_ref[pl.ds(base, GRP), :] = jnp.dot(
                    tmp, sel_ref[:], preferred_element_type=jnp.float32)
                return 0
            jax.lax.fori_loop(0, CHUNK // GRP, body, 0)
        pl.run_scoped(inner, pltpu.VMEM((GRP, W), jnp.float32))

    def call(t, i):
        return pl.pallas_call(
            k_fwd,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
            in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((T, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((GRP, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((W, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((CHUNK, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(i, t, hatc, sel)
    return jax.jit(call)


def time_fn(f, *args, reps=5):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


try:
    NA, NB = 1 << 17, 1 << 19
    idxA = jax.random.randint(key, (NA, 1), 0, T, dtype=jnp.int32)
    idxB = jax.random.randint(key, (NB, 1), 0, T, dtype=jnp.int32)
    fA, fB = make_fwd(NA), make_fwd(NB)
    # correctness on A
    out = fA(tab, idxA)
    rows = np.asarray(tab)[np.asarray(idxA)[:GRP, 0]]
    tmp = rows * np.asarray(hatc)
    exp0 = tmp[:, :128].sum(1)
    exp1 = tmp[:, 128:].sum(1)
    ok = bool(np.allclose(np.asarray(out[:GRP, 0]), exp0, atol=1e-2)
              and np.allclose(np.asarray(out[:GRP, 1]), exp1, atol=1e-2))
    tA, tB = time_fn(fA, tab, idxA), time_fn(fB, tab, idxB)
    per_row = (tB - tA) / (NB - NA)
    emit("fwd_scaleD", correct=ok, msA=round(tA * 1e3, 2),
         msB=round(tB * 1e3, 2),
         marginal_mrows_per_s=round(1e-6 / per_row, 1))
except Exception as e:
    emit("fwd_scaleD", error=str(e)[:250])


def make_scatter(n):
    n_chunks = n // CHUNK

    def k_s(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[i, 0]
            out_ref[pl.ds(j, 1), :] = (out_ref[pl.ds(j, 1), :]
                                       + val_ref[pl.ds(i, 1), :])
            return 0
        jax.lax.fori_loop(0, CHUNK, body, 0)

    def call(i, v):
        return pl.pallas_call(
            k_s,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
            in_specs=[pl.BlockSpec((CHUNK, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((CHUNK, W), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((T, W), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
        )(i, v)
    return jax.jit(call)


try:
    NA, NB = 1 << 16, 1 << 18
    idxA = jax.random.randint(key, (NA, 1), 0, T, dtype=jnp.int32)
    idxB = jax.random.randint(key, (NB, 1), 0, T, dtype=jnp.int32)
    valA = jax.random.normal(jax.random.fold_in(key, 2), (NA, W), jnp.float32)
    valB = jax.random.normal(jax.random.fold_in(key, 3), (NB, W), jnp.float32)
    fA, fB = make_scatter(NA), make_scatter(NB)
    out = fA(idxA, valA)
    expect = np.zeros((T, W), np.float32)
    np.add.at(expect, np.asarray(idxA)[:, 0], np.asarray(valA))
    ok = bool(np.allclose(np.asarray(out), expect, atol=5e-2))
    tA, tB = time_fn(fA, idxA, valA), time_fn(fB, idxB, valB)
    per_row = (tB - tA) / (NB - NA)
    emit("scatter_scaleD", correct=ok, msA=round(tA * 1e3, 2),
         msB=round(tB * 1e3, 2),
         marginal_mrows_per_s=round(1e-6 / per_row, 1))
except Exception as e:
    emit("scatter_scaleD", error=str(e)[:250])
