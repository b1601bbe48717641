"""Round-2 Pallas probes: retry in-kernel dynamic gathers on the current Mosaic.

Run AFTER probe_r2_gather.py (single chip; avoid contention). Each variant is
guarded — the remote Mosaic compiler crashed (HTTP 500) on dynamic_gather last
round; we retry several spellings plus supported fallbacks.
"""
import json
import time
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def bench(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


key = jax.random.PRNGKey(0)

# ---------------------------------------------------------- A: take_along_axis lane gather
# operand (8,128) table broadcast, idx (8,128) -> lane shuffle
def k_lane_gather(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

try:
    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jax.random.randint(key, (8, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_lane_gather,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    out = f(tab, idx)
    ok = bool(jnp.all(out == tab[0][idx[0]].astype(out.dtype))) if True else None
    # correctness: row r of out should be tab[r][idx[r]] if gather is per-sublane
    import numpy as np
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    emit("pallas_lane_gather_8x128", compiled=True,
         correct=bool((np.asarray(out) == expect).all()))
except Exception as e:
    emit("pallas_lane_gather_8x128", error=str(e)[:300])

# ---------------------------------------------------------- B: bigger lane gather + timing
def k_lane_gather_big(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

try:
    S = 2048
    tab = jnp.arange(128, dtype=jnp.float32)[None, :] * jnp.ones((S, 1), jnp.float32)
    idx = jax.random.randint(key, (S, 128), 0, 128)
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_lane_gather_big,
        out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    dt = bench(f, tab, idx)
    emit("pallas_lane_gather_2048x128", compiled=True,
         gelem_s=round(S * 128 / dt / 1e9, 2), us=round(dt * 1e6, 1))
except Exception as e:
    emit("pallas_lane_gather_2048x128", error=str(e)[:300])

# ---------------------------------------------------------- C: sublane-dim gather via take
def k_sub_gather(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)

try:
    T, W, Ng = 512, 128, 1024
    tab = jax.random.normal(key, (T, W))
    idx = jax.random.randint(key, (Ng, 1), 0, T)
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_sub_gather,
        out_shape=jax.ShapeDtypeStruct((Ng, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    out = f(tab, idx)
    import numpy as np
    expect = np.asarray(tab)[np.asarray(idx)[:, 0]]
    dt = bench(f, tab, idx)
    emit("pallas_sublane_take_512x128", compiled=True,
         correct=bool(np.allclose(np.asarray(out), expect)),
         mrows_s=round(Ng / dt / 1e6, 2))
except Exception as e:
    emit("pallas_sublane_take_512x128", error=str(e)[:300])

# ---------------------------------------------------------- D: fori_loop dynamic-slice row loop
def k_ds_loop(tab_ref, idx_ref, out_ref):
    def body(i, _):
        j = idx_ref[i, 0]
        out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, out_ref.shape[0], body, 0)

try:
    T, W, Ng = 4096, 128, 4096
    tab = jax.random.normal(key, (T, W))
    idx = jax.random.randint(key, (Ng, 1), 0, T)
    f = jax.jit(lambda t, i: pl.pallas_call(
        k_ds_loop,
        out_shape=jax.ShapeDtypeStruct((Ng, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    out = f(tab, idx)
    import numpy as np
    expect = np.asarray(tab)[np.asarray(idx)[:, 0]]
    dt = bench(f, tab, idx)
    emit("pallas_ds_loop_gather", compiled=True,
         correct=bool(np.allclose(np.asarray(out), expect)),
         mrows_s=round(Ng / dt / 1e6, 2))
except Exception as e:
    emit("pallas_ds_loop_gather", error=str(e)[:300])

# ---------------------------------------------------------- E: in-kernel one-hot matmul gather
# gather N rows of F feats from T-row table: two-stage (block select via MXU)
def make_onehot_gather(T, F, N, TILE=512, BLK=512):
    # table (T, F) padded F->128 lanes outside; here table given as (T, 128)
    def kernel(idx_ref, tab_ref, out_ref):
        i = pl.program_id(0)
        idx = idx_ref[0, :]  # (TILE,) int32 for this tile? needs blocking; use full
        # per tile of samples: one-hot over table blocks
        acc = jnp.zeros((TILE, 128), jnp.float32)
        n_blk = T // BLK
        def body(b, acc):
            base = b * BLK
            rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, BLK), 1) + base
            my = idx_ref[pl.ds(i * TILE, TILE), 0]
            oh = (my[:, None] == rows).astype(jnp.bfloat16)
            blk = tab_ref[pl.ds(base, BLK), :].astype(jnp.bfloat16)
            return acc + jnp.dot(oh, blk, preferred_element_type=jnp.float32)
        acc = jax.lax.fori_loop(0, n_blk, body, acc)
        out_ref[:] = acc

    def run(idx2d, tab):
        return pl.pallas_call(
            kernel,
            grid=(N // TILE,),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(idx2d, tab)
    return run

try:
    import numpy as np
    T, N = 4096, 1 << 15
    tab = jax.random.normal(key, (T, 128))
    idx = jax.random.randint(key, (N, 1), 0, T)
    f = jax.jit(make_onehot_gather(T, 128, N))
    out = f(idx, tab)
    expect = np.asarray(tab)[np.asarray(idx)[:, 0]]
    dt = bench(f, idx, tab)
    emit("pallas_onehot_gather_T4096", compiled=True,
         correct=bool(np.allclose(np.asarray(out), expect, atol=1e-1)),
         mrows_s=round(N / dt / 1e6, 2), ms=round(dt * 1e3, 2))
except Exception as e:
    emit("pallas_onehot_gather_T4096", error=str(e)[:300])

emit("done_pallas_probes")
