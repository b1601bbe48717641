"""One stacked scatter for all hashed levels vs 14 per-level scatters."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())

def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)

key = jax.random.PRNGKey(0)
N, T, W, L = 1 << 18, 4096, 256, 14
bids = jax.random.randint(key, (N, L), 0, T, dtype=jnp.int32)
contrib = jax.random.normal(jax.random.fold_in(key, 1), (N, W),
                            jnp.bfloat16)

def time_fn(f, *args, reps=3):
    sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

# A: 14 per-level scatters (the current backward shape)
@jax.jit
def per_level(bids, contrib):
    outs = []
    for l in range(L):
        gt = jnp.zeros((T, W), jnp.bfloat16).at[bids[:, l]].add(contrib)
        outs.append(gt)
    return outs

tA = time_fn(per_level, bids, contrib)
emit("per_level_14", ms=round(tA * 1e3, 1),
     mrows_per_s=round(N * L / tA / 1e6, 1))

# B: one stacked scatter
@jax.jit
def stacked(bids, contrib):
    flat = (bids + jnp.arange(L, dtype=jnp.int32)[None, :] * T).reshape(-1)
    big = jnp.broadcast_to(contrib[:, None, :], (N, L, W)).reshape(-1, W)
    return jnp.zeros((T * L, W), jnp.bfloat16).at[flat].add(big)

tB = time_fn(stacked, bids, contrib)
emit("stacked_1", ms=round(tB * 1e3, 1),
     mrows_per_s=round(N * L / tB / 1e6, 1))

# C: per-level, f32 target with bf16 values
@jax.jit
def per_level_f32(bids, contrib):
    c = contrib.astype(jnp.float32)
    outs = []
    for l in range(L):
        gt = jnp.zeros((T, W), jnp.float32).at[bids[:, l]].add(c)
        outs.append(gt)
    return outs

tC = time_fn(per_level_f32, bids, contrib)
emit("per_level_f32", ms=round(tC * 1e3, 1),
     mrows_per_s=round(N * L / tC / 1e6, 1))
