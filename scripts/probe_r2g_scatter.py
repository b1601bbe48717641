"""Scatter-transpose variants at the real encode shapes.

One level: N=262144 samples, table [4096, 256]. Measures fwd+bwd of a
gather-dot-sum per variant (marginal over 2 stacked levels vs 1... here:
direct per-variant time of a 14-level loop to mirror the real graph).
"""
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())

def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)

key = jax.random.PRNGKey(0)
N, T, W = 1 << 18, 4096, 256
L = 14
tables = [jax.random.normal(jax.random.fold_in(key, l), (T, W), jnp.float32)
          for l in range(L)]
bids = jax.random.randint(jax.random.fold_in(key, 99), (N, L), 0, T,
                          dtype=jnp.int32)
wl = jax.random.uniform(jax.random.fold_in(key, 98), (N, 128), jnp.float32)


def run_variant(name, encode_level):
    def loss(tabs):
        acc = 0.0
        for l in range(L):
            f = encode_level(tabs[l], bids[:, l])
            acc = acc + f.sum()
        return acc

    g = jax.jit(jax.grad(loss))
    try:
        out = g(tables)
        sync(out[0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = g(tables)
        sync(out[0])
        dt = (time.perf_counter() - t0) / reps
        emit(name, ms=round(dt * 1e3, 1),
             scatter_mrows_per_s=round(N * L / dt / 1e6, 1))
    except Exception as e:
        emit(name, error=str(e)[:200])


wl16 = wl.astype(jnp.bfloat16)

# A: current shape — cast table to bf16, gather, weight, sum
def enc_A(tab, idx):
    tab = tab.astype(jnp.bfloat16)
    rows = tab[idx]
    return ((rows[:, :128] * wl16).sum(-1) + (rows[:, 128:] * wl16).sum(-1))

run_variant("A_bf16_gather_autodiff", enc_A)

# B: f32 gather (scatter transpose in f32)
def enc_B(tab, idx):
    rows = tab[idx]
    return ((rows[:, :128] * wl).sum(-1) + (rows[:, 128:] * wl).sum(-1))

run_variant("B_f32_gather_autodiff", enc_B)

# C: promise_in_bounds take, bf16
def enc_C(tab, idx):
    tab = tab.astype(jnp.bfloat16)
    rows = tab.at[idx].get(mode="promise_in_bounds")
    return ((rows[:, :128] * wl16).sum(-1) + (rows[:, 128:] * wl16).sum(-1))

run_variant("C_bf16_promise_autodiff", enc_C)

# D: custom vjp — explicit .at[].add scatter, bf16, promise_in_bounds
@jax.custom_vjp
def gather_dot_D(tab, idx):
    tab16 = tab.astype(jnp.bfloat16)
    rows = tab16.at[idx].get(mode="promise_in_bounds")
    return (rows[:, :128] * wl16).sum(-1) + (rows[:, 128:] * wl16).sum(-1)

def D_fwd(tab, idx):
    return gather_dot_D(tab, idx), idx

def D_bwd(idx, g):
    g16 = g.astype(jnp.bfloat16)
    contrib = jnp.concatenate([wl16 * g16[:, None], wl16 * g16[:, None]], -1)
    gt = jnp.zeros((T, W), jnp.bfloat16).at[idx].add(
        contrib, mode="promise_in_bounds")
    return gt.astype(jnp.float32), None

gather_dot_D.defvjp(D_fwd, D_bwd)
run_variant("D_customvjp_bf16_promise", lambda tab, idx: gather_dot_D(tab, idx))

# E: segment_sum backward (unsorted)
@jax.custom_vjp
def gather_dot_E(tab, idx):
    tab16 = tab.astype(jnp.bfloat16)
    rows = tab16.at[idx].get(mode="promise_in_bounds")
    return (rows[:, :128] * wl16).sum(-1) + (rows[:, 128:] * wl16).sum(-1)

def E_fwd(tab, idx):
    return gather_dot_E(tab, idx), idx

def E_bwd(idx, g):
    g16 = g.astype(jnp.bfloat16)
    contrib = jnp.concatenate([wl16 * g16[:, None], wl16 * g16[:, None]], -1)
    gt = jax.ops.segment_sum(contrib, idx, num_segments=T)
    return gt.astype(jnp.float32), None

gather_dot_E.defvjp(E_fwd, E_bwd)
run_variant("E_customvjp_segsum", lambda tab, idx: gather_dot_E(tab, idx))
