"""Round-3 probe: what actually limits the encode-backward scatter.

VERDICT r2 #1: 54.4 ms/step goes to ~3.7M scattered rows, but each hashed
level has only 4096 unique brick rows — ~98% of scattered rows are
duplicate targets. Before designing the dedup, measure what the scatter
engine is actually sensitive to:

  P1  scatter-add rate vs index structure (unique / sorted / random-dup)
  P2  f32 vs bf16 target
  P3  two-stage contention spread (bid*k + i%k then dense reduce)
  P4  sort_key_val rates at the real shapes
  P5  segment_sum sorted vs unsorted
  P6  cumsum / narrow-gather rates (dedup pipeline building blocks)

Methodology per PERF_NOTES §0: L independent ops inside ONE jitted program
(amortizes the ~26-32 ms dispatch floor), host-read sync, 3 reps.
"""
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
N, T, W = 1 << 18, 4096, 256
L = 14

rows_f32 = [jax.random.normal(jax.random.fold_in(key, 1000 + l), (N, W),
                              jnp.float32) for l in range(L)]
rows_bf16 = [r.astype(jnp.bfloat16) for r in rows_f32]


def timed(fn, *args, reps=3):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def scatter_bench(name, idx_list, rows, n_target):
    """L independent scatter-adds inside one program."""
    def f(rows_in, idxs):
        outs = []
        for l in range(L):
            tgt = jnp.zeros((n_target, W), rows_in[l].dtype)
            outs.append(tgt.at[idxs[l]].add(rows_in[l],
                                            mode="promise_in_bounds"))
        return outs

    jf = jax.jit(f)
    try:
        dt = timed(jf, rows, idx_list)
        emit(name, ms=round(dt * 1e3, 1),
             mrows_s=round(N * L / dt / 1e6, 1))
    except Exception as e:
        emit(name, error=str(e)[:200])


# --- P1/P2: index structure sensitivity -------------------------------------
mk = lambda l: jax.random.fold_in(key, l)
idx_random_T = [jax.random.randint(mk(l), (N,), 0, T, jnp.int32)
                for l in range(L)]
idx_sorted_T = [jnp.sort(i) for i in idx_random_T]
idx_unique_N = [jax.random.permutation(mk(l), N).astype(jnp.int32)
                for l in range(L)]
idx_iota_N = [jnp.arange(N, dtype=jnp.int32)] * L
idx_random_64 = [jax.random.randint(mk(l), (N,), 0, 64, jnp.int32)
                 for l in range(L)]
idx_random_32k = [jax.random.randint(mk(l), (N,), 0, 1 << 15, jnp.int32)
                  for l in range(L)]

scatter_bench("P1_bf16_random_mod4096", idx_random_T, rows_bf16, T)
scatter_bench("P1_bf16_sorted_mod4096", idx_sorted_T, rows_bf16, T)
scatter_bench("P1_bf16_unique_permN", idx_unique_N, rows_bf16, N)
scatter_bench("P1_bf16_iotaN", idx_iota_N, rows_bf16, N)
scatter_bench("P1_bf16_random_mod64", idx_random_64, rows_bf16, 64)
scatter_bench("P1_bf16_random_mod32768", idx_random_32k, rows_bf16, 1 << 15)
scatter_bench("P2_f32_random_mod4096", idx_random_T, rows_f32, T)
scatter_bench("P2_f32_unique_permN", idx_unique_N, rows_f32, N)


# --- P3: two-stage contention spread ----------------------------------------
def spread(k_spread):
    def f(rows_in, idxs):
        outs = []
        lane = jnp.arange(N, dtype=jnp.int32) % k_spread
        for l in range(L):
            tgt = jnp.zeros((T * k_spread, W), rows_in[l].dtype)
            acc = tgt.at[idxs[l] * k_spread + lane].add(
                rows_in[l], mode="promise_in_bounds")
            outs.append(acc.reshape(T, k_spread, W).sum(1))
        return outs

    jf = jax.jit(f)
    try:
        dt = timed(jf, rows_bf16, idx_random_T)
        emit(f"P3_bf16_spread_k{k_spread}", ms=round(dt * 1e3, 1),
             mrows_s=round(N * L / dt / 1e6, 1))
    except Exception as e:
        emit(f"P3_bf16_spread_k{k_spread}", error=str(e)[:200])


for k_spread in (4, 16, 64):
    spread(k_spread)


# --- P4: sort rates ---------------------------------------------------------
def sort_one(keys_):
    k2, v = jax.lax.sort_key_val(keys_, jnp.arange(keys_.shape[0],
                                                   dtype=jnp.int32))
    return k2, v


jf = jax.jit(sort_one)
k1 = idx_random_T[0]
dt = timed(jf, k1)
emit("P4_sort_262k", ms=round(dt * 1e3, 2),
     melem_s=round(N / dt / 1e6, 1))

kall = jnp.concatenate([idx_random_T[l] + l * T for l in range(L)])
dt = timed(jf, kall)
emit("P4_sort_3.7M_concat", ms=round(dt * 1e3, 2),
     melem_s=round(N * L / dt / 1e6, 1))


def sort_batched(keys_):
    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), keys_.shape)
    return jax.lax.sort((keys_, iota), dimension=1, num_keys=1)


kb = jnp.stack(idx_random_T)
dt = timed(jax.jit(sort_batched), kb)
emit("P4_sort_batched_14x262k", ms=round(dt * 1e3, 2),
     melem_s=round(N * L / dt / 1e6, 1))

# --- P5: segment_sum sorted vs unsorted -------------------------------------
def seg(sorted_, rows):
    idxs = idx_sorted_T if sorted_ else idx_random_T

    def f(rows_in):
        return [jax.ops.segment_sum(rows_in[l], idxs[l], num_segments=T,
                                    indices_are_sorted=sorted_)
                for l in range(L)]

    try:
        dt = timed(jax.jit(f), rows)
        emit(f"P5_segsum_sorted{sorted_}", ms=round(dt * 1e3, 1),
             mrows_s=round(N * L / dt / 1e6, 1))
    except Exception as e:
        emit(f"P5_segsum_sorted{sorted_}", error=str(e)[:200])


seg(False, rows_bf16)
seg(True, rows_bf16)

# --- P6: pipeline building blocks -------------------------------------------
def cumsum_f(rows_in):
    return [jnp.cumsum(rows_in[l], axis=0) for l in range(L)]


dt = timed(jax.jit(cumsum_f), rows_f32)
emit("P6_cumsum_14x262kx256_f32", ms=round(dt * 1e3, 1))

narrow = jax.random.normal(key, (N, 8), jnp.float32)


def narrow_gather(perms):
    return [narrow[perms[l]] for l in range(L)]


dt = timed(jax.jit(narrow_gather), idx_unique_N)
emit("P6_narrow_gather_14x262kx8", ms=round(dt * 1e3, 1),
     mrows_s=round(N * L / dt / 1e6, 1))

wide = rows_f32[0]


def wide_gather(perms):
    return [wide[perms[l]] for l in range(L)]


dt = timed(jax.jit(wide_gather), idx_unique_N)
emit("P6_wide_gather_14x262kx256", ms=round(dt * 1e3, 1),
     mrows_s=round(N * L / dt / 1e6, 1))
