"""Round-3 probe E: small-brick grouped rows — find the issue/bandwidth knee.

The 4^3 brick fetches 128 verts where trilinear needs 8 (16x bytes); the
render/train gathers and the backward scatter are BYTES-bound at those
widths (55-110 GB/s), while narrow rows are ISSUE-bound (~79 Mrows/s).
2^3-cell bricks grouped 3 levels/row (key 3^3=27 verts -> 32 lanes, two
coarser members 4^3=64 lanes each => 160 lanes x F features = 640 B bf16)
should sit at the knee. Measure scatter-add and gather at the candidate
row shapes and counts, including the in-situ outer-product production of
the scattered rows.

  widths (f32 elems, bf16 bytes): 192 (384 B), 320 (640 B), 448 (896 B)
  rows: 1.23M (triples), 0.74M (quints); targets 8-16k rows
"""
import json
import time

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def timed(fn, *args, reps=3):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


key = jax.random.PRNGKey(0)

# (label, n_ops, rows_per_op, width_elems, target_rows)
CASES = [
    ("triple2_w320_4ops", 4, 1 << 18, 320, 9832),   # 2^3-brick triples, L16 shape
    ("pair2_w192_6ops", 6, 1 << 18, 192, 10922),
    ("quint2_w448_2ops", 2, 1 << 18, 448, 11712),
    ("ref_triple4_w768_4ops", 4, 1 << 18, 768, 4096),  # current brick3 shape
]

for label, L, N, W, T in CASES:
    rows = [jax.random.normal(jax.random.fold_in(key, 10 + l), (N, W),
                              jnp.float32).astype(jnp.bfloat16)
            for l in range(L)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 50 + l), (N,), 0, T,
                               jnp.int32) for l in range(L)]

    def scat(rows_in, idx_in):
        return [jnp.zeros((T, W), jnp.bfloat16)
                .at[idx_in[l]].add(rows_in[l], mode="promise_in_bounds")
                for l in range(L)]

    dt = timed(jax.jit(scat), rows, idxs)
    emit(f"{label}_scatter", ms=round(dt * 1e3, 1),
         mrows_s=round(N * L / dt / 1e6, 1),
         gb_s=round(N * L * W * 2 / dt / 1e9, 1))

    tabs = [jax.random.normal(jax.random.fold_in(key, 80 + l), (T, W),
                              jnp.float32).astype(jnp.bfloat16)
            for l in range(L)]

    def gath(tabs_in, idx_in):
        return [tabs_in[l][idx_in[l]] for l in range(L)]

    dt = timed(jax.jit(gath), tabs, idxs)
    emit(f"{label}_gather", ms=round(dt * 1e3, 1),
         mrows_s=round(N * L / dt / 1e6, 1),
         gb_s=round(N * L * W * 2 / dt / 1e9, 1))

# in-situ shape: W rows produced as masked outer products (like the encode
# backward: wl [N, lanes] * g [N, F] per member block), then scattered
for label, L, N, W, T in CASES[:1]:
    wls = [jax.random.uniform(jax.random.fold_in(key, 90 + l),
                              (N, W // 2), jnp.float32).astype(jnp.bfloat16)
           for l in range(L)]
    gs = [jax.random.uniform(jax.random.fold_in(key, 95 + l),
                             (N, 2), jnp.float32).astype(jnp.bfloat16)
          for l in range(L)]
    idxs = [jax.random.randint(jax.random.fold_in(key, 50 + l), (N,), 0, T,
                               jnp.int32) for l in range(L)]

    def insitu(wl_in, g_in, idx_in):
        outs = []
        for l in range(L):
            w = jnp.concatenate([wl_in[l] * g_in[l][:, 0:1],
                                 wl_in[l] * g_in[l][:, 1:2]], -1)
            outs.append(jnp.zeros((T, W), jnp.bfloat16)
                        .at[idx_in[l]].add(w, mode="promise_in_bounds"))
        return outs

    dt = timed(jax.jit(insitu), wls, gs, idxs)
    emit(f"{label}_insitu_scatter", ms=round(dt * 1e3, 1),
         mrows_s=round(N * L / dt / 1e6, 1))

# non-pow2 hash mod via 24-bit mask + f32 floor-div (budget-exact rows)
h = jax.random.randint(key, (1 << 18, 4), 0, 1 << 30, jnp.int32).astype(jnp.uint32)


def mod_f32(hv):
    n = 9832.0
    h24 = (hv & jnp.uint32((1 << 24) - 1)).astype(jnp.float32)
    return (h24 - jnp.floor(h24 / n) * n).astype(jnp.int32)


def mod_pow2(hv):
    return (hv & jnp.uint32(8191)).astype(jnp.int32)


d1 = timed(jax.jit(mod_f32), h)
d2 = timed(jax.jit(mod_pow2), h)
emit("mod_f32_vs_pow2", f32_ms=round(d1 * 1e3, 2), pow2_ms=round(d2 * 1e3, 2))
