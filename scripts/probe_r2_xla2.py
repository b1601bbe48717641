"""Probe round 2b: gather concurrency, interp layouts, realistic brick shapes."""
import json
import time

import jax
import jax.numpy as jnp


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

# -------- concurrency sweep: k independent gathers, narrow (8f) and wide (256f)
N = 1 << 18  # realistic per-step sample count
for width, T in [(8, 1 << 19), (256, 4096)]:
    tabs = [jax.random.normal(jax.random.PRNGKey(i), (T, width)) for i in range(16)]
    idxs = [jax.random.randint(jax.random.PRNGKey(100 + i), (N,), 0, T) for i in range(16)]
    for k in [1, 2, 4, 8, 16]:
        f = jax.jit(lambda ts, js: sum(t[j].sum() for t, j in zip(ts, js)))
        dt = bench(f, tabs[:k], idxs[:k])
        emit("gather_conc", width=width, k=k, total_mrows_s=round(k * N / dt / 1e6, 1),
             ms=round(dt * 1e3, 2))

# -------- scatter concurrency (wide rows, small tables — the brick backward)
T, width = 4096, 256
upds = [jax.random.normal(jax.random.PRNGKey(i), (N, width)) for i in range(16)]
idxs = [jax.random.randint(jax.random.PRNGKey(200 + i), (N,), 0, T) for i in range(16)]
for k in [1, 2, 4, 8, 16]:
    f = jax.jit(lambda us, js: sum(
        jnp.zeros((T, width), jnp.float32).at[j].add(u).sum() for u, j in zip(us, js)))
    dt = bench(f, upds[:k], idxs[:k])
    emit("scatter_conc", width=width, k=k, total_mrows_s=round(k * N / dt / 1e6, 1),
         ms=round(dt * 1e3, 2))

# -------- combined fwd+bwd through a gather (what autodiff actually emits)
tab = jax.random.normal(key, (4096, 256))
idx = jax.random.randint(key, (N,), 0, 4096)
w = jax.random.normal(key, (N, 256))
f = jax.jit(jax.grad(lambda t: (t[idx] * w).sum()))
dt = bench(f, tab)
emit("gather_vjp_wide", ms=round(dt * 1e3, 2), mrows_s=round(N / dt / 1e6, 1))

# -------- interp layouts: weighted reduce of gathered brick rows
# layout P: planes (N, F, V) with V=128 on lanes
V, F = 128, 2
rows_p = jax.random.normal(key, (N, F, V))
wgt = jax.random.normal(key, (N, 1, V))
f = jax.jit(lambda r, w: (r * w).sum(-1))
dt = bench(f, rows_p, wgt)
emit("interp_planes", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# layout Q: single (N, 256) row -> reshape (N, 2, 128)
rows_q = jax.random.normal(key, (N, 256))
f = jax.jit(lambda r, w: (r.reshape(N, 2, V) * w).sum(-1))
dt = bench(f, rows_q, wgt)
emit("interp_reshape", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# layout R: F-major halves of the lane dim: (N,256) -> out_f = sum(r[:, f*128:(f+1)*128]*w)
f = jax.jit(lambda r, w: jnp.stack([(r[:, :128] * w[:, 0]).sum(-1),
                                    (r[:, 128:] * w[:, 0]).sum(-1)], -1))
dt = bench(f, rows_q, wgt)
emit("interp_slices", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- weight-vector construction (hat weights -> 125 padded to 128 lanes)
u = jax.random.uniform(key, (N, 3)) * 4.0
def build_w(u):
    iota = jnp.arange(5.0)
    wx = jnp.maximum(0, 1 - jnp.abs(u[:, 0:1] - iota))  # N,5
    wy = jnp.maximum(0, 1 - jnp.abs(u[:, 1:2] - iota))
    wz = jnp.maximum(0, 1 - jnp.abs(u[:, 2:3] - iota))
    w = (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :])
    return jnp.pad(w.reshape(N, 125), ((0, 0), (0, 3)))
f = jax.jit(build_w)
dt = bench(f, u)
emit("weight_build", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- full brick level fwd: gather + weights + interp fused under one jit
tab = jax.random.normal(key, (4096, 256))
bid = jax.random.randint(key, (N,), 0, 4096)
def level_fwd(tab, bid, u):
    rows = tab[bid]
    w = build_w(u)
    return jnp.stack([(rows[:, :128] * w).sum(-1), (rows[:, 128:] * w).sum(-1)], -1)
f = jax.jit(level_fwd)
dt = bench(f, tab, bid, u)
emit("brick_level_fwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- full level fwd+bwd wrt table
f = jax.jit(jax.grad(lambda t: level_fwd(t, bid, u).sum()))
dt = bench(f, tab)
emit("brick_level_fwd_bwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- 16 levels fwd+bwd (the full encode train cost, brick layout)
tabs16 = [jax.random.normal(jax.random.PRNGKey(i), (4096, 256)) for i in range(16)]
bids16 = [jax.random.randint(jax.random.PRNGKey(50 + i), (N,), 0, 4096) for i in range(16)]
def enc16(tabs):
    outs = [level_fwd(t, b, u) for t, b in zip(tabs, bids16)]
    return jnp.concatenate(outs, -1)
f = jax.jit(jax.grad(lambda ts: enc16(ts).sum()))
dt = bench(f, tabs16)
emit("brick_enc16_fwd_bwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

f = jax.jit(enc16)
dt = bench(f, tabs16)
emit("brick_enc16_fwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

emit("done_xla2")
