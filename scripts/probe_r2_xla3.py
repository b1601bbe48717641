"""Probe 2c: dispatch amortization via lax.scan, fixed vjp probe, interp layouts."""
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
N = 1 << 18

# -------- dispatch floor: trivial op
x = jnp.ones((128, 128))
f = jax.jit(lambda x: x + 1.0)
dt = bench(f, x, iters=10, warmup=3)
emit("dispatch_floor_tiny", ms=round(dt * 1e3, 2))

# -------- scan amortization: K gathers sequentially dependent inside one call
T = 1 << 19
tab = jax.random.normal(key, (T, 8))
idx = jax.random.randint(key, (N,), 0, T)
for K in [1, 4, 16]:
    def run(tab, idx, K=K):
        def body(c, _):
            c = c + tab[(idx + jnp.int32(c[0, 0])) % T].sum(-1, keepdims=True)[:128]
            return c, ()
        c, _ = jax.lax.scan(body, jnp.zeros((128, 1)), None, length=K)
        return c
    f = jax.jit(run)
    dt = bench(f, tab, idx)
    emit("gather_scan_dep", K=K, ms=round(dt * 1e3, 2),
         marginal_mrows_s=None if K == 1 else round((K - 1) * N / max(dt - 0.026, 1e-4) / 1e6, 1))

# -------- gather vjp (wide rows, w passed as arg)
tabw = jax.random.normal(key, (4096, 256))
bid = jax.random.randint(key, (N,), 0, 4096)
w = jax.random.normal(key, (N, 256))
f = jax.jit(jax.grad(lambda t, w: (t[bid] * w).sum(), argnums=0))
dt = bench(f, tabw, w)
emit("gather_vjp_wide", ms=round(dt * 1e3, 2))

# -------- interp layouts
V, F = 128, 2
rows_p = jax.random.normal(key, (N, F, V))
wgt = jax.random.normal(key, (N, 1, V))
f = jax.jit(lambda r, w: (r * w).sum(-1))
dt = bench(f, rows_p, wgt)
emit("interp_planes", ms=round(dt * 1e3, 2))

rows_q = jax.random.normal(key, (N, 256))
wg2 = jax.random.normal(key, (N, V))
f = jax.jit(lambda r, w: jnp.stack([(r[:, :128] * w).sum(-1),
                                    (r[:, 128:] * w).sum(-1)], -1))
dt = bench(f, rows_q, wg2)
emit("interp_slices", ms=round(dt * 1e3, 2))

# -------- weight build
u = jax.random.uniform(key, (N, 3)) * 4.0
def build_w(u):
    iota = jnp.arange(5.0)
    wx = jnp.maximum(0, 1 - jnp.abs(u[:, 0:1] - iota))
    wy = jnp.maximum(0, 1 - jnp.abs(u[:, 1:2] - iota))
    wz = jnp.maximum(0, 1 - jnp.abs(u[:, 2:3] - iota))
    w = (wx[:, :, None, None] * wy[:, None, :, None] * wz[:, None, None, :])
    return jnp.pad(w.reshape(N, 125), ((0, 0), (0, 3)))
f = jax.jit(build_w)
dt = bench(f, u)
emit("weight_build", ms=round(dt * 1e3, 2))

# -------- full 16-level brick encode fwd and fwd+bwd, one jit call
tabs16 = [jax.random.normal(jax.random.PRNGKey(i), (4096, 256)) for i in range(16)]
bids16 = [jax.random.randint(jax.random.PRNGKey(50 + i), (N,), 0, 4096) for i in range(16)]

def level_fwd(tab, bid, w):
    rows = tab[bid]
    return jnp.stack([(rows[:, :128] * w).sum(-1), (rows[:, 128:] * w).sum(-1)], -1)

def enc16(tabs, u):
    w = build_w(u)
    outs = [level_fwd(t, b, w) for t, b in zip(tabs, bids16)]
    return jnp.concatenate(outs, -1)

f = jax.jit(enc16)
dt = bench(f, tabs16, u)
emit("brick_enc16_fwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

f = jax.jit(jax.grad(lambda ts, u: enc16(ts, u).sum(), argnums=0))
dt = bench(f, tabs16, u)
emit("brick_enc16_fwd_bwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- same but bf16 tables
tabs16b = [t.astype(jnp.bfloat16) for t in tabs16]
def enc16b(tabs, u):
    w = build_w(u)
    outs = []
    for t, b in zip(tabs, bids16):
        rows = t[b].astype(jnp.float32)
        outs.append(jnp.stack([(rows[:, :128] * w).sum(-1),
                               (rows[:, 128:] * w).sum(-1)], -1))
    return jnp.concatenate(outs, -1)
f = jax.jit(enc16b)
dt = bench(f, tabs16b, u)
emit("brick_enc16_fwd_bf16", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

# -------- classic narrow encode fwd+bwd for comparison (8 corners x 16 levels)
tabs_n = [jax.random.normal(jax.random.PRNGKey(i), (T, 2)) for i in range(16)]
cids = [jax.random.randint(jax.random.PRNGKey(70 + i), (N, 8), 0, T) for i in range(16)]
cw = jax.random.dirichlet(key, jnp.ones(8), (N,))
def enc_classic(tabs):
    outs = []
    for t, c in zip(tabs, cids):
        rows = t[c]  # N,8,2
        outs.append((rows * cw[..., None]).sum(1))
    return jnp.concatenate(outs, -1)
f = jax.jit(enc_classic)
dt = bench(f, tabs_n)
emit("classic_enc16_fwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))
f = jax.jit(jax.grad(lambda ts: enc_classic(ts).sum()))
dt = bench(f, tabs_n)
emit("classic_enc16_fwd_bwd", ms=round(dt * 1e3, 2), msamples_s=round(N / dt / 1e6, 1))

emit("done_xla3")
