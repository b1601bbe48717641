"""Measure brick encode + full NGP step on the real chip (L16F2 parity)."""
import json
import time

import jax
import jax.numpy as jnp

from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.ops import brick_grid as bg


def sync(x):
    import functools

    import jax as _jax
    leaves = _jax.tree_util.tree_leaves(x)
    total = functools.reduce(lambda a, b: a + b.astype(jnp.float32).sum(),
                             leaves, jnp.float32(0))
    return float(total)


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

cfg = ngp.HashGridConfig()  # L16F2, 2^19, desired 2048
levels = bg.compute_brick_levels(cfg)
table = bg.init_brick_table(key, cfg, levels)
pos = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

f = jax.jit(lambda t, p: bg.brick_encode(t, p, cfg, levels))
dt = bench(f, table, pos)
emit("brick_encode_L16F2_fwd", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))

g = jax.jit(jax.grad(lambda t, p: bg.brick_encode(t, p, cfg, levels).sum(),
                     argnums=0))
dt = bench(g, table, pos)
emit("brick_encode_L16F2_fwd_bwd", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))

# classic XLA hash encode for comparison
levels_c = ngp.compute_levels(cfg)
table_c = ngp.init_hash_table(jax.random.PRNGKey(2), cfg, levels_c)
fc = jax.jit(lambda t, p: ngp.hash_encode(t, p, cfg, levels_c))
dt = bench(fc, table_c, pos, iters=2)
emit("classic_encode_L16F2_fwd", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))
gc = jax.jit(jax.grad(lambda t, p: ngp.hash_encode(t, p, cfg, levels_c).sum(),
                      argnums=0))
dt = bench(gc, table_c, pos, iters=2)
emit("classic_encode_L16F2_fwd_bwd", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))

# full model fwd (encode + SH + MLPs), brick, bf16 MLP
mcfg = ngp.NGPModelConfig(use_bf16=True, grid_impl="brick")
model = ngp.NGPModel(mcfg)
params = model.init(jax.random.PRNGKey(3))
dirs = jax.random.uniform(jax.random.PRNGKey(4), (N, 3))
fm = jax.jit(lambda pr, p, d: model.apply(pr, p, d))
dt = bench(fm, params, pos, dirs)
emit("ngp_model_fwd_brick", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))

gm = jax.jit(jax.grad(lambda pr, p, d: model.apply(pr, p, d).sum()))
dt = bench(gm, params, pos, dirs)
emit("ngp_model_fwd_bwd_brick", n=N, ms=round(dt * 1e3, 2),
     msamples_s=round(N / dt / 1e6, 1))

# K-step scan over model fwd+bwd+sgd to amortize dispatch (upper-bound train)
import optax
tx = optax.adam(1e-2, eps=1e-15)
opt_state = tx.init(params)


def make_scan(K):
    def step(carry, k):
        params, opt_state = carry
        p = jax.random.uniform(k, (N, 3))
        d = jax.random.uniform(k, (N, 3))
        def loss(pr):
            return (model.apply(pr, p, d) ** 2).mean()
        grads = jax.grad(loss)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return (params, opt_state), ()

    @jax.jit
    def run(params, opt_state, key):
        ks = jax.random.split(key, K)
        (params, opt_state), _ = jax.lax.scan(step, (params, opt_state), ks)
        return params

    return run


def sync_tree(t):
    return sync(jax.tree_util.tree_reduce(
        lambda a, b: a + b.astype(jnp.float32).sum(), t, jnp.float32(0)))


for K in [1, 8]:
    f = make_scan(K)
    for _ in range(1):
        sync_tree(f(params, opt_state, key))
    t0 = time.perf_counter()
    for _ in range(2):
        sync_tree(f(params, opt_state, key))
    dt = (time.perf_counter() - t0) / 2
    emit("ngp_scan_steps", K=K, ms_per_step=round(dt * 1e3 / K, 2),
         msamples_s=round(K * N / dt / 1e6, 1))

emit("done_brick_bench")
