"""Round-3 probe C: end-to-end encode shapes with floor-cancelling timing.

Compares today's per-level hashed encode (12 tables, 256-wide rows) against
paired (6 x 512) and tripled (4 x 768) level packing, fwd and fwd+bwd.
Marginal timing: run k=1 and k=2 copies of the whole graph inside one jit;
marginal = t(k=2) - t(k=1) cancels the ~30 ms axon dispatch floor.
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
N, T = 1 << 18, 4096


def build(n_tables, width, seed):
    tabs = [jax.random.normal(jax.random.fold_in(key, seed + l), (T, width),
                              jnp.float32) for l in range(n_tables)]
    idxs = [jax.random.randint(jax.random.fold_in(key, seed + 50 + l),
                               (N,), 0, T, jnp.int32)
            for l in range(n_tables)]
    wls = [jax.random.uniform(jax.random.fold_in(key, seed + 99 + l),
                              (N, 128), jnp.float32).astype(jnp.bfloat16)
           for l in range(n_tables)]
    return tabs, idxs, wls


def encode_graph(tabs, idxs, wls, width):
    feats = []
    for l in range(len(tabs)):
        rows = tabs[l].astype(jnp.bfloat16)[idxs[l]]
        for v in range(width // 128):
            feats.append((rows[:, v * 128:(v + 1) * 128] * wls[l]).sum(-1))
    return jnp.stack(feats, -1)


def bench(label, n_tables, width):
    sets = [build(n_tables, width, 1000 * k) for k in range(2)]

    def fwd_k(k):
        def f(all_tabs):
            return sum(encode_graph(all_tabs[j], sets[j][1], sets[j][2],
                                    width).astype(jnp.float32).sum()
                       for j in range(k))
        return f

    t1 = timed(jax.jit(fwd_k(1)), [sets[0][0]])
    t2 = timed(jax.jit(fwd_k(2)), [sets[0][0], sets[1][0]])
    emit(f"{label}_fwd", marginal_ms=round((t2 - t1) * 1e3, 1),
         t1_ms=round(t1 * 1e3, 1))

    g1 = jax.jit(jax.grad(fwd_k(1)))
    g2 = jax.jit(jax.grad(fwd_k(2)))
    t1 = timed(g1, [sets[0][0]])
    t2 = timed(g2, [sets[0][0], sets[1][0]])
    emit(f"{label}_fwdbwd", marginal_ms=round((t2 - t1) * 1e3, 1),
         t1_ms=round(t1 * 1e3, 1))


bench("single12_w256", 12, 256)
bench("paired6_w512", 6, 512)
bench("triple4_w768", 4, 768)
