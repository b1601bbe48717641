"""Round-4: does the non-pow2 leading-dim tiling (PERF_NOTES §9) also
accelerate the FLAGSHIP bf16 MLP (OriginNeRF, 8x256, skips=())?

profile_flagship's quick sweep suggested flat [262144, C] runs ~8x slower
than [12, 21846, C] — this probe re-measures with medians over repeated
k-slope marginals in a clean process. If confirmed, render_marched should
tile before the field apply.

Usage: python scripts/probe_r4_flagship_shape.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel

N = 262144
model = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
params = model.init(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)
pos0 = jax.random.uniform(key, (N, 3))
dir0 = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3))


def sync(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0],
                             jnp.float32).sum())


def scanned(body, k):
    @jax.jit
    def run():
        def one(c, i):
            return body(c, i), 0.0
        c, _ = jax.lax.scan(one, 0.0, jnp.arange(k))
        return c
    return run


def marginal(body, reps=(2, 10), n_meas=5):
    outs = []
    fns = {k: scanned(body, k) for k in reps}
    for k in reps:
        sync(fns[k]())
    for _ in range(n_meas):
        ts = {}
        for k in reps:
            t0 = time.perf_counter()
            out = fns[k]()
            sync(out)
            ts[k] = time.perf_counter() - t0
        outs.append((ts[reps[1]] - ts[reps[0]]) / (reps[1] - reps[0]) * 1e3)
    return float(np.median(outs))


def emit(**kw):
    print(json.dumps(kw), flush=True)


for tag, dims in [("flat", (N,)), ("tile8", (8, 32768)),
                  ("tile32", (32, 8192)), ("tile128", (128, 2048)),
                  ("tile2048", (2048, 128))]:
    n_pad = int(np.prod(dims))
    p = jnp.concatenate([pos0, pos0[:n_pad - N]]).reshape(dims + (3,))
    d = jnp.concatenate([dir0, dir0[:n_pad - N]]).reshape(dims + (3,))

    def fwd(c, i, p=p, d=d):
        return model.apply(params, p + c * 1e-9, d).astype(jnp.float32).sum() + c

    def fwd_bwd(c, i, p=p, d=d):
        def loss(prm):
            # nonlinear in the outputs: a sum() loss makes several head
            # grads constant and XLA dead-code-eliminates the backward
            return (model.apply(prm, p + c * 1e-9, d)
                    .astype(jnp.float32) ** 2).sum()
        g = jax.grad(loss)(params)
        # consume EVERY leaf — reading one leaf lets XLA prune the rest
        return sum(l.astype(jnp.float32).sum()
                   for l in jax.tree_util.tree_leaves(g)) + c

    ms_f = marginal(fwd)
    ms_fb = marginal(fwd_bwd)
    emit(shape=tag, dims=list(dims), fwd_ms=round(ms_f, 2),
         fwd_bwd_ms=round(ms_fb, 2),
         fwd_tflops=round(N * 2 * (63 * 256 + 6 * 256 * 256 + 256 * 4
                                   + 256 * 3 + 283 * 128 + 128 * 3)
                          / (ms_f * 1e-3) / 1e12, 1))
