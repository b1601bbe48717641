"""Decompose the flagship (OriginNeRF MXU field) train step cost.

Stages: bare MLP fwd / fwd+bwd at the step's sample count, march-only,
full train block. Finds where the MXU utilization goes.
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
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

RAYS = 8192
K = 32
N = RAYS * K
S = 4


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"stage": name, **kw}), flush=True)


def marginal(make_fn, reps=(1, 4)):
    times = {}
    for k in reps:
        f = make_fn(k)
        sync(f())
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = f()
        sync(out)
        times[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (times[k1] - times[k0]) / (k1 - k0) * 1e3


model = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
params = model.init(jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)
pos = jax.random.uniform(key, (N, 3))
dirs = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3))


def scanned(body):
    def make(k):
        @jax.jit
        def run():
            def one(c, i):
                return body(c, i), 0.0
            c, _ = jax.lax.scan(one, 0.0, jnp.arange(k))
            return c
        return run
    return make


# 1. MLP fwd
ms = marginal(scanned(lambda c, i: model.apply(
    params, pos + c * 1e-9, dirs).astype(jnp.float32).sum() + c))
emit("mlp_fwd", ms=round(ms, 2), n=N)

# 1b. MLP fwd/fwd+bwd shape sweep: the GARF round-4 finding (PERF_NOTES §9)
# says XLA:TPU layout choice depends on leading batch dims being pow2 —
# check whether the flagship's flat [N, C] activations also leave time on
# the table vs non-pow2 tilings of the same samples
for tag, shape in [("flat", (N, 3)), ("tile12x", (12, -(-N // 12), 3)),
                   ("tile4d", (12, -(-N // (12 * K)), K, 3))]:
    n_pad = int(np.prod(shape[:-1]))
    p2 = jnp.concatenate([pos, pos[:n_pad - N]]).reshape(shape)
    d2 = jnp.concatenate([dirs, dirs[:n_pad - N]]).reshape(shape)

    def fb_shape(c, i, p2=p2, d2=d2):
        def loss(p):
            return (model.apply(p, p2 + c * 1e-9, d2)
                    .astype(jnp.float32) ** 2).sum()
        g = jax.grad(loss)(params)
        return sum(l.astype(jnp.float32).sum()
                   for l in jax.tree_util.tree_leaves(g)) + c

    ms_f = marginal(scanned(lambda c, i, p2=p2, d2=d2: model.apply(
        params, p2 + c * 1e-9, d2).astype(jnp.float32).sum() + c))
    ms_fb = marginal(scanned(fb_shape))
    emit("mlp_shape", shape=tag, dims=list(shape[:-1]),
         fwd_ms=round(ms_f, 2), fwd_bwd_ms=round(ms_fb, 2))

# 1c. march-only (fused marcher at the step's ray count; no MLP)
from myc_nerfs_tpu.render.ngp_render import march_rays_fused  # noqa: E402

occ_cfg0 = occ.OccupancyConfig()
st0 = occ.init_occupancy(occ_cfg0)
centers0 = occ.cell_centers(occ_cfg0, 0)
ball0 = jnp.linalg.norm(centers0 - 0.5, axis=-1) < 0.3
grid0 = jnp.where(ball0, 0.05, 0.0)
st0 = st0._replace(bitfield=st0.bitfield.at[0].set(ball0),
                   density_grid=st0.density_grid.at[0].set(grid0),
                   mean_density=jnp.maximum(grid0, 0.0).mean())
rcfg0 = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=K)
theta0 = jax.random.uniform(key, (RAYS,)) * 6.28
o0 = jnp.stack([0.5 + 1.4 * jnp.cos(theta0), 0.5 + 1.4 * jnp.sin(theta0),
                jnp.full((RAYS,), 0.5)], -1)
d0 = 0.5 - o0
d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)

ms = marginal(scanned(lambda c, i: march_rays_fused(
    occ_cfg0, rcfg0, st0, o0 + c * 1e-12, d0,
    jax.random.PRNGKey(0)).positions.sum() + c))
emit("march_only", ms=round(ms, 2), rays=RAYS, n_coarse=128)
ms = marginal(scanned(lambda c, i: march_rays_fused(
    occ_cfg0, NGPRenderConfig(aabb_scale=1, n_coarse=64, n_samples=K),
    st0, o0 + c * 1e-12, d0, jax.random.PRNGKey(0)).positions.sum() + c))
emit("march_only", ms=round(ms, 2), rays=RAYS, n_coarse=64)

# 2. MLP fwd+bwd (squared loss + all-leaf readout: a sum() loss makes
# head grads constant and reading one leaf lets XLA DCE the backward)
def fb(c, i):
    def loss(p):
        return (model.apply(p, pos + c * 1e-9, dirs)
                .astype(jnp.float32) ** 2).sum()
    g = jax.grad(loss)(params)
    return sum(l.astype(jnp.float32).sum()
               for l in jax.tree_util.tree_leaves(g)) + c

ms = marginal(scanned(fb))
# flops: per sample fwd ~ (3->256 + 7x256x256 + heads) x2 ; x3 for fwd+bwd
flops = N * (256 * 3 + 7 * 256 * 256 + 256 * 4 + 256 * 3 * 2) * 2 * 3
emit("mlp_fwd_bwd", ms=round(ms, 2), n=N,
     tflops_per_s=round(flops / (ms * 1e-3) / 1e12, 1))

# 3. full train block
occ_cfg = occ.OccupancyConfig()
st = occ.init_occupancy(occ_cfg)
centers = occ.cell_centers(occ_cfg, 0)
ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
grid = jnp.where(ball, 0.05, 0.0)
st = st._replace(bitfield=st.bitfield.at[0].set(ball),
                 density_grid=st.density_grid.at[0].set(grid),
                 mean_density=jnp.maximum(grid, 0.0).mean())
rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=K)
tcfg = NGPTrainConfig(n_rays_per_batch=RAYS, update_den_freq=S)
trainer = NGPTrainer(None, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
trainer.state = trainer.state._replace(occ=st)
theta = jax.random.uniform(key, (S * RAYS,)) * 6.28
phi = jax.random.uniform(jax.random.fold_in(key, 5), (S * RAYS,)) * 3.14
o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
               0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
               0.5 + 1.4 * jnp.cos(phi)], -1)
d = 0.5 - o
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
o = o.reshape(S, RAYS, 3)
d = d.reshape(S, RAYS, 3)
tgt = jax.random.uniform(jax.random.fold_in(key, 7), (S, RAYS, 3))
trainer.train_block(o, d, tgt, jax.random.PRNGKey(3))
sync(trainer.state.params)
t0 = time.perf_counter()
for _ in range(3):
    trainer.train_block(o, d, tgt, jax.random.PRNGKey(4))
sync(trainer.state.params)
dt = (time.perf_counter() - t0) / 3 / S
emit("full_train_step", ms=round(dt * 1e3, 2), rays=RAYS,
     krays_per_s=round(RAYS / dt / 1e3, 1))
