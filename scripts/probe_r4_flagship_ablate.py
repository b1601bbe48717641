"""Round-4 flagship train-step knockouts (VERDICT r4 #4).

profile_flagship decomposes to MLP fwd+bwd 12.3 ms + march 7.9 ms at the
34.8 ms step — ~14.6 ms unattributed. This probe measures the REAL
train_block with targeted knockouts:
  full        the shipped step (S-step scan, no grid update)
  mlp_stub    model.apply/density replaced by a 3->4 linear (same step
              graph, negligible MLP) -> everything-but-the-MLP
  coarse64    n_coarse 128 -> 64 (march bytes halved)
  S16         16-step scan (reference update cadence) incl. grid update,
              vs the bench's steps_per_block=4
Prints ms/step per variant.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

RAYS, K = 8192, 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0],
                             jnp.float32).sum())


class StubModel(OriginNeRFModel):
    """Same interface; the field is a 3->4 linear read off one real kernel
    slice so grads still flow to params (the step graph is unchanged)."""

    def apply(self, params, positions, dirs):
        k = params["mlp"]["params"]["pts_0"]["kernel"][:3, :4]
        return (positions @ k.astype(jnp.float32)
                + 0.1 * dirs @ k.astype(jnp.float32))

    def density_raw(self, params, positions):
        k = params["mlp"]["params"]["pts_0"]["kernel"][:3, :1]
        return positions @ k.astype(jnp.float32)


def run(tag, model, n_coarse=128, S=4, with_update=False):
    st = occ.init_occupancy(occ.OccupancyConfig())
    centers = occ.cell_centers(occ.OccupancyConfig(), 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    st = st._replace(bitfield=st.bitfield.at[0].set(ball),
                     density_grid=st.density_grid.at[0].set(grid),
                     mean_density=jnp.maximum(grid, 0.0).mean())
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=n_coarse, n_samples=K)
    tcfg = NGPTrainConfig(n_rays_per_batch=RAYS, update_den_freq=S)
    trainer = NGPTrainer(None, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
    trainer.state = trainer.state._replace(occ=st)
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (S * RAYS,)) * 6.28
    o = jnp.stack([0.5 + 1.4 * jnp.cos(theta), 0.5 + 1.4 * jnp.sin(theta),
                   jnp.full((S * RAYS,), 0.5)], -1)
    d = 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.reshape(S, RAYS, 3)
    d = d.reshape(S, RAYS, 3)
    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (S, RAYS, 3))

    def block(i):
        if with_update:
            newocc = trainer.grid_update(trainer.state.occ,
                                         trainer.state.params,
                                         jax.random.fold_in(key, 100 + i))
            trainer.state = trainer.state._replace(occ=st)
        trainer.train_block(o, d, tgt, jax.random.fold_in(key, i))

    block(0)
    sync(trainer.state.params)
    t0 = time.perf_counter()
    n = 3
    for i in range(1, 1 + n):
        block(i)
    sync(trainer.state.params)
    dt = (time.perf_counter() - t0) / n / S
    emit(variant=tag, ms_step=round(dt * 1e3, 2),
         krays_s=round(RAYS / dt / 1e3, 1), S=S, n_coarse=n_coarse,
         with_update=with_update)


if __name__ == "__main__":
    flagship = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
    stub = StubModel(OriginNeRFConfig(skips=(), use_bf16=True))
    run("full", flagship)
    run("mlp_stub", stub)
    run("coarse64", flagship, n_coarse=64)
    run("S16_with_update", flagship, S=16, with_update=True)
    run("S4_with_update", flagship, S=4, with_update=True)
