"""Ablation profiling of the NGP train block on the real chip.

Times trainer.train_block (16 steps/dispatch) under knockouts:
  full          — fused-march trainer as shipped
  no_table_grad — stop_gradient on the brick tables (kills 16 scatters)
  no_encode     — encode replaced by a zero-gather proxy (kills gathers too)
Deltas isolate the true scatter / gather / rest costs.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

GRID_IMPL = sys.argv[1] if len(sys.argv) > 1 else "brick"

from myc_nerfs_tpu.models.ngp import (HashGridConfig, NGPModel, NGPModelConfig,
                                      NGPNetwork)
from myc_nerfs_tpu.ops.sh import sh_encode
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

RAYS = 8192
S = 16


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"stage": name, **kw}), flush=True)


def make_rays(n, key):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.cos(phi)], -1)
    rays_d = 0.5 - rays_o
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def ball_state():
    cfg = occ.OccupancyConfig()
    st = occ.init_occupancy(cfg)
    centers = occ.cell_centers(cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    return cfg, st._replace(bitfield=st.bitfield.at[0].set(ball),
                            density_grid=st.density_grid.at[0].set(grid),
                            mean_density=jnp.maximum(grid, 0.0).mean())


class StopGradTableModel(NGPModel):
    def apply(self, params, positions, dirs):
        p2 = dict(params)
        p2["table"] = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                             params["table"])
        return super().apply(p2, positions, dirs)

    def density_raw(self, params, positions):
        p2 = dict(params)
        p2["table"] = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                             params["table"])
        return super().density_raw(p2, positions)


class NoEncodeModel(NGPModel):
    """Encode replaced by a broadcast of position features (zero gathers)."""

    def _fake_enc(self, positions):
        reps = self.cfg.grid.out_dim // 3 + 1
        return jnp.tile(positions, (1, reps))[:, :self.cfg.grid.out_dim]

    def apply(self, params, positions, dirs):
        pos_enc = self._fake_enc(positions)
        dir_enc = sh_encode(dirs * 2.0 - 1.0, degree=self.cfg.sh_degree,
                            pad_to=16)
        if self.cfg.use_bf16:
            pos_enc = pos_enc.astype(jnp.bfloat16)
            dir_enc = dir_enc.astype(jnp.bfloat16)
        out = self.net.apply(params["mlp"], pos_enc, dir_enc)
        return out.astype(jnp.float32)

    def density_raw(self, params, positions):
        pos_enc = self._fake_enc(positions)
        if self.cfg.use_bf16:
            pos_enc = pos_enc.astype(jnp.bfloat16)
        out = self.net.apply(params["mlp"], pos_enc, method=NGPNetwork.density)
        return out.astype(jnp.float32)


def time_block(model=None, label="full"):
    occ_cfg, st = ball_state()
    mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                          grid_impl=GRID_IMPL)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=64)
    tcfg = NGPTrainConfig(n_rays_per_batch=RAYS, update_den_freq=S)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
    trainer.state = trainer.state._replace(occ=st)
    key = jax.random.PRNGKey(2)
    o, d = make_rays(S * RAYS, key)
    o = o.reshape(S, RAYS, 3)
    d = d.reshape(S, RAYS, 3)
    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (S, RAYS, 3))
    trainer.train_block(o, d, tgt, jax.random.PRNGKey(3))
    sync(trainer.state.params)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        trainer.train_block(o, d, tgt, jax.random.PRNGKey(4))
    sync(trainer.state.params)
    dt = (time.perf_counter() - t0) / reps
    per_step = dt / S * 1e3
    emit(label, ms_per_step=round(per_step, 2),
         krays_per_s=round(RAYS / per_step, 1))
    return per_step


mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                      grid_impl=GRID_IMPL)
emit("config", grid_impl=GRID_IMPL)
full = time_block(None, "full_fused")
nograd = time_block(StopGradTableModel(mcfg), "no_table_grad")
noenc = time_block(NoEncodeModel(mcfg), "no_encode")
emit("deltas", scatter_ms=round(full - nograd, 2),
     gather_ms=round(nograd - noenc, 2), rest_ms=round(noenc, 2))
