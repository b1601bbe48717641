"""VERDICT r2 #2: measure a blocked (lazy) table-update schedule.

Variant A (shipped): every step updates MLP + tables (Adam + EMA).
Variant B (lazy):    per-step table grads accumulate in an f32 buffer
                     carried through the lax.scan; tables get ONE Adam
                     update per 16-step block (MLP still steps every iter).

The hypothesis from the verdict was that lazy updates cut scatter traffic
~16x. They cannot on this design: the backward scatter-add (the 50+ ms
floor) produces the per-step gradient either way — accumulation only moves
the (dense, ~14 MB) Adam/EMA table update out of the loop. This probe
measures the actual delta so the conclusion is recorded, not assumed.
Usage: python probe_r3d_lazy_tables.py [brick|brick2|brick3]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModelConfig
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp
from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig, NGPTrainer,
                                             ema_step, huber_loss,
                                             make_lr_schedule, mse2psnr)

GRID_IMPL = sys.argv[1] if len(sys.argv) > 1 else "brick"
RAYS, S = 8192, 16


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"stage": name, **kw}), flush=True)


def make_rays(n, key):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                   0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                   0.5 + 1.4 * jnp.cos(phi)], -1)
    d = 0.5 - o
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def setup():
    mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                          grid_impl=GRID_IMPL)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=64)
    tcfg = NGPTrainConfig(n_rays_per_batch=RAYS, update_den_freq=S)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
    c = occ.OccupancyConfig()
    st = occ.init_occupancy(c)
    centers = occ.cell_centers(c, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    trainer.state = trainer.state._replace(occ=st._replace(
        bitfield=st.bitfield.at[0].set(ball),
        density_grid=st.density_grid.at[0].set(grid),
        mean_density=jnp.maximum(grid, 0.0).mean()))
    return trainer


def build_lazy_block(trainer):
    """Scan block where table grads accumulate; tables update once/block."""
    model_apply = trainer.model.apply
    density_apply = trainer.model.density_raw
    occ_cfg, rcfg, cfg = trainer.occ_cfg, trainer.rcfg, trainer.cfg
    sched = make_lr_schedule(cfg)
    tx_mlp = optax.adam(sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)
    tx_tab = optax.adam(sched, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps)

    @jax.jit
    def block_fn(state, tab_opt, rays_o, rays_d, target, bg, key):
        def split(p):
            return p["mlp"], p["table"]

        def one(carry, xs):
            state, acc = carry
            o, d, tgt, b, k = xs

            def loss_fn(params):
                out = render_rays_ngp(occ_cfg, rcfg, model_apply, params,
                                      state.occ, o, d, b, k,
                                      density_apply=density_apply)
                loss = huber_loss(out.rgb, tgt, cfg.huber_delta).mean()
                return loss, mse2psnr(jnp.mean((out.rgb - tgt) ** 2))

            (loss, psnr), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            gm, gt = split(grads)
            acc = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc, gt)
            # MLP updates every step (reference per-step contract for the
            # network, expdecay.py:20-26)
            mlp_updates, mlp_opt = tx_mlp.update(gm, state.opt_state,
                                                 state.params["mlp"])
            mlp_new = optax.apply_updates(state.params["mlp"], mlp_updates)
            mlp_new = jax.tree_util.tree_map(
                lambda new, old: new.astype(old.dtype), mlp_new,
                state.params["mlp"])
            params = dict(state.params, mlp=mlp_new)
            state = state._replace(params=params, opt_state=mlp_opt,
                                   step=state.step + 1)
            return (state, acc), {"loss": loss, "psnr": psnr}

        acc0 = jax.tree_util.tree_map(
            lambda t: jnp.zeros(t.shape, jnp.float32),
            state.params["table"])
        Ssteps = rays_o.shape[0]
        keys = jax.random.split(key, Ssteps)
        (state, acc), ms = jax.lax.scan(
            one, (state, acc0), (rays_o, rays_d, target, bg, keys))
        # one table update per block on the mean accumulated grad
        gt = jax.tree_util.tree_map(lambda a: a / Ssteps, acc)
        tab_updates, tab_opt = tx_tab.update(gt, tab_opt,
                                             state.params["table"])
        tab_new = optax.apply_updates(state.params["table"], tab_updates)
        tab_new = jax.tree_util.tree_map(
            lambda new, old: new.astype(old.dtype), tab_new,
            state.params["table"])
        state = state._replace(params=dict(state.params, table=tab_new))
        return state, tab_opt, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return block_fn, tx_tab


def time_variant():
    trainer = setup()
    key = jax.random.PRNGKey(2)
    o, d = make_rays(S * RAYS, key)
    o, d = o.reshape(S, RAYS, 3), d.reshape(S, RAYS, 3)
    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (S, RAYS, 3))
    bg = jnp.ones((S, RAYS, 3))

    # A: shipped
    trainer.train_block(o, d, tgt, jax.random.PRNGKey(3))
    sync(trainer.state.params)
    t0 = time.perf_counter()
    for _ in range(3):
        trainer.train_block(o, d, tgt, jax.random.PRNGKey(4))
    sync(trainer.state.params)
    dtA = (time.perf_counter() - t0) / 3 / S * 1e3
    emit("shipped", ms_per_step=round(dtA, 2),
         krays_s=round(RAYS / dtA, 1))

    # B: lazy tables — fresh state, separate opt states
    trainer2 = setup()
    blk, tx_tab = build_lazy_block(trainer2)
    st = trainer2.state._replace(opt_state=optax.adam(
        make_lr_schedule(trainer2.cfg),
        b1=trainer2.cfg.betas[0], b2=trainer2.cfg.betas[1],
        eps=trainer2.cfg.eps).init(trainer2.state.params["mlp"]))
    tab_opt = tx_tab.init(st.params["table"])
    st, tab_opt, m = blk(st, tab_opt, o, d, tgt, bg, jax.random.PRNGKey(3))
    sync(st.params)
    t0 = time.perf_counter()
    for _ in range(3):
        st, tab_opt, m = blk(st, tab_opt, o, d, tgt, bg, jax.random.PRNGKey(4))
    sync(st.params)
    dtB = (time.perf_counter() - t0) / 3 / S * 1e3
    emit("lazy_tables", ms_per_step=round(dtB, 2),
         krays_s=round(RAYS / dtB, 1), delta_ms=round(dtA - dtB, 2))


if __name__ == "__main__":
    time_variant()
