"""Decompose the NGP hash train step cost on the real TPU chip.

Times each pipeline stage with the marginal-rate methodology from
PERF_NOTES.md (k reps inside one scanned program; slope subtracts the
~30 ms axon dispatch floor). Prints one JSON line per stage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, NGPModelConfig
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import (NGPRenderConfig, march_rays,
                                             compact_marched, render_rays_ngp)
from myc_nerfs_tpu.render.occupancy import mip_from_pos, sigma_at
from myc_nerfs_tpu.ops import brick_grid as bg
from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig, NGPTrainer,
                                             huber_loss)

RAYS = 8192
K = 64
NC = 32


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, ms, **kw):
    print(json.dumps({"stage": name, "ms": round(ms, 2), **kw}), flush=True)


def marginal(make_scan, reps=(1, 5)):
    """Time scanned program at k reps, return per-rep ms via slope."""
    times = {}
    for k in reps:
        f = make_scan(k)
        sync(f())
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = f()
        s = sync(out)
        times[k] = (time.perf_counter() - t0) / n
    k0, k1 = reps
    return (times[k1] - times[k0]) / (k1 - k0) * 1e3


def make_rays(n, key):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.cos(phi)], -1)
    rays_d = 0.5 - rays_o
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def main():
    occ_cfg = occ.OccupancyConfig()
    state0 = occ.init_occupancy(occ_cfg)
    centers = occ.cell_centers(occ_cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    occ_state = state0._replace(
        bitfield=state0.bitfield.at[0].set(ball),
        density_grid=state0.density_grid.at[0].set(grid),
        mean_density=jnp.maximum(grid, 0.0).mean())

    mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                          grid_impl="brick")
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=K)
    model = NGPModel(mcfg)
    params = model.init(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(2)
    rays_o, rays_d = make_rays(RAYS, key)
    bgc = jnp.ones((3,))
    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (RAYS, 3))

    N_ENC = RAYS * NC  # samples through the differentiable pass
    pos_enc = jax.random.uniform(jax.random.fold_in(key, 9), (N_ENC, 3))
    dirs_enc = jax.random.uniform(jax.random.fold_in(key, 10), (N_ENC, 3))

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

    # 1. march only
    ms = marginal(scanned(
        lambda c, i: march_rays(occ_cfg, rcfg, occ_state.bitfield,
                                rays_o + c * 1e-9, rays_d,
                                jax.random.PRNGKey(0)).t.sum() + c))
    emit("march_only", ms)

    # 2. march + grid-compaction
    def mc(c, i):
        m = march_rays(occ_cfg, rcfg, occ_state.bitfield, rays_o + c * 1e-9,
                       rays_d, jax.random.PRNGKey(0))
        world = m.positions
        sig = sigma_at(occ_cfg, occ_state.density_grid, world, None)
        m2 = compact_marched(m, sig, NC)
        return m2.positions.sum() + c
    ms = marginal(scanned(mc))
    emit("march_plus_compact", ms)

    # 3. encode fwd only (2^18 samples)
    cfg = mcfg.grid
    levels = bg.compute_brick_levels(cfg)
    tables = bg.init_brick_table(jax.random.PRNGKey(1), cfg, levels)
    def enc(c, i):
        out = bg.brick_encode(tables, pos_enc + c * 1e-9, cfg, levels,
                              compute_dtype=jnp.bfloat16)
        return out.astype(jnp.float32).sum() + c
    ms = marginal(scanned(enc))
    emit("encode_fwd", ms, n_samples=N_ENC)

    # 4. encode fwd+bwd (grad wrt tables)
    def encg(c, i):
        def loss(tabs):
            out = bg.brick_encode(tabs, pos_enc + c * 1e-9, cfg, levels,
                                  compute_dtype=jnp.bfloat16)
            return out.astype(jnp.float32).sum()
        g = jax.grad(loss)(tables)
        return g[0].sum() + c
    ms = marginal(scanned(encg))
    emit("encode_fwd_bwd", ms, n_samples=N_ENC)

    # 5. model fwd (encode + MLPs + SH) on compacted samples
    def mf(c, i):
        raw = model.apply(params, pos_enc + c * 1e-9, dirs_enc)
        return raw.astype(jnp.float32).sum() + c
    ms = marginal(scanned(mf))
    emit("model_fwd", ms, n_samples=N_ENC)

    # 6. model fwd+bwd
    def mg(c, i):
        def loss(p):
            raw = model.apply(p, pos_enc + c * 1e-9, dirs_enc)
            return raw.astype(jnp.float32).sum()
        g = jax.grad(loss)(params)
        return jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum() + c
    ms = marginal(scanned(mg))
    emit("model_fwd_bwd", ms, n_samples=N_ENC)

    # 7. full loss fwd+bwd (march + compact + model + composite + huber)
    def fl(c, i):
        def loss(p):
            out = render_rays_ngp(occ_cfg, rcfg, model.apply, p, occ_state,
                                  rays_o + c * 1e-9, rays_d, bgc,
                                  jax.random.PRNGKey(0),
                                  density_apply=model.density_raw)
            return huber_loss(out.rgb, tgt).mean()
        g = jax.grad(loss)(params)
        return jax.tree_util.tree_leaves(g)[0].astype(jnp.float32).sum() + c
    ms = marginal(scanned(fl))
    emit("full_loss_grad", ms, rays=RAYS)

    # 8. full train step (loss grad + adam + ema)
    tcfg = NGPTrainConfig(n_rays_per_batch=RAYS)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
    trainer.state = trainer.state._replace(occ=occ_state)
    def make_block(k):
        o = jnp.broadcast_to(rays_o, (k, RAYS, 3))
        d = jnp.broadcast_to(rays_d, (k, RAYS, 3))
        t = jnp.broadcast_to(tgt, (k, RAYS, 3))
        def run():
            trainer._block_fn_cache = None
            return None
        return run
    # time via trainer.train_block at k=4 and k=16
    times = {}
    for k in (4, 16):
        o = jnp.broadcast_to(rays_o, (k, RAYS, 3))
        d = jnp.broadcast_to(rays_d, (k, RAYS, 3))
        t = jnp.broadcast_to(tgt, (k, RAYS, 3))
        trainer._block_fn = None
        trainer.train_block(o, d, t, jax.random.PRNGKey(3))
        sync(trainer.state.params)
        t0 = time.perf_counter()
        for _ in range(2):
            trainer.train_block(o, d, t, jax.random.PRNGKey(4))
        sync(trainer.state.params)
        times[k] = (time.perf_counter() - t0) / 2
    ms = (times[16] - times[4]) / 12 * 1e3
    emit("full_train_step", ms, rays=RAYS,
         krays_per_s=round(RAYS / ms, 1))

    # 9. optimizer+EMA only (adam update on zero grads over the param tree)
    tx = trainer.tx
    opt_state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    import optax
    def oe(c, i):
        upd, _ = tx.update(jax.tree_util.tree_map(lambda z: z + c * 1e-12,
                                                  zeros), opt_state, params)
        p2 = optax.apply_updates(params, upd)
        return jax.tree_util.tree_leaves(p2)[0].sum() + c
    ms = marginal(scanned(oe))
    emit("adam_update_only", ms)


if __name__ == "__main__":
    main()
