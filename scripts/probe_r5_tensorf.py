"""Round-5 TensoRF throughput audit (VERDICT r4 next#4).

Three questions, all at the REAL Coffee 300^3 / step_ratio 0.5 shape the
budget runs execute (PERF_NOTES par.15):

  stages   where do the ~300 ms/iter go? Direct fwd+bwd timings of the
           density-factor stage, the app-factor+MLP stage, and the full
           train block, at the shipped budgets (density 256, app 96).
  layout   is there an XLA:TPU layout cliff on the pow2 ray batch? Two of
           round 4's three big wins were layout cliffs (PERF_NOTES par.9,
           9c: pow2-leading-dim f32 4-D dots, flat 2-D bf16 dots); the
           TensoRF batch has been a pow2 4096 f32 since round 1 and was
           never A/B'd. Measures 4096 vs 4080 vs 3072+1024-retile.
  rungs    density budget 192 (between the shipped 256 and the known-fast
           128) and app budget 64 — candidate ladder rungs for the 30k
           quality gate.

Usage: python scripts/probe_r5_tensorf.py [stages|layout|rungs|all]
Ref: tensorf-myc/train.py:219-291 (the training loop being matched).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.models import tensorf as tf
from myc_nerfs_tpu.train import tensorf_trainer as tt


def sync(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)
        break


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def rays_batch(key, n):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    z = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 2 - 1
    o = jnp.stack([3.5 * jnp.cos(theta), 3.5 * jnp.sin(theta), 2.0 * z], -1)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.concatenate([o, d], -1)


def make_trainer(batch=4096, density_budget=256, app_budget=96,
                 batch_budget=0, bf16=False):
    mcfg = tf.TensoRFConfig(decomp="vm_split", step_ratio=0.5,
                            density_sample_budget=density_budget,
                            app_sample_budget=app_budget,
                            density_batch_budget=batch_budget,
                            factor_gather_bf16=bf16)
    cfg = tt.TensoRFTrainConfig(n_voxel_init=300 ** 3, batch_size=batch,
                                tv_weight_density=0.3, tv_weight_app=0.3,
                                l1_weight_initial=4e-5, l1_weight_rest=2e-5)
    aabb = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]], np.float32)
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, jax.random.PRNGKey(0))
    g = (jnp.arange(256) + 0.5) / 256 - 0.5
    r = jnp.sqrt(g[:, None, None] ** 2 + g[None, :, None] ** 2
                 + g[None, None, :] ** 2)
    trainer.buffers = dict(trainer.buffers)
    trainer.buffers["alpha_volume"] = (r < 0.35).astype(jnp.float32)
    trainer.buffers["alpha_aabb"] = jnp.asarray(
        np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]], np.float32))
    trainer.buffers = tf.prepare_alpha_buffers(trainer.buffers)
    trainer._rebuild(lr_scale=1.0)
    return trainer


def block_rate(trainer, batch, reps=3, S=16):
    key = jax.random.PRNGKey(1)
    rays = rays_batch(key, S * batch).reshape(S, batch, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (S, batch, 3))
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    sync(p)
    t0 = time.perf_counter()
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(16 * i))
    sync(p)
    return (time.perf_counter() - t0) / (reps * S)


def stages():
    """Direct fwd+bwd of each stage at the shipped budget shapes."""
    trainer = make_trainer()
    cfg, params = trainer.model_cfg, trainer.params
    key = jax.random.PRNGKey(3)

    def timeit(fn, *args, reps=8):
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / reps * 1e3

    # density stage: [4096, 256] coords through the 3 plane + 3 line factors
    xyz_d = jax.random.uniform(key, (4096, 256, 3)) * 2 - 1

    @jax.jit
    def dens_fb(p, x):
        def loss(p):
            f = tf.compute_density_feature(cfg, p, x)
            return jnp.sum(f ** 2)
        g = jax.grad(loss)(p)
        return g["density_plane"][0]

    emit("stage_density_4096x256", ms=round(timeit(dens_fb, params, xyz_d), 2))

    # app stage: [4096, 96] coords through app factors + basis + MLP
    xyz_a = jax.random.uniform(jax.random.fold_in(key, 1), (4096, 96, 3)) * 2 - 1
    dirs = xyz_a / jnp.linalg.norm(xyz_a, axis=-1, keepdims=True)
    mlp = tf.make_render_mlp(cfg)

    @jax.jit
    def app_fb(p, x, d):
        def loss(p):
            feat = tf.compute_app_feature(cfg, p, x)
            rgb = mlp.apply(p["mlp"], x, d, feat)
            return jnp.sum(rgb ** 2)
        g = jax.grad(loss)(p)
        return g["app_plane"][0]

    emit("stage_app_4096x96", ms=round(timeit(app_fb, params, xyz_a, dirs), 2))

    # full block for reference
    dt = block_rate(trainer, 4096)
    emit("stage_full_block", ms_per_iter=round(dt * 1e3, 2),
         iters_per_s=round(1.0 / dt, 1))


def layout():
    for batch in (4096, 4080, 3840):
        trainer = make_trainer(batch=batch)
        dt = block_rate(trainer, batch)
        emit(f"layout_batch{batch}", ms_per_iter=round(dt * 1e3, 2),
             iters_per_s=round(1.0 / dt, 1),
             krays_s=round(batch / dt / 1e3, 1))


def rungs():
    for kd, ka in ((256, 96), (192, 96), (128, 96), (256, 64), (192, 64)):
        trainer = make_trainer(density_budget=kd, app_budget=ka)
        dt = block_rate(trainer, 4096)
        emit(f"rung_d{kd}_a{ka}", ms_per_iter=round(dt * 1e3, 2),
             iters_per_s=round(1.0 / dt, 1),
             krays_s=round(4096 / dt / 1e3, 1))
    # cross-ray batch compaction (density_batch_budget): avg samples/ray
    # {112, 96, 80} x 4096 rays — exact while total survivors fit, vs the
    # per-ray budget's whole-thick-ray truncation
    for avg in (112, 96, 80):
        trainer = make_trainer(density_budget=0, app_budget=96,
                               batch_budget=avg * 4096)
        dt = block_rate(trainer, 4096)
        emit(f"rung_batchbudget_avg{avg}", ms_per_iter=round(dt * 1e3, 2),
             iters_per_s=round(1.0 / dt, 1),
             krays_s=round(4096 / dt / 1e3, 1))


def bf16_rungs():
    """bf16 factor gathers alone and combined with the budget rungs."""
    combos = [
        ("bf16_d256_a96", dict(bf16=True)),
        ("bf16_d192_a64", dict(bf16=True, density_budget=192, app_budget=64)),
        ("bf16_d128_a96", dict(bf16=True, density_budget=128)),
        ("bf16_batchavg96_a64", dict(bf16=True, density_budget=0,
                                     app_budget=64, batch_budget=96 * 4096)),
    ]
    for tag, kw in combos:
        trainer = make_trainer(**kw)
        dt = block_rate(trainer, 4096)
        emit(f"rung_{tag}", ms_per_iter=round(dt * 1e3, 2),
             iters_per_s=round(1.0 / dt, 1),
             krays_s=round(4096 / dt / 1e3, 1))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stages", "all"):
        stages()
    if which in ("layout", "all"):
        layout()
    if which in ("rungs", "all"):
        rungs()
    if which in ("bf16", "all"):
        bf16_rungs()
