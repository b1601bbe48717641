"""TensoRF train throughput on the TPU chip (PERF_NOTES breadth entry).

Coffee-shaped config: TensorVMSplit, batch 4096, 300^3 final voxels.
Measures iters/s at the init (100^3) and final (300^3) stage resolutions.
The reference publishes no tensorf iters/s; numbers are absolute.
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


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"stage": name, **kw}), flush=True)


def rays_batch(key, n):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    o = jnp.stack([3.0 * jnp.cos(theta) * jnp.sin(phi),
                   3.0 * jnp.sin(theta) * jnp.sin(phi),
                   3.0 * jnp.cos(phi)], -1)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.concatenate([o, d], -1)


def measure(n_voxels, label):
    mcfg = tf.TensoRFConfig(decomp="vm_split")
    cfg = tt.TensoRFTrainConfig(n_voxel_init=n_voxels, batch_size=4096)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, jax.random.PRNGKey(0))
    # all-pass alpha volume: measurements reflect the post-alpha-mask
    # regime where the app_sample_budget compaction is active (production
    # stages after update_AlphaMask; the pre-mask stage runs the exact path)
    trainer.buffers = dict(trainer.buffers)
    trainer.buffers["alpha_volume"] = jnp.ones((64, 64, 64))
    trainer.buffers["alpha_aabb"] = jnp.asarray(aabb)
    trainer._rebuild(lr_scale=1.0)
    key = jax.random.PRNGKey(1)
    S = 16
    rays = rays_batch(key, S * 4096).reshape(S, 4096, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (S, 4096, 3))
    # warm
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    trainer.params = p
    sync(p)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(16 * i))
    sync(p)
    dt = (time.perf_counter() - t0) / (reps * S)
    emit(label, ms_per_iter=round(dt * 1e3, 2),
         iters_per_s=round(1.0 / dt, 1),
         rays_per_s=round(4096 / dt, 1))




def measure_variant(variant, label, n_voxels=160 ** 3):
    from myc_nerfs_tpu.models import nerfpp as npp
    from myc_nerfs_tpu.models import ref_tensorf as rt

    mcfg = tf.TensoRFConfig(decomp="vm_split")
    cfg = tt.TensoRFTrainConfig(n_voxel_init=n_voxels, batch_size=4096)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    key0 = jax.random.PRNGKey(0)
    if variant == "ref":
        def fwd(mc, g, params, bufs, rays, key, white_bg):
            return rt.ref_tensorf_forward(mc, g, params, bufs, rays, key,
                                          white_bg)
        def init_extra(params):
            return rt.init_ref_heads(jax.random.PRNGKey(5), mcfg, params)
    else:
        pp = npp.NerfPPConfig()
        def fwd(mc, g, params, bufs, rays, key, white_bg):
            return npp.nerfpp_forward(mc, pp, g, params, bufs, rays, key)
        def init_extra(params):
            params = dict(params)
            params["bg_net"] = npp.init_nerfpp(jax.random.PRNGKey(5), pp)
            return params
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, key0, forward_fn=fwd)
    trainer.params = init_extra(trainer.params)
    trainer.buffers = dict(trainer.buffers)
    trainer.buffers["alpha_volume"] = jnp.ones((64, 64, 64))
    trainer.buffers["alpha_aabb"] = jnp.asarray(aabb)
    trainer._rebuild(lr_scale=1.0)
    key = jax.random.PRNGKey(1)
    S = 8
    rays = rays_batch(key, S * 4096).reshape(S, 4096, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (S, 4096, 3))
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    sync(p)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(8 * i))
    sync(p)
    dt = (time.perf_counter() - t0) / (reps * S)
    emit(label, ms_per_iter=round(dt * 1e3, 2), iters_per_s=round(1.0 / dt, 1))


def measure_budget_shaped(label, mask_reso=256, regs=True,
                          n_voxels=300 ** 3, batch=4096,
                          mask_nearest=False, step_ratio=2.0,
                          density_budget=0):
    """Decompose the §5d-vs-budget-run gap: the Coffee 30k budget run
    sustains ~0.85-0.9 s/iter of pure train at the 300^3 stage while §5d's
    marginal probe measured 252 ms. Two config differences are candidates:
    (a) the probe's alpha volume was an all-pass 64^3; the budget's real
    mask is 256^3 (a 67 MB narrow-gather target — the §1 row-cost model
    says target size matters); (b) the probe left Coffee's TV(0.3 x2) +
    L1 regularizers off. This measures the marginal block rate with both
    matched to the budget run, togglable for A/B.
    """
    mcfg = tf.TensoRFConfig(decomp="vm_split", step_ratio=step_ratio,
                            density_sample_budget=density_budget)
    kw = dict(n_voxel_init=n_voxels, batch_size=batch)
    if regs:
        kw.update(tv_weight_density=0.3, tv_weight_app=0.3,
                  l1_weight_initial=4e-5, l1_weight_rest=2e-5)
    cfg = tt.TensoRFTrainConfig(**kw)
    aabb = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]], np.float32)
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, jax.random.PRNGKey(0))
    # alpha volume with ball-shaped content (~mask pass rate of a real
    # scene) at the budget run's resolution (alpha_mask_reso_cap=256)
    g = (jnp.arange(mask_reso) + 0.5) / mask_reso - 0.5
    r = jnp.sqrt(g[:, None, None] ** 2 + g[None, :, None] ** 2
                 + g[None, None, :] ** 2)
    trainer.buffers = dict(trainer.buffers)
    trainer.buffers["alpha_volume"] = (r < 0.35).astype(jnp.float32)
    trainer.buffers["alpha_aabb"] = jnp.asarray(aabb)
    if mask_nearest:
        # the single-gather corner-dilated gate (default in production via
        # update_alpha_mask); off by default here so the A/B keeps the
        # legacy 8-gather trilinear path measurable
        trainer.buffers = tf.prepare_alpha_buffers(trainer.buffers)
    trainer._rebuild(lr_scale=1.0)
    key = jax.random.PRNGKey(1)
    S = 16
    rays = rays_batch(key, S * batch).reshape(S, batch, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (S, batch, 3))
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    trainer.params = p
    sync(p)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(16 * i))
    sync(p)
    dt = (time.perf_counter() - t0) / (reps * S)
    emit(label, ms_per_iter=round(dt * 1e3, 2),
         iters_per_s=round(1.0 / dt, 1), mask_reso=mask_reso, regs=regs,
         mask_nearest=mask_nearest, step_ratio=step_ratio,
         n_samples=trainer.geom.n_samples, density_budget=density_budget)


if __name__ == "__main__":
    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "base"
    if which in ("base", "all"):
        measure(100 ** 3, "tensorf_vmsplit_100cube")
        measure(300 ** 3, "tensorf_vmsplit_300cube")
    if which in ("variants", "all"):
        measure_variant("ref", "ref_tensorf_160cube")
        measure_variant("npp", "nerfpp_160cube")
    if which in ("budget", "all"):
        # full budget shape, then the A/B knockouts
        measure_budget_shaped("tensorf_300cube_budget_shaped")
        measure_budget_shaped("tensorf_300cube_mask64", mask_reso=64)
        measure_budget_shaped("tensorf_300cube_noregs", regs=False)
        # the shipped fix: one nearest gather on the corner-dilated mask
        measure_budget_shaped("tensorf_300cube_mask_nearest",
                              mask_nearest=True)
    if which in ("density", "all"):
        # The REAL Coffee-budget shape: the CLI/budget runner default is
        # step_ratio 0.5 (opt.py:127) -> n_samples 1036 at the 300^3 stage,
        # 4x the step_ratio=2.0 probes above. Baseline, then the static
        # density-sample compaction (the reference's ray_valid boolean
        # indexing, tensorBase.py:497-504) at descending budgets.
        measure_budget_shaped("tensorf_300cube_sr05_base",
                              mask_nearest=True, step_ratio=0.5)
        for kd in (384, 256, 128):
            measure_budget_shaped(f"tensorf_300cube_sr05_dbudget{kd}",
                                  mask_nearest=True, step_ratio=0.5,
                                  density_budget=kd)
        # and the effect at the legacy probe shape for continuity with par.14
        measure_budget_shaped("tensorf_300cube_sr2_dbudget128",
                              mask_nearest=True, density_budget=128)
