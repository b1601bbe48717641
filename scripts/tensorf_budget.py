"""TensoRF at the reference's FULL Coffee budget (30k iters).

The third reference training budget executed end-to-end (after NGP 40k and
GARF 200k, PERF_NOTES §11): 30,000 iters x 4096 rays with the exact Coffee
schedule — upsample at [2000,3000,4000,5500,7000] from N_voxel 2^21 to 300^3
and alpha-mask updates at [2000,4000] (tensorf-myc/configs/Coffee.txt:11-16,
train.py:219-334) — on the 256^2 detail scene with held-out val views.
Checkpoints every val so a tunnel wedge costs at most one chunk
(cli/tensorf_train.py save/restore_tensorf_ckpt carries opt state +
lr_scale + stage geometry, the reference's .th scheme).

Scar (400k iters) and Scarf (1M iters) budgets are wall-clock infeasible on
one chip in a round (~17h / ~57h at the §5d stage rates); Coffee is the
TensoRF budget that fits, and the stage machinery exercised (upsample,
alpha-mask shrink + ray refilter, per-stage re-jit with lr continuation) is
identical across the three configs.

Usage: python scripts/tensorf_budget.py [--steps 30000] [--val_every 2000]
Appends JSON lines to quality_r4_log.jsonl.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.cli.tensorf_train import (build_configs,
                                             build_family_trainer,
                                             parse_txt_config,
                                             restore_tensorf_ckpt,
                                             save_tensorf_ckpt)
from myc_nerfs_tpu.data.synthetic import make_detail_scene
from myc_nerfs_tpu.models import tensorf as tfm
from myc_nerfs_tpu.train import tensorf_trainer as tt
from myc_nerfs_tpu.utils.metrics import psnr as psnr_fn

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "quality_r4_log.jsonl")

_FILE_LOG = [True]


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    if _FILE_LOG[0]:  # smoke runs (tiny --steps) stay off the repo log
        with open(LOG, "a") as f:
            f.write(line + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(ROOT, "configs/tensorf/Coffee.txt"))
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--val_every", type=int, default=2000)
    ap.add_argument("--views", type=int, default=36)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--holdout", type=int, default=12,
                    help="every Nth view held out for val (3 of 36)")
    ap.add_argument("--ckpt", default=os.path.join(ROOT, ".tensorf_budget_ckpt.msgpack"))
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (sitecustomize pins the axon platform, "
                         "so override via jax.config, not env)")
    # Scene-geometry adaptation: the reference configs carry per-scene
    # near/far/radii (Scar near=5 far=40, Scarf radii=28) sized for the
    # competition scenes; the synthetic detail scene lives at depth
    # 1.5-4.5, so scaled Scar/Scarf budget runs override these while
    # keeping every model/regularizer/schedule knob at reference parity.
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch_size (CPU smokes only)")
    ap.add_argument("--near", type=float, default=None)
    ap.add_argument("--far", type=float, default=None)
    ap.add_argument("--radii", type=float, default=None,
                    help="NeRF++ background sphere radius (Scarf)")
    ap.add_argument("--density_budget", type=int, default=None,
                    help="override density_sample_budget (static ray_valid "
                         "compaction; 0 = exact full-sample path)")
    ap.add_argument("--density_batch_budget", type=int, default=None,
                    help="override density_batch_budget (cross-ray "
                         "compaction: TOTAL survivor slots per batch, "
                         "sample-major; exact while batch survivors fit)")
    ap.add_argument("--factor_bf16", action="store_true",
                    help="bf16 factor-tensor gathers (half row bytes at "
                         "the gather bandwidth wall; f32 master params)")
    ap.add_argument("--app_budget", type=int, default=None,
                    help="override app_sample_budget")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _FILE_LOG[0] = args.steps >= 1000

    a = parse_txt_config(args.config)
    a["n_iters"] = args.steps
    if args.batch:
        a["batch_size"] = args.batch
    geom_overrides = {}
    for k in ("near", "far", "radii"):
        v = getattr(args, k)
        if v is not None:
            a[k] = v
            geom_overrides[k] = v
    if geom_overrides:
        a.pop("near_far", None)  # near/far take effect (build_configs prefers near_far)
    if args.density_budget is not None:
        a["density_sample_budget"] = args.density_budget
    if args.density_batch_budget is not None:
        a["density_batch_budget"] = args.density_batch_budget
    if args.factor_bf16:
        a["factor_gather_bf16"] = True
    if args.app_budget is not None:
        a["app_sample_budget"] = args.app_budget
    model_cfg, train_cfg = build_configs(a)
    aabb = np.asarray([[-1.2] * 3, [1.2] * 3], np.float32)

    t_scene = time.perf_counter()
    scene = make_detail_scene(n_views=args.views, H=args.size, W=args.size)
    val_idx = list(range(0, args.views, args.holdout))
    train_idx = [i for i in range(args.views) if i not in val_idx]
    rays = tt.build_ray_store(scene.poses[jnp.asarray(train_idx)],
                              scene.intr[jnp.asarray(train_idx)],
                              args.size, args.size)
    rgbs = scene.images[jnp.asarray(train_idx)].reshape(-1, 3)
    val_rays = [tt.build_ray_store(scene.poses[i:i + 1], scene.intr[i:i + 1],
                                   args.size, args.size) for i in val_idx]
    val_gt = [scene.images[i] for i in val_idx]
    emit(event="tensorf_budget_start", config=os.path.basename(args.config),
         model=a.get("model_name", "TensorVMSplit"),
         steps=args.steps, views=args.views, size=args.size,
         val_views=val_idx, train_rays=int(rays.shape[0]),
         upsamp=list(train_cfg.upsamp_list),
         alphamask=list(train_cfg.update_alphamask_list),
         density_budget=model_cfg.density_sample_budget,
         density_batch_budget=model_cfg.density_batch_budget,
         app_budget=model_cfg.app_sample_budget,
         factor_bf16=model_cfg.factor_gather_bf16,
         geom_overrides=geom_overrides or None,
         scene_s=round(time.perf_counter() - t_scene, 1))

    # family wiring (REFTensoRF heads / NeRF++ background) comes from the
    # config's model_name — a Scar/Scarf run must train the real variant
    trainer = build_family_trainer(a, model_cfg, train_cfg, aabb,
                                   jax.random.PRNGKey(0))
    if args.resume and os.path.exists(args.ckpt):
        restore_tensorf_ckpt(args.ckpt, trainer, for_training=True)
        emit(event="tensorf_budget_resumed", step=trainer.global_step)

    def refilter(rays, rgbs):
        keep = np.asarray(tfm.filter_rays_bbox(trainer.buffers["aabb"], rays))
        return rays[keep], rgbs[keep]

    # mirror the in-train refilter across chunk boundaries: once past the
    # 2nd alpha-mask event the reference trains on the filtered store
    # (train.py:305-312)
    if trainer.global_step > max(train_cfg.update_alphamask_list):
        rays, rgbs = refilter(rays, rgbs)

    wall0 = time.perf_counter()
    it0 = trainer.global_step
    while trainer.global_step < args.steps:
        n = min(args.val_every, args.steps - trainer.global_step)
        pre = trainer.global_step
        t0 = time.perf_counter()
        m = trainer.train(rays, rgbs, n_iters=n,
                          key=jax.random.fold_in(jax.random.PRNGKey(1), pre))
        jax.block_until_ready(trainer.params)
        t_train = time.perf_counter() - t0
        if pre < max(train_cfg.update_alphamask_list) <= trainer.global_step:
            rays, rgbs = refilter(rays, rgbs)
        t0 = time.perf_counter()
        vals = []
        for vr, gt in zip(val_rays, val_gt):
            rgb, _ = trainer.render_rays(vr, chunk=8192)
            vals.append(float(psnr_fn(rgb.reshape(args.size, args.size, 3), gt)))
        t_val = time.perf_counter() - t0
        t0 = time.perf_counter()
        save_tensorf_ckpt(args.ckpt, trainer, a.get("model_name", "TensorVMSplit"))
        t_ckpt = time.perf_counter() - t0
        dt = time.perf_counter() - wall0
        emit(event="tensorf_budget_log", step=trainer.global_step,
             train_psnr=round(float(m["psnr"]), 2),
             val_psnr=round(float(np.mean(vals)), 2),
             val_psnrs=[round(v, 2) for v in vals],
             grid_size=list(trainer.geom.grid_size),
             n_train_rays=int(rays.shape[0]),
             it_s=round((trainer.global_step - it0) / dt, 1),
             wall_s=round(dt, 1),
             # chunk decomposition (PERF_NOTES par.14): marginal train vs
             # val renders vs ckpt save (tunnel D2H measured at 1.7 MB/s)
             t_train_s=round(t_train, 1), t_val_s=round(t_val, 1),
             t_ckpt_s=round(t_ckpt, 1))
    emit(event="tensorf_budget_done", steps=trainer.global_step,
         wall_s=round(time.perf_counter() - wall0, 1))


if __name__ == "__main__":
    main()
