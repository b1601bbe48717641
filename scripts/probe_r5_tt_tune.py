"""Round-5: tune the NGP-field test-time pose optimization (chain eval).

The first full-protocol chain run (quality_r5_log pose_chain_scale_ngp
cameras=refined) showed sim3 propagation alone lifts the refined leg
18.2 -> 22.93 dB, but the per-image TT optimization DIVERGED at
lr 3e-3 x 1500 iters (loss climbing to ~0.1 from a 5e-3 start) — the
hash field's photometric landscape is far sharper than the MLP fields
the reference runs this protocol on (garf.py:232-269). This probe
retrains the refined-leg NGP from the chain's exported artifacts and
sweeps the TT lr (with the best-se3 tracking fix in place), reporting
plain vs TT val PSNR per lr.

Needs: /tmp/detail_scene_detail_36_256.npz, /tmp/chain_val_new.json
(refined train poses), /tmp/chain_test_new.json (sim3-propagated val
poses) — all produced by the chain run.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.data.synthetic import SyntheticScene
from myc_nerfs_tpu.evaluation.pose_export import load_transforms_json
from myc_nerfs_tpu.evaluation.test_time_optim import (make_ngp_pose_loss,
                                                      test_time_pose_optim)
from myc_nerfs_tpu.geom import lie, pose as pose_lib
from myc_nerfs_tpu.geom.conventions import parse_raw_camera_barf
from myc_nerfs_tpu.utils.metrics import psnr

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from pose_chain_scale import _field_c2w, train_ngp, emit  # noqa: E402

SCALE, OFF = 0.33, 0.5


def main():
    z = np.load("/tmp/detail_scene_detail_36_256.npz")
    scene = SyntheticScene(images=jnp.asarray(z["images"]),
                           poses=jnp.asarray(z["poses"]),
                           intr=jnp.asarray(z["intr"]), H=256, W=256,
                           depth_range=tuple(z["depth_range"]))
    val_ids = [0, 12, 24]
    train_ids = [i for i in range(36) if i not in val_ids]
    c2w_tr, _, _ = load_transforms_json("/tmp/chain_val_new.json")
    poses_tr = jnp.stack([parse_raw_camera_barf(c2w_tr[i])
                          for i in range(len(train_ids))])
    c2w_val, _, _ = load_transforms_json("/tmp/chain_test_new.json")
    val_poses = [parse_raw_camera_barf(c2w_val[j]) for j in range(3)]
    images_tr = scene.images[jnp.asarray(train_ids)]
    intr_tr = scene.intr[jnp.asarray(train_ids)]

    # retrain the refined-leg NGP (same config as the chain's train_ngp),
    # no TT — we drive TT manually below with the trainer it returns
    import pose_chain_scale as pcs
    pcs._FILE_LOG[0] = False

    # train_ngp doesn't return the trainer; inline the training here
    from myc_nerfs_tpu.geom import rays as rays_lib
    from myc_nerfs_tpu.models import ngp
    from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
    from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer
    import time

    H = W = 256
    c, r = rays_lib.get_center_and_ray(poses_tr, intr_tr, H, W)
    d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    tr_o = np.asarray((c * SCALE + OFF).reshape(-1, 3))
    tr_d = np.asarray(d.reshape(-1, 3))
    tr_rgb = np.asarray(images_tr.reshape(-1, 3))
    mcfg = ngp.NGPModelConfig(grid=ngp.HashGridConfig(aabb_scale=1),
                              use_bf16=True, grid_impl="brick3")
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=64,
                           n_compact=20, near_distance=0.05,
                           fused_march=True, compact_source="grid")
    tcfg = NGPTrainConfig(lr=1e-2, n_rays_per_batch=8192,
                          target_batch_size=1 << 18,
                          n_grid_uniform=1 << 16, n_grid_nonuniform=1 << 16,
                          decay_start=20000, update_den_freq=16,
                          tot_train_steps=6000)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    it = 0
    t0 = time.perf_counter()
    while it < 6000:
        key, k1, k2 = jax.random.split(key, 3)
        trainer.state = trainer.state._replace(occ=trainer.grid_update(
            trainer.state.occ, trainer.state.params, k1))
        ids = rng.integers(0, tr_o.shape[0], (16, 8192))
        trainer.train_block(tr_o[ids], tr_d[ids], tr_rgb[ids], k2)
        it += 16
    emit(event="tt_tune_trained", steps=it,
         wall_s=round(time.perf_counter() - t0, 1))

    # diagnostic: render from a TRAIN pose (the exact cameras the field was
    # fit to). High PSNR here + low val PSNR = the val poses are in the
    # wrong frame; low PSNR here = the field itself trained differently.
    ti = train_ids[5]
    img_t, _ = trainer.render_image(_field_c2w(poses_tr[5]),
                                    scene.intr[ti], H, W, chunk=8192)
    emit(event="tt_tune_trainpose_render",
         psnr=round(float(psnr(jnp.clip(img_t, 0, 1), scene.images[ti])), 2))

    ps_plain = []
    for j, vi in enumerate(val_ids):
        img, _ = trainer.render_image(_field_c2w(jnp.asarray(val_poses[j])),
                                      scene.intr[vi], H, W, chunk=8192)
        ps_plain.append(float(psnr(jnp.clip(img, 0, 1), scene.images[vi])))
    emit(event="tt_tune_plain", val_psnr=round(float(np.mean(ps_plain)), 2),
         val_psnrs=[round(p, 2) for p in ps_plain])

    for lr in (1e-3, 3e-4, 1e-4):
        ps_tt, meta = [], []
        for j, vi in enumerate(val_ids):
            pw = jnp.asarray(val_poses[j])
            loss_fn = make_ngp_pose_loss(
                trainer.occ_cfg, trainer.rcfg, trainer.model.apply,
                trainer.state.params, trainer.state.occ, pw,
                scene.intr[vi], scene.images[vi], H, W, n_rays=2048,
                world_scale=SCALE, world_offset=OFF, bg=jnp.ones(3),
                density_apply=trainer.model.density_raw)
            res = test_time_pose_optim(
                loss_fn, jax.random.fold_in(jax.random.PRNGKey(5), vi),
                lr=lr, max_iter=1000, stop_loss=7e-4)
            corr = pose_lib.compose_pair(lie.se3_to_SE3(res.se3)[0], pw)
            img, _ = trainer.render_image(_field_c2w(corr), scene.intr[vi],
                                          H, W, chunk=8192)
            ps_tt.append(float(psnr(jnp.clip(img, 0, 1), scene.images[vi])))
            meta.append({"iters": int(res.n_iters),
                         "loss": round(float(res.loss), 6)})
        emit(event="tt_tune_lr", lr=lr,
             val_psnr_tt=round(float(np.mean(ps_tt)), 2),
             val_psnrs_tt=[round(p, 2) for p in ps_tt], tt=meta)


if __name__ == "__main__":
    main()
