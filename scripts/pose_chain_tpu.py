"""End-to-end GARF pose-refinement chain on the TPU chip.

The reference repo's unique capability (README.md:12-16, SURVEY.md §0):
noisy camera extrinsics -> GARF jointly optimizes NeRF + per-image SE(3)
corrections -> corrected poses feed Instant-NGP. This script runs the whole
chain on the synthetic scene with injected pose noise and reports:
  1. camera R/t error before vs after GARF (Procrustes-aligned)
  2. NGP train PSNR with noisy vs GARF-refined poses
One JSON line per stage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.evaluation import pose_eval
from myc_nerfs_tpu.geom import lie, pose as pose_lib, rays as rays_lib
from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train import nerf_trainer as nt
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer


def emit(**kw):
    print(json.dumps(kw), flush=True)


def pose_error(poses, poses_gt):
    aligned, _ = pose_eval.prealign_cameras(poses, poses_gt)
    err = pose_eval.evaluate_camera_alignment(aligned, poses_gt)
    return float(jnp.rad2deg(err.R.mean())), float(err.t.mean())


def train_ngp_psnr(poses_w2c, scene, steps=1200, tag=""):
    """Short NGP training on rays from the given (possibly noisy) poses."""
    SCALE, OFF = 0.33, 0.5
    H = W = scene.H
    c, r = rays_lib.get_center_and_ray(poses_w2c, scene.intr, H, W)
    d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    tr_o = (c * SCALE + OFF).reshape(-1, 3)
    tr_d = d.reshape(-1, 3)
    tr_rgb = scene.images.reshape(-1, 3)
    mcfg = ngp.NGPModelConfig(grid=ngp.HashGridConfig(
        n_levels=8, log2_hashmap_size=15, desired_resolution=256.0),
        use_bf16=True)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32,
                           n_compact=16, near_distance=0.05)
    tcfg = NGPTrainConfig(lr=2e-2, n_rays_per_batch=2048,
                          target_batch_size=1 << 15,
                          n_grid_uniform=1 << 14, n_grid_nonuniform=1 << 14,
                          decay_start=10 ** 6, update_den_freq=16)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    S = 16
    m = None
    for blk in range(steps // S):
        key, k1, k2 = jax.random.split(key, 3)
        trainer.state = trainer.state._replace(occ=trainer.grid_update(
            trainer.state.occ, trainer.state.params, k1))
        ids = rng.integers(0, tr_o.shape[0], (S, 2048))
        m = trainer.train_block(tr_o[ids], tr_d[ids], tr_rgb[ids], k2)
    return float(m["psnr"])


def main():
    scene = make_scene(n_views=12, H=64, W=64, textured=True)
    n_img = scene.images.shape[0]

    cfg = nt.NeRFTrainConfig(
        model="garf", refine_pose=True, camera_noise=0.06,
        rand_rays=2048, sample_intvs=96, max_iter=12000,
        start_pose_correct_iter=3000)
    model, state = nt.init_state(cfg, jax.random.PRNGKey(0), n_images=n_img)

    noisy = pose_lib.compose_pair(lie.se3_to_SE3(state.pose_noise),
                                  scene.poses)
    r0, t0 = pose_error(noisy, scene.poses)
    emit(stage="initial_noise", rot_err_deg=round(r0, 3),
         trans_err=round(t0, 4))

    block = nt.make_train_block(cfg, model, scene.images, scene.poses,
                                scene.intr, steps_per_block=16)
    key = jax.random.PRNGKey(2)
    t0_ = time.perf_counter()
    nblk = cfg.max_iter // 16
    for i in range(nblk):
        state, m = block(state, jax.random.fold_in(key, i))
    jax.block_until_ready(m["psnr"]); _ = float(m["psnr"])
    train_s = time.perf_counter() - t0_
    emit(stage="garf_train", steps=nblk * 16,
         train_psnr=round(float(m["psnr"]), 2), wall_s=round(train_s, 1))

    refined = nt.compose_refined_pose(cfg, state, scene.poses)
    r1, t1 = pose_error(refined, scene.poses)
    emit(stage="after_garf", rot_err_deg=round(r1, 3), trans_err=round(t1, 4),
         rot_reduction=round(r0 / max(r1, 1e-9), 1))

    # NGP trained with the noisy vs the GARF-corrected cameras.
    # Rays must match the IMAGES' true geometry: render rays from pose P for
    # images shot at GT: refined ~ GT up to a global sim3 (harmless).
    p_noisy = train_ngp_psnr(noisy, scene, tag="noisy")
    emit(stage="ngp_with_noisy_poses", train_psnr=round(p_noisy, 2))
    p_ref = train_ngp_psnr(refined, scene, tag="refined")
    emit(stage="ngp_with_refined_poses", train_psnr=round(p_ref, 2),
         psnr_gain_db=round(p_ref - p_noisy, 2))


if __name__ == "__main__":
    main()
