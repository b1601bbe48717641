"""GARF bf16 vs f32: throughput + quality gate (VERDICT r2 #5).

Runs the GARF joint pose-refinement trainer at the reference shape
(2048 rays x 128 samples, 6x256 gaussian MLP, Easyship.yaml budget scaled
down) with injected pose noise, once in f32 and once with bf16 matmuls
(params/activation-heads stay f32 — models/nerf_mlp.NeRFMLP.use_bf16).
Reports it/s, train PSNR and Procrustes pose error per variant.
Target: bf16 >= 40 it/s so the 200k-iter Easyship budget fits ~80 min;
quality gate: PSNR within 0.3 dB and pose error within 10% of f32.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.evaluation import pose_eval
from myc_nerfs_tpu.geom import lie, pose as pose_lib
from myc_nerfs_tpu.train import nerf_trainer as nt

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000


def emit(**kw):
    print(json.dumps(kw), flush=True)


def pose_error(poses, poses_gt):
    aligned, _ = pose_eval.prealign_cameras(poses, poses_gt)
    err = pose_eval.evaluate_camera_alignment(aligned, poses_gt)
    return float(jnp.rad2deg(err.R.mean())), float(err.t.mean())


def run(tag, use_bf16):
    scene = make_scene(n_views=12, H=64, W=64, textured=True)
    cfg = nt.NeRFTrainConfig(
        model="garf", refine_pose=True, camera_noise=0.06,
        rand_rays=2048, sample_intvs=128, max_iter=STEPS,
        start_pose_correct_iter=STEPS // 4, use_bf16=use_bf16)
    model, state = nt.init_state(cfg, jax.random.PRNGKey(0),
                                 n_images=scene.images.shape[0])
    noisy = pose_lib.compose_pair(lie.se3_to_SE3(state.pose_noise),
                                  scene.poses)
    r0, _ = pose_error(noisy, scene.poses)
    block = nt.make_train_block(cfg, model, scene.images, scene.poses,
                                scene.intr, steps_per_block=16)
    key = jax.random.PRNGKey(2)
    # warm up compile outside the timer
    state, m = block(state, jax.random.fold_in(key, 0))
    _ = float(m["psnr"])
    t0 = time.perf_counter()
    nblk = STEPS // 16 - 1
    if nblk < 1:
        raise SystemExit(f"STEPS={STEPS} too small: need >= 32 "
                         "(one warmup block + one timed 16-step block)")
    for i in range(1, 1 + nblk):
        state, m = block(state, jax.random.fold_in(key, i))
    p = float(m["psnr"])
    wall = time.perf_counter() - t0
    refined = nt.compose_refined_pose(cfg, state, scene.poses)
    r1, t1 = pose_error(refined, scene.poses)
    emit(variant=tag, steps=16 * nblk, it_s=round(16 * nblk / wall, 1),
         train_psnr=round(p, 2), rot_err_deg_init=round(r0, 3),
         rot_err_deg=round(r1, 3), trans_err=round(t1, 4),
         wall_s=round(wall, 1))
    return p, r1


if __name__ == "__main__":
    p32, r32 = run("garf_f32", False)
    p16, r16 = run("garf_bf16", True)
    emit(variant="delta", psnr_gap=round(p32 - p16, 2),
         rot_err_ratio=round(r16 / max(r32, 1e-9), 3))
