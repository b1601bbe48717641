"""GARF at the reference's FULL Easyship budget (VERDICT r4 #3b).

200k iters x 2048 rays x 128 samples with injected se(3) pose noise and
pose correction starting at iter 80k — the exact schedule of
barf-myc/options/Easyship.yaml:5,17,21,60. Logs the rotation/translation
error trajectory (Procrustes-aligned, barf.py:130-152 semantics) and train
PSNR every ``--log_every`` iters; the round-3 open question (weak #7: at
2k steps f32 rotation error looked WORSE than init) is settled by whether
the error ends below init once correction has actually run.

Usage: python scripts/garf_budget.py [--steps 200000] [--views 12]
       [--size 128] [--log_every 10000]
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

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.evaluation import pose_eval
from myc_nerfs_tpu.geom import lie, pose as pose_lib
from myc_nerfs_tpu.train import nerf_trainer as nt

LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "quality_r5_log.jsonl")


_FILE_LOG = [True]


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    if _FILE_LOG[0]:  # smoke runs (tiny --steps) stay off the repo log
        with open(LOG, "a") as f:
            f.write(line + "\n")


def pose_error(poses, poses_gt):
    aligned, _ = pose_eval.prealign_cameras(poses, poses_gt)
    err = pose_eval.evaluate_camera_alignment(aligned, poses_gt)
    return float(jnp.rad2deg(err.R.mean())), float(err.t.mean())


def pose_error_full(poses, poses_gt):
    """(mean, median, max) rotation deg + mean trans — a single outlier
    camera dominates the mean through the Procrustes prealign, so the
    median tells whether the BULK of cameras improved."""
    aligned, _ = pose_eval.prealign_cameras(poses, poses_gt)
    err = pose_eval.evaluate_camera_alignment(aligned, poses_gt)
    r = jnp.rad2deg(err.R)
    return (float(r.mean()), float(jnp.median(r)), float(r.max()),
            float(err.t.mean()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200000)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--noise", type=float, default=0.06)
    ap.add_argument("--log_every", type=int, default=10000)
    ap.add_argument("--ckpt", default="",
                    help="checkpoint path (saved each log; --resume "
                         "restarts after a tunnel wedge)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--rand_rays", type=int, default=2048,
                    help="reference: Easyship.yaml:21")
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--gate_frac", type=float, default=0.4,
                    help="start_pose_correct_iter as a fraction of steps "
                         "(0.4 = Easyship.yaml:60's 80k/200k; 0 = the "
                         "reference's synthetic-noise protocol, no gate)")
    args = ap.parse_args()
    _FILE_LOG[0] = args.steps >= 1000

    scene = make_scene(n_views=args.views, H=args.size, W=args.size,
                       textured=True)
    cfg = nt.NeRFTrainConfig(
        model="garf", refine_pose=True, camera_noise=args.noise,
        rand_rays=args.rand_rays, sample_intvs=args.samples,
        max_iter=args.steps,
        # Easyship.yaml:60 — correction starts at iter 80k of 200k
        start_pose_correct_iter=int(args.steps * args.gate_frac))
    model, state = nt.init_state(cfg, jax.random.PRNGKey(0),
                                 n_images=scene.images.shape[0])
    noisy = pose_lib.compose_pair(lie.se3_to_SE3(state.pose_noise),
                                  scene.poses)
    r0, t0_err = pose_error(noisy, scene.poses)
    emit(event="garf_budget_start", steps=args.steps, views=args.views,
         size=args.size, noise=args.noise,
         start_pose_correct=cfg.start_pose_correct_iter,
         rot_err_deg_init=round(r0, 3), trans_err_init=round(t0_err, 4))

    block = nt.make_train_block(cfg, model, scene.images, scene.poses,
                                scene.intr, steps_per_block=16)
    key = jax.random.PRNGKey(2)
    it = 0
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        from myc_nerfs_tpu.core.checkpoint import restore_checkpoint

        state, meta = restore_checkpoint(args.ckpt, state)
        it = int(meta.get("step", 0))
        emit(event="garf_budget_resumed", step=it)
    state, m = block(state, jax.random.fold_in(key, it // 16))
    _ = float(m["psnr"])
    it += 16
    it0 = it
    wall0 = time.perf_counter()
    next_log = (it // args.log_every + 1) * args.log_every
    i = it // 16
    traj = []  # (step, rot_mean, rot_med, trans) for trailing-window stats
    while it < args.steps:
        state, m = block(state, jax.random.fold_in(key, i))
        it += 16
        i += 1
        if it >= next_log or it >= args.steps:
            p = float(m["psnr"])
            refined = nt.compose_refined_pose(cfg, state, scene.poses)
            r1, rmed, rmax, t1 = pose_error_full(refined, scene.poses)
            traj.append((it, r1, rmed, t1))
            emit(event="garf_budget_log", step=it,
                 train_psnr=round(p, 2), rot_err_deg=round(r1, 3),
                 rot_err_med=round(rmed, 3), rot_err_max=round(rmax, 3),
                 trans_err=round(t1, 4),
                 it_s=round(16 * (i - it0 // 16)
                            / (time.perf_counter() - wall0), 1),
                 wall_s=round(time.perf_counter() - wall0, 1))
            next_log += args.log_every
            if args.ckpt:
                from myc_nerfs_tpu.core.checkpoint import save_checkpoint

                save_checkpoint(args.ckpt, state, step=it)
    refined = nt.compose_refined_pose(cfg, state, scene.poses)
    r1, t1 = pose_error(refined, scene.poses)
    # Trailing-window statistics (VERDICT r4 weak#5): the endpoint sample
    # of a noisy trajectory is not evidence; aggregate the final quarter
    # of the logged trajectory so the improvement claim is robust to
    # where the run happens to stop.
    tail = [row for row in traj if row[0] > 0.75 * args.steps]
    trailing = {}
    if tail:
        import numpy as _np

        rm = _np.array([row[1] for row in tail])
        rmed_t = _np.array([row[2] for row in tail])
        tm = _np.array([row[3] for row in tail])
        trailing = dict(
            trailing_window_steps=[tail[0][0], tail[-1][0]],
            trailing_rot_mean=round(float(rm.mean()), 3),
            trailing_rot_mean_range=[round(float(rm.min()), 3),
                                     round(float(rm.max()), 3)],
            trailing_rot_med_mean=round(float(rmed_t.mean()), 3),
            trailing_trans_mean=round(float(tm.mean()), 4),
            trailing_improved=bool(rm.mean() < r0))
    emit(event="garf_budget_done", steps=args.steps, views=args.views,
         gate_frac=args.gate_frac,
         rot_err_deg_init=round(r0, 3), rot_err_deg_final=round(r1, 3),
         trans_err_init=round(t0_err, 4), trans_err_final=round(t1, 4),
         improved=bool(r1 < r0),
         wall_s=round(time.perf_counter() - wall0, 1), **trailing)


if __name__ == "__main__":
    main()
