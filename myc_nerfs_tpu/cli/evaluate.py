"""BARF-family evaluation CLI (the reference's evaluate.py).

Mirrors barf-myc/evaluate.py + model/garf.py evaluate_full (garf.py:209-230):
restore a checkpoint, render every eval view (optionally after test-time
photometric pose optimization), dump per-image PSNR to quant.txt, export
refined train poses + per-image optimized val poses to transform_*.json —
the inputs of the compare_pose test-pose transfer.

Usage:
    python -m myc_nerfs_tpu.cli.evaluate --model=garf --yaml=<cfg> [--start=0]
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import restore_checkpoint
from ..core.config import Config, apply_overrides, load_config
from ..evaluation import pose_eval, pose_export
from ..evaluation.test_time_optim import test_time_pose_optim
from ..geom import lie, pose as pose_lib, rays as rays_lib
from ..train import nerf_trainer as nt
from ..utils.logging import MetricWriter, log
from ..utils.metrics import psnr
from .train import config_to_train_config, load_views


def main(argv: Optional[list] = None):
    argv = list(sys.argv[1:] if argv is None else argv)
    model_arg = [a for a in argv if a.startswith("--model=")]
    yaml_arg = [a for a in argv if a.startswith("--yaml=")]
    rest = [a for a in argv if not (a.startswith("--model=") or a.startswith("--yaml="))]
    cfg = load_config(yaml_arg[0].split("=", 1)[1]) if yaml_arg else Config()
    if model_arg:
        cfg["model"] = model_arg[0].split("=", 1)[1]
    cfg = apply_overrides(cfg, rest, strict=False)

    out_dir = os.path.join(cfg.get("output_root", "output"),
                           cfg.get("group", "default"), cfg.get("name", "run"))
    writer = MetricWriter(out_dir)
    images, poses_gt, intr, H, W = load_views(cfg)
    tcfg = config_to_train_config(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    model, state = nt.init_state(tcfg, key, images.shape[0])
    ckpt = os.path.join(out_dir, "model.ckpt")
    state, meta = restore_checkpoint(ckpt, state)
    log.info(f"restored {ckpt} @ step {meta.get('step')}")

    # pose error + train-pose export (garf.py:209-228)
    if tcfg.refine_pose:
        refined = nt.compose_refined_pose(tcfg, state, poses_gt)
        aligned, sim3 = pose_eval.prealign_cameras(refined, poses_gt)
        err = pose_eval.evaluate_camera_alignment(aligned, poses_gt)
        log.info(f"rot: {np.rad2deg(float(err.R.mean())):8.3f} deg  "
                 f"trans: {float(err.t.mean()):10.5f}")
        for i, (r, t) in enumerate(zip(np.asarray(err.R), np.asarray(err.t))):
            writer.quant_line("quant_pose.txt", i, float(r), float(t))
        pose_export.write_transforms_json(
            os.path.join(out_dir, "transform_train.json"), refined)

    # per-view eval (+ test-time photometric optim, garf.py:232-269)
    start = cfg.get("start", 0)
    test_photo = cfg.get("optim", {}).get("test_photo", False) and tcfg.refine_pose
    val_poses = []
    n_samples = tcfg.sample_intvs
    grid = rays_lib.pixel_grid(H, W)
    for i in range(start, images.shape[0]):
        pose_i = poses_gt[i]
        if test_photo:
            target = images[i].reshape(-1, 3)

            def loss_fn(se3, k):
                idx = jax.random.randint(k, (tcfg.rand_rays,), 0, H * W)
                p = pose_lib.compose_pair(lie.se3_to_SE3(se3)[0], pose_i)
                center, ray = rays_lib.get_center_and_ray(
                    p[None], intr[i:i + 1], H, W, xy_grid=grid[idx])
                from ..render.mlp_renderer import render_rays_mlp

                out = render_rays_mlp(
                    lambda pts, du: model.apply(state.params, pts, du),
                    center, ray, k, n_samples, tcfg.depth_range,
                    stratified=False, view_dep=tcfg.view_dep)
                return ((out.rgb[0] - target[idx]) ** 2).mean()

            key, k = jax.random.split(key)
            res = test_time_pose_optim(
                loss_fn, k, lr=tcfg.lr_pose / 2,
                max_iter=cfg.get("optim", {}).get("test_iter", 100) * 100,
                stop_loss=7e-4)
            pose_i = pose_lib.compose_pair(lie.se3_to_SE3(res.se3)[0], pose_i)
            writer.quant_line("loss.txt", float(res.loss), int(res.n_iters))
        val_poses.append(pose_i)
        rgb, depth = nt.render_validation(tcfg, model, state.params, pose_i,
                                          intr[i], H, W)
        p = float(psnr(rgb, images[i]))
        writer.quant_line("quant.txt", i, p)
        log.info(f"view {i}: psnr {p:.2f}")
        from PIL import Image

        Image.fromarray((np.asarray(jnp.clip(rgb, 0, 1)) * 255).astype(np.uint8)
                        ).save(os.path.join(out_dir, f"rgb_{i}.png"))

    if tcfg.refine_pose and val_poses:
        pose_export.write_transforms_json(
            os.path.join(out_dir, "transform_val.json"),
            jnp.stack(val_poses), file_pattern="./val/r_{}")
        log.info(f"val pose export -> {out_dir}/transform_val.json")

    if cfg.get("video"):
        # novel-view synthesis video along a small orbit around view 0
        # (generate_videos_synthesis, nerf.py:160-199)
        from ..evaluation.visualization import visualize_depth, write_video

        novel = pose_lib.get_novel_view_poses(poses_gt[0],
                                              N=cfg.get("video_frames", 30))
        rgb_frames, depth_frames = [], []
        for i in range(novel.shape[0]):
            rgb, depth = nt.render_validation(tcfg, model, state.params,
                                              novel[i], intr[0], H, W)
            rgb_frames.append(np.asarray(jnp.clip(rgb, 0, 1)))
            dimg, _ = visualize_depth(1.0 / np.maximum(np.asarray(depth), 1e-3))
            depth_frames.append(dimg)
        v1 = write_video(os.path.join(out_dir, "novel_view_rgb.mp4"),
                         rgb_frames, fps=10)
        v2 = write_video(os.path.join(out_dir, "novel_view_invdepth.mp4"),
                         depth_frames, fps=10)
        log.info(f"videos -> {v1}, {v2}")
    return out_dir


if __name__ == "__main__":
    main()
