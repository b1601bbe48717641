"""BARF-family training CLI (nerf / barf / garf).

Mirrors barf-myc/train.py + options.py: ``--model=garf --yaml=Easyship``
style invocation, YAML configs with ``_parent_`` inheritance and dot-path
overrides (``--optim.lr=1e-4``, ``--flag``, ``--flag!``). Runs the jitted
training loop with periodic validation, scalar logging, checkpointing, and
(for barf/garf) pose-error tracking — the Model engine loop of
barf-myc/model/base.py:15-167.

Usage:
    python -m myc_nerfs_tpu.cli.train --model=nerf --yaml=configs/barf/demo_synthetic.yaml
    python -m myc_nerfs_tpu.cli.train --model=garf --yaml=configs/barf/Easyship.yaml \
        --data.root=/path/to/Easyship --max_iter=200000
"""
from __future__ import annotations

import os
import sys
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from ..core.config import Config, apply_overrides, load_config
from ..evaluation import pose_eval, pose_export
from ..geom import lie
from ..geom import pose as pose_lib
from ..train import nerf_trainer as nt
from ..utils.logging import ETATimer, MetricWriter, log
from ..utils.metrics import psnr


def config_to_train_config(cfg: Config) -> nt.NeRFTrainConfig:
    """Map reference-style YAML keys (arch.*, nerf.*, optim.*) to
    NeRFTrainConfig (see options/nerf_blender.yaml)."""
    arch = cfg.get("arch", {})
    nerf = cfg.get("nerf", {})
    optim = cfg.get("optim", {})
    camera = cfg.get("camera", {})
    model = cfg.get("model", "nerf")
    posenc = arch.get("posenc") or {}
    layers_feat = arch.get("layers_feat", [None] + [256] * 8)
    layers_rgb = arch.get("layers_rgb", [None, 128, 3])
    return nt.NeRFTrainConfig(
        model=model,
        widths_feat=tuple(layers_feat[1:]),
        widths_rgb=tuple(layers_rgb[1:]),
        skip=tuple(arch.get("skip", [4])),
        posenc_L3D=(posenc.get("L_3D") if model != "garf" else None),
        posenc_Lview=(posenc.get("L_view") if model != "garf" else None),
        density_activ=arch.get("density_activ", "softplus"),
        view_dep=nerf.get("view_dep", True),
        depth_range=tuple(nerf.get("depth", {}).get("range", [2.0, 6.0])),
        sample_intvs=nerf.get("sample_intvs", 128),
        sample_stratified=nerf.get("sample_stratified", True),
        fine_sampling=nerf.get("fine_sampling", False),
        sample_intvs_fine=nerf.get("sample_intvs_fine") or 0,
        rand_rays=nerf.get("rand_rays", 2048),
        density_noise_reg=nerf.get("density_noise_reg") or 0.0,
        setbg_opaque=nerf.get("setbg_opaque", False),
        bgcolor=cfg.get("data", {}).get("bgcolor", 1.0),
        refine_pose=(model in ("barf", "garf")),
        c2f=(tuple(cfg["barf_c2f"]) if cfg.get("barf_c2f") else None),
        camera_noise=camera.get("noise") or 0.0,
        start_pose_correct_iter=cfg.get("start_pose_correct_iter", 0),
        lr=optim.get("lr", 5e-4),
        lr_end=optim.get("lr_end", 1e-4),
        lr_pose=optim.get("lr_pose", 3e-3),
        lr_pose_end=optim.get("lr_pose_end", 1e-5),
        warmup_pose=optim.get("warmup_pose") or 0,
        max_iter=cfg.get("max_iter", 200000),
    )


def load_views(cfg: Config):
    """Load (images, poses, intr, H, W) from a blender dir or synthesize."""
    data = cfg.get("data", {})
    if data.get("synthetic"):
        from ..data.synthetic import make_scene

        n = data.get("n_views", 10)
        H = W = data.get("image_size", [32, 32])[0]
        scene = make_scene(n_views=n, H=H, W=W,
                           textured=data.get("textured", False))
        return scene.images, scene.poses, scene.intr, H, W
    from ..data import blender

    root = data.get("root") or os.path.join(data.get("data_root", "data"),
                                            data.get("scene", ""))
    scene = blender.load_blender_split(root, data.get("split", "train"),
                                       downsample=data.get("downsample", 1.0))
    images, poses, intr = blender.barf_views(scene, bg=data.get("bgcolor", 1.0))
    return images, poses, intr, scene.H, scene.W


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
    os.makedirs(out_dir, exist_ok=True)
    writer = MetricWriter(out_dir, use_tb=cfg.get("tb", False))
    log.title(f"training {cfg.get('model', 'nerf')} -> {out_dir}")

    images, poses, intr, H, W = load_views(cfg)
    tcfg = config_to_train_config(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    key, k_init = jax.random.split(key)
    model, state = nt.init_state(tcfg, k_init, images.shape[0])

    ckpt_path = os.path.join(out_dir, "model.ckpt")
    start_iter = 0
    if cfg.get("resume") and latest_checkpoint(out_dir):
        state, meta = restore_checkpoint(ckpt_path, state)
        start_iter = int(meta.get("step", 0))
        log.info(f"resumed from iter {start_iter}")

    step = nt.make_train_step(tcfg, model, images, poses, intr)
    freq = cfg.get("freq", {})
    val_every = freq.get("val", 2000)
    ckpt_every = freq.get("ckpt", 5000)
    scalar_every = freq.get("scalar", 200)
    max_iter = cfg.get("max_iter_run", tcfg.max_iter)
    timer = ETATimer()

    # scanned multi-step blocks (dispatch amortization); blocks stop exactly
    # at iterations that need host-side actions so cadences stay bit-exact
    blocks = {}

    def next_action(it):
        cands = [max_iter - 1]
        if scalar_every:
            a = (it // scalar_every) * scalar_every
            cands.append(a if a >= it else a + scalar_every)
        if val_every:
            a = (it // val_every) * val_every + val_every - 1
            cands.append(a if a >= it else a + val_every)
        if ckpt_every:
            a = (it // ckpt_every) * ckpt_every + ckpt_every - 1
            cands.append(a if a >= it else a + ckpt_every)
        return min(c for c in cands if c >= it)

    it = start_iter
    while it < max_iter:
        s = max(1, min(16, next_action(it) + 1 - it, max_iter - it))
        if s == 1:
            fn = step
        else:
            if s not in blocks:
                blocks[s] = nt.make_train_block(tcfg, model, images, poses,
                                                intr, steps_per_block=s)
            fn = blocks[s]
        key, k = jax.random.split(key)
        state, metrics = fn(state, k)
        it += s - 1  # `it` is now the last executed iteration
        if it % scalar_every == 0:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                raise RuntimeError(f"loss is not finite at iter {it}")
            eta = timer.update(it, max_iter)
            writer.scalar("train/loss", loss, it)
            writer.scalar("train/psnr", float(metrics["psnr"]), it)
            log.info(f"it {it} loss {loss:.5f} psnr {float(metrics['psnr']):.2f} "
                     f"eta {eta / 60:.1f} min")
            if tcfg.refine_pose:
                refined = nt.compose_refined_pose(tcfg, state, poses)
                aligned, _ = pose_eval.prealign_cameras(refined, poses)
                err = pose_eval.evaluate_camera_alignment(aligned, poses)
                writer.scalar("train/error_R", float(err.R.mean()), it)
                writer.scalar("train/error_t", float(err.t.mean()), it)
        if val_every and it % val_every == val_every - 1:
            rgb, _ = nt.render_validation(tcfg, model, state.params, poses[0],
                                          intr[0], H, W)
            writer.scalar("val/psnr", float(psnr(rgb, images[0])), it)
        if ckpt_every and it % ckpt_every == ckpt_every - 1:
            save_checkpoint(ckpt_path, state, step=it + 1, keep_snapshot=True)
        it += 1

    save_checkpoint(ckpt_path, state, step=max_iter)
    if tcfg.refine_pose:
        refined = nt.compose_refined_pose(tcfg, state, poses)
        pose_export.write_transforms_json(
            os.path.join(out_dir, "transform_train.json"), refined)
        log.info(f"pose export -> {out_dir}/transform_train.json")
    log.info("done")
    return out_dir


if __name__ == "__main__":
    main()
