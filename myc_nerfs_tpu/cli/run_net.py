"""Instant-NGP CLI (the reference's tools/run_net.py).

Mirrors jnerf-myc/tools/run_net.py:16-54: ``--config-file <cfg.py>
--task train|test|render [--save_dir d]`` with python-module configs
(_base_ inheritance). Drives NGPTrainer (the Runner equivalent) on blender
data or a synthetic scene.
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import components  # noqa: F401  (registers the type= factories)
from ..core.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from ..core.config import init_cfg, load_config
from ..core.registry import (ENCODERS, LOSSES, NETWORKS, OPTIMS, SAMPLERS,
                             SCHEDULERS, build_from_cfg)
from ..geom.camera_path import path_spherical
from ..render.ngp_render import NGPRenderConfig
from ..train.ngp_trainer import NGPTrainConfig, NGPTrainer
from ..utils.logging import MetricWriter, log
from ..utils.metrics import psnr

# val-render cadence during training (runner.py:80-84 renders a val image
# every 4096 steps); module-level so tests can shrink it.
VAL_EVERY = 4096


def build_trainer(cfg, key, camera_c2w=None, focal=None, image_wh=None):
    """Assemble the NGP pipeline from the config's ``type=`` keys through the
    registries, like the reference Runner (runner.py:16-60, registry.py:24-46).
    """
    ds_cfg = cfg.get("dataset", {}).get("train", {})
    aabb_scale = ds_cfg.get("aabb_scale", 1)
    enc_cfg = dict(cfg.get("encoder", {}).get(
        "pos_encoder", {"type": "HashEncoder"}))
    enc_cfg.update(cfg.get("hash_grid_overrides", {}))
    grid = build_from_cfg(enc_cfg, ENCODERS, aabb_scale=aabb_scale)
    dir_cfg = cfg.get("encoder", {}).get("dir_encoder")
    dir_enc = build_from_cfg(dict(dir_cfg), ENCODERS) if dir_cfg else None
    mcfg = build_from_cfg(dict(cfg.get("model", {"type": "NGPNetworks"})),
                          NETWORKS, grid=grid, dir_encoder=dir_enc,
                          use_bf16=cfg.get("fp16", False),
                          grid_impl=cfg.get("grid_impl", "brick3"))
    # OriginNeRFNetworks (projects/nerf) pairs a frequency-encoded MLP field
    # with the same sampler pipeline (nerf_base.py:15-17) — the trainer takes
    # it as a model override on top of the shared Runner machinery
    from ..models.ori_nerf import OriginNeRFConfig, OriginNeRFModel

    model = OriginNeRFModel(mcfg) if isinstance(mcfg, OriginNeRFConfig) else None
    rcfg = NGPRenderConfig(
        aabb_scale=aabb_scale,
        n_coarse=cfg.get("n_coarse", 512),
        n_samples=cfg.get("n_samples", 64),
        near_distance=cfg.get("near_distance", 0.2),
        cone_angle_constant=cfg.get("cone_angle_constant", 0.00390625),
        const_dt=cfg.get("const_dt", True),
        # scale-aware march budget: 20 is quality-gated at aabb_scale=1 at
        # both the 6k gate and the 40k budget (quality_r4_log ncompact_gate
        # / ngp40k_budget_*; 18 fails the 40k horizon, PERF_NOTES par.18d);
        # cascaded scenes need ~64 or the compaction undersamples the
        # longer ray extent (PERF_NOTES par.8b)
        n_compact=cfg.get("n_compact", 20 if aabb_scale <= 1 else 64),
        fused_march=cfg.get("fused_march", True),
        # render-side transmittance cutoff; 1e-2 with n_samples 20 is the
        # validated fast render profile (PERF_NOTES §9b)
        early_stop_eps=cfg.get("early_stop_eps", 1e-4))
    sampler = build_from_cfg(dict(cfg.get(
        "sampler", {"type": "DensityGridSampler"})), SAMPLERS)
    optim = build_from_cfg(dict(cfg.get("optim", {"type": "Adam"})), OPTIMS)
    exp = build_from_cfg(dict(cfg.get("expdecay", {"type": "ExpDecay"})),
                         SCHEDULERS)
    ema = build_from_cfg(dict(cfg.get("ema", {"type": "EMA"})), OPTIMS)
    loss_fn = build_from_cfg(dict(cfg.get("loss", {"type": "HuberLoss"})),
                             LOSSES)
    tcfg = NGPTrainConfig(
        lr=optim["lr"], eps=optim["eps"], betas=optim["betas"],
        ema_decay=ema["decay"],
        decay_start=exp["decay_start"],
        decay_interval=exp["decay_interval"],
        decay_base=exp["decay_base"],
        n_rays_per_batch=cfg.get("n_rays_per_batch", 4096),
        target_batch_size=cfg.get("target_batch_size", 1 << 18),
        update_den_freq=sampler["update_den_freq"],
        background_color=tuple(cfg.get("background_color", (1, 1, 1))),
        tot_train_steps=cfg.get("tot_train_steps", 40000),
        n_grid_uniform=cfg.get("n_grid_uniform", 1 << 16),
        n_grid_nonuniform=cfg.get("n_grid_nonuniform", 1 << 16),
        # fp16=True in the reference runs the whole backward in fp16 at amp
        # level 5 (ori_nerf_network.py:33) under a GradScaler that skips
        # inf/nan-grad steps (nerf_base.py:80). Full parity = bf16 compute
        # + fp16-range grad emulation (grads scaled through float16, so
        # over-range grads become inf exactly where the reference's would)
        # + the step skip. Config keys `skip_nonfinite`/`fp16_grads`
        # override individually.
        skip_nonfinite=cfg.get("skip_nonfinite", bool(cfg.get("fp16", False))),
        fp16_grads=cfg.get("fp16_grads", bool(cfg.get("fp16", False))),
        # staged march budget (default at aabb_scale<=1): n_compact=20
        # until decay_start, 32 after. Gated at the 40k reference horizon
        # (quality_r5_log ngp40k_budget_nc_schedule: val 33.30 vs 33.17 for
        # flat 32 and 32.89 for flat 20) — the schedule recovers the flat-20
        # profile's late-training deficit because the sample-budget floor
        # only binds once the field sharpens (PERF_NOTES par.18d mechanism).
        # An explicit `n_compact` or `n_compact_schedule` in the config
        # wins; cascaded scenes keep their flat 64.
        n_compact_schedule=cfg.get(
            "n_compact_schedule",
            (((0, 20), (exp["decay_start"], 32))
             if ("n_compact" not in cfg and aabb_scale <= 1
                 and cfg.get("tot_train_steps", 40000) > exp["decay_start"])
             else None)))
    trainer = NGPTrainer(mcfg, rcfg, tcfg, key, camera_c2w=camera_c2w,
                         focal=focal, image_wh=image_wh, loss_fn=loss_fn,
                         model=model)
    return trainer, tcfg


def _synthetic_scene(cfg):
    """Build (once per cfg) the synthetic scene for run_net's data-free mode.

    cfg keys: synthetic_size (H=W), synthetic_views (train view count),
    synthetic_val_views (extra HELD-OUT views appended after the train
    views — both loaders slice the same scene so val never sees a train
    pose), synthetic_scene ('blobs' default, or 'detail' for the 256^2
    quality harness field). The config carries the live scene object like
    the reference cfg carries dataset_obj (runner.py:26)."""
    scene = cfg.get("_synthetic_scene_obj")
    if scene is not None:
        return scene
    from ..data import synthetic as syn

    H = W = cfg.get("synthetic_size", 24)
    n = cfg.get("synthetic_views", 10) + cfg.get("synthetic_val_views", 0)
    kind = cfg.get("synthetic_scene", "blobs")
    cache = f"/tmp/run_net_scene_{kind}_{n}_{H}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        scene = syn.SyntheticScene(
            images=jnp.asarray(z["images"]), poses=jnp.asarray(z["poses"]),
            intr=jnp.asarray(z["intr"]), H=H, W=W,
            depth_range=tuple(z["depth_range"]))
    else:
        if kind == "detail":
            scene = syn.make_detail_scene(n_views=n, H=H, W=W)
        else:
            scene = syn.make_scene(n_views=n, H=H, W=W)
        np.savez(cache, images=np.asarray(scene.images),
                 poses=np.asarray(scene.poses), intr=np.asarray(scene.intr),
                 depth_range=np.asarray(scene.depth_range))
    cfg["_synthetic_scene_obj"] = scene
    return scene


def load_data(cfg):
    ds_cfg = cfg.get("dataset", {}).get("train", {})
    if cfg.get("synthetic"):
        from ..geom import rays as rays_lib

        full = _synthetic_scene(cfg)
        H, W = full.H, full.W
        n_train = cfg.get("synthetic_views", 10)
        scene = full._replace(images=full.images[:n_train],
                              poses=full.poses[:n_train],
                              intr=full.intr[:n_train])
        SCALE, OFF = 0.33, 0.5
        c, r = rays_lib.get_center_and_ray(scene.poses, scene.intr, H, W)
        d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        o = (c * SCALE + OFF)

        class SyntheticNGPData:
            n_images = scene.images.shape[0]
            n_pixels = H * W
            images = np.asarray(scene.images)
            focal = float(scene.intr[0, 0, 0])  # make_scene: 1.2 * W
            # analytic renders are pre-composited over white (render_analytic
            # bg_color=1.0) — training must use the same bg, not random
            fixed_bg = (1.0, 1.0, 1.0)

            def __init__(self):
                self._o = np.asarray(o.reshape(scene.images.shape[0], -1, 3))
                self._d = np.asarray(d.reshape(scene.images.shape[0], -1, 3))

            def rays_for_pixels(self, img_ids, pix_ids):
                return self._o[img_ids, pix_ids], self._d[img_ids, pix_ids]

            def pixel_values(self, img_ids, pix_ids, bg=None):
                return self.images.reshape(self.n_images, -1, 3)[img_ids, pix_ids]

        return SyntheticNGPData(), H, W
    from ..data import blender

    ds = blender.load_ngp_train_data(
        ds_cfg.get("root_dir", "data"),
        aabb_scale=ds_cfg.get("aabb_scale", 1),
        scale=ds_cfg.get("scale"), offset=ds_cfg.get("offset"),
        correct_pose=tuple(ds_cfg.get("correct_pose", (-1, -1, 1))))
    ds.n_pixels = ds.H * ds.W
    ds.n_images = ds.images.shape[0]
    return ds, ds.H, ds.W


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", required=True)
    parser.add_argument("--task", default="train",
                        choices=["train", "test", "render"])
    parser.add_argument("--save_dir", default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--steps", type=int, default=0,
                        help="override tot_train_steps")
    args = parser.parse_args(argv)

    cfg = load_config(args.config_file)
    if args.synthetic:
        cfg["synthetic"] = True
    init_cfg(cfg)
    out_dir = args.save_dir or os.path.join(cfg.get("log_dir", "./logs"),
                                            cfg.get("exp_name", "run"))
    os.makedirs(out_dir, exist_ok=True)
    writer = MetricWriter(out_dir)

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    data, H, W = load_data(cfg)
    # wire the dataset's cameras so mark_untrained can blank never-seen cells
    # (runner.py builds the sampler with the dataset, mark_untrained_density_
    # grid runs at step 0 — density_grid_sampler.py:207-212)
    cam_kw = {}
    if hasattr(data, "c2w_ngp"):
        cam_kw = {"camera_c2w": jnp.asarray(data.c2w_ngp),
                  "focal": jnp.asarray(data.focal),
                  "image_wh": (W, H)}
    trainer, tcfg = build_trainer(cfg, k, **cam_kw)

    ckpt = os.path.join(out_dir, "model.ckpt")
    if cfg.get("load_ckpt") and latest_checkpoint(out_dir):
        try:
            trainer.state, meta = restore_checkpoint(ckpt, trainer.state)
        except (ValueError, KeyError, TypeError) as e:
            # the usual cause: the checkpoint was trained under a different
            # hash-grid layout than this build's default (grid_impl switched
            # from 'brick' to 'brick3' in round 3); table counts/shapes then
            # disagree and flax restore fails structurally
            raise SystemExit(
                f"checkpoint restore failed ({e}); if this run predates the "
                "brick3 default, set grid_impl='brick' in the config to "
                "match the checkpoint's table layout") from e
        log.info(f"resumed @ {meta.get('step')}")

    if args.task == "train":
        from ..data.blender import RayBatcher

        steps = args.steps or tcfg.tot_train_steps
        batcher = RayBatcher(data.n_images, data.n_pixels,
                             trainer.n_rays_per_batch)
        rng = np.random.default_rng(0)
        val_views = None
        S = tcfg.update_den_freq  # steps per dispatch (= grid-update cadence)
        it = int(trainer.state.step)
        while it < steps:
            if batcher.batch != trainer.n_rays_per_batch:
                batcher = RayBatcher(data.n_images, data.n_pixels,
                                     trainer.n_rays_per_batch, seed=it)
            key, k = jax.random.split(key)
            new_occ = trainer.grid_update(trainer.state.occ,
                                          trainer.state.params, k)
            trainer.state = trainer.state._replace(occ=new_occ)
            s = min(S, steps - it)
            os_, ds_, ts_, bgs = [], [], [], []
            # random per-ray bg compositing of RGBA targets (runner.py:66-68);
            # pre-composited RGB data (the synthetic scenes) can't be
            # re-blended, so it pins the bg the images were rendered over
            fixed_bg = getattr(data, "fixed_bg", None)
            for _ in range(s):
                img_ids, pix_ids = batcher.next()
                o, d = data.rays_for_pixels(img_ids, pix_ids)
                bg = (np.tile(np.asarray(fixed_bg, np.float32),
                              (len(img_ids), 1)) if fixed_bg is not None
                      else rng.uniform(0, 1, (len(img_ids), 3)).astype(
                          np.float32))
                ts_.append(data.pixel_values(img_ids, pix_ids, bg=bg))
                bgs.append(bg)
                os_.append(o)
                ds_.append(d)
            key, k = jax.random.split(key)
            m = trainer.train_block(np.stack(os_), np.stack(ds_),
                                    np.stack(ts_), k, bg=np.stack(bgs))
            trainer._update_batch_rays()
            it += s
            if (it // S) % max(1, 100 // S) == 0:
                writer.scalar("psnr", float(m["psnr"]), it)
                log.info(f"step {it} psnr {float(m['psnr']):.2f} "
                         f"rays/batch {trainer.n_rays_per_batch}")
            if it % VAL_EVERY < S and it >= VAL_EVERY:
                # val PSNR cadence (runner.py:80-84): render one val image,
                # append to psnr.txt
                if val_views is None:
                    try:
                        val_views = load_eval_views(cfg, data, H, W)
                    except (FileNotFoundError, AssertionError, RuntimeError,
                            KeyError, ValueError, TypeError) as e:
                        # a malformed eval config must skip val cadence, not
                        # abort the training loop (same rule as the render
                        # task's intrinsics probe below). Named types so a
                        # genuine regression in load_eval_views still raises
                        # loudly instead of silently disabling val PSNR.
                        log.error(f"val views unavailable ({type(e).__name__}):"
                                  f" {e!r} — val PSNR cadence disabled")
                        val_views = (None, [], [])
                imgs, c2ws, intrs = val_views
                if imgs is not None and len(c2ws):
                    rgb, _ = trainer.render_image(jnp.asarray(c2ws[0]),
                                                  jnp.asarray(intrs[0]), H, W)
                    p = float(psnr(jnp.clip(rgb, 0, 1), jnp.asarray(imgs[0])))
                    writer.scalar("psnr_val", p, it)
                    with open(os.path.join(out_dir, "psnr.txt"), "a") as f:
                        f.write(f"{it} {p}\n")
                    log.info(f"step {it} val psnr {p:.2f}")
                save_checkpoint(ckpt, trainer.state, step=it)
        save_checkpoint(ckpt, trainer.state, step=steps)
        log.info(f"saved {ckpt}")
    elif args.task == "test":
        # Runner.test (runner.py:88-103, 166-185): render eval views, PSNR,
        # append to psnr.txt, save PNGs
        from PIL import Image

        images, c2ws, intrs = load_eval_views(cfg, data, H, W)
        test_dir = os.path.join(out_dir, "test")
        os.makedirs(test_dir, exist_ok=True)
        psnrs = []
        for i in range(len(c2ws)):
            rgb, _ = trainer.render_image(jnp.asarray(c2ws[i]),
                                          jnp.asarray(intrs[i]), H, W)
            arr = np.asarray(jnp.clip(rgb, 0, 1))
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                os.path.join(test_dir, f"r_{i}.png"))
            if images is not None:
                p = float(psnr(jnp.asarray(arr), jnp.asarray(images[i])))
                psnrs.append(p)
                writer.scalar("psnr_test", p, i)
                log.info(f"test view {i}: psnr {p:.2f}")
        if psnrs:
            with open(os.path.join(out_dir, "psnr.txt"), "a") as f:
                f.write(f"mean {float(np.mean(psnrs))}\n")
            log.info(f"TOTAL PSNR: {float(np.mean(psnrs)):.3f}")
    elif args.task == "render":
        from ..evaluation.visualization import write_video

        # Runner.render uses the dataset's camera intrinsics along the
        # spherical path (runner.py:105-125), not a synthetic focal. The
        # training dataset already carries them — don't volume-render the
        # eval GT set just to read one 3x3 matrix.
        if hasattr(data, "focal"):
            f = float(np.asarray(data.focal).reshape(-1)[0])
            intr = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
        else:
            try:
                _, _, ev_intrs = load_eval_views(cfg, data, H, W)
            except Exception as e:  # noqa: BLE001 - optional probe only
                log.info(f"eval-intrinsics probe failed ({e!r}); "
                         "falling back to synthetic intrinsics")
                ev_intrs = []
            intr = (jnp.asarray(ev_intrs[0]) if len(ev_intrs) else jnp.asarray(
                [[W * 0.6, 0, W / 2], [0, W * 0.6, H / 2], [0, 0, 1.0]]))
        frames = []
        for c2w in path_spherical(cfg.get("render_frames", 8)):
            rgb, _ = trainer.render_image(jnp.asarray(c2w), intr, H, W)
            frames.append(np.asarray(jnp.clip(rgb, 0, 1)))
        out = write_video(os.path.join(out_dir, "demo.mp4"), frames, fps=8)
        log.info(f"render -> {out or out_dir + '/demo/'}")
    return out_dir


def load_eval_views(cfg, train_data, H, W):
    """Eval views -> (images or None, c2w list (NGP space), intr list)."""
    if cfg.get("synthetic"):
        scene = _synthetic_scene(cfg)
        n_train = cfg.get("synthetic_views", 10)
        n_val = cfg.get("synthetic_val_views", 0)
        # held-out views when configured; otherwise the first train views
        # (the original smoke behavior)
        idx = (range(n_train, n_train + n_val) if n_val
               else range(min(4, n_train)))
        SCALE, OFF = 0.33, 0.5
        c2ws, intrs, imgs = [], [], []
        for i in idx:
            R, t = scene.poses[i][:, :3], scene.poses[i][:, 3]
            c2w = jnp.concatenate([R.T, (-R.T @ t[:, None]) * SCALE + OFF], 1)
            c2ws.append(c2w)
            intrs.append(scene.intr[i])
            imgs.append(np.asarray(scene.images[i]))
        return np.asarray(imgs), c2ws, intrs
    from ..data import blender

    ds_cfg = cfg.get("dataset", {}).get("val", cfg.get("dataset", {}).get("train", {}))
    scene = blender.load_blender_split(ds_cfg.get("root_dir", "data"), "val",
                                       require_images=False)
    ds = blender.NGPDataset.from_scene(
        scene, aabb_scale=ds_cfg.get("aabb_scale", 1),
        scale=ds_cfg.get("scale"), offset=ds_cfg.get("offset"),
        correct_pose=tuple(ds_cfg.get("correct_pose", (-1, -1, 1))))
    intr = np.asarray([[scene.focal, 0, scene.W / 2],
                       [0, scene.focal, scene.H / 2], [0, 0, 1.0]], np.float32)
    imgs = blender.blend_background(scene) if scene.images.shape[0] else None
    return imgs, list(ds.c2w_ngp), [intr] * ds.c2w_ngp.shape[0]


if __name__ == "__main__":
    main()
