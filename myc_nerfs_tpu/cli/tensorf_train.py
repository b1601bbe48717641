"""TensoRF CLI (the reference's tensorf-myc/train.py).

Mirrors tensorf-myc/opt.py + train.py: ``--config configs/Scar.txt`` with
configargparse-style "key = value" files, plus the three modes: train
(reconstruction), --render_only 1 (render_test), --export_mesh 1.
Model selection via model_name: TensorVMSplit | TensorCP | NerfPlusPlus |
REFTensoRF (train.py:62-106, 108-360).
"""
from __future__ import annotations

import argparse
import ast
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.checkpoint import restore_checkpoint, save_checkpoint
from ..models import nerfpp, ref_tensorf, tensorf as tfm
from ..train import tensorf_trainer as tt
from ..utils.logging import MetricWriter, log
from ..utils.metrics import psnr


# every txt key this CLI consumes (reference flag surface, opt.py:4-156).
# Reference keys we deliberately don't map get a one-line warning instead of
# being silently dropped (e.g. dataset_name — blender only here; ndc_ray —
# blender scenes never set it; N_vis/vis_every — eval cadence is fixed).
_KNOWN_KEYS = frozenset((
    "L1_weight_inital", "L1_weight_rest", "N_voxel_final", "N_voxel_init",
    "Ortho_weight", "TV_weight_app", "TV_weight_density", "alpha_mask_thre",
    "basedir", "batch_size", "bbox", "bg_D", "bg_freq", "bg_samples",
    "bg_view_freq", "data_dim_color", "datadir", "density_shift",
    "distance_scale", "downsample_test", "downsample_train", "expname",
    "app_sample_budget", "density_batch_budget",
    "density_sample_budget", "factor_gather_bf16",
    "far", "fea2denseAct", "fea_pe", "featureC",
    "global_step", "grid_size",
    "has_opt_state", "lr_basis", "lr_decay_iters", "lr_decay_target_ratio",
    "lr_init", "lr_scale", "lr_upsample_reset", "model_name", "nSamples",
    "n_iters", "n_lamb_sh", "n_lamb_sigma", "near", "near_far",
    "normal_vector_penalty_weight", "pos_pe", "radii", "render_path_frames",
    "rm_weight_mask_thre", "shadingMode", "step_ratio", "synthetic",
    "synthetic_size", "synthetic_views", "update_AlphaMask_list",
    "upsamp_list", "view_pe", "white_bkgd"))


def parse_txt_config(path: str) -> dict:
    """configargparse 'key = value' files (tensorf-myc/configs/*.txt).

    Warns on keys the rebuild doesn't consume so a reference config never
    silently loses behavior (round-2 review item).
    """
    out = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            k, v = [s.strip() for s in line.split("=", 1)]
            try:
                out[k] = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                out[k] = v
            if k not in _KNOWN_KEYS:
                log.info(f"config key '{k}' is not consumed by this CLI "
                         "(ignored)")
    return out


def build_configs(a: dict):
    shading = a.get("shadingMode", "MLP_Fea")
    model_cfg = tfm.TensoRFConfig(
        decomp={"TensorCP": "cp", "TensorVM": "vm"}.get(
            a.get("model_name", "TensorVMSplit"), "vm_split"),
        density_n_comp=tuple(a.get("n_lamb_sigma", [16, 16, 16])),
        app_n_comp=tuple(a.get("n_lamb_sh", [48, 48, 48])),
        app_dim=a.get("data_dim_color", 27),
        shading_mode=shading,
        density_shift=a.get("density_shift", -10),
        alpha_mask_thres=a.get("alpha_mask_thre", 1e-3),
        distance_scale=a.get("distance_scale", 25),
        ray_march_weight_thres=a.get("rm_weight_mask_thre", 1e-4),
        pos_pe=a.get("pos_pe", 6), view_pe=a.get("view_pe", 6),
        fea_pe=a.get("fea_pe", 6), featureC=a.get("featureC", 128),
        step_ratio=a.get("step_ratio", 0.5),
        density_sample_budget=a.get("density_sample_budget", 256),
        density_batch_budget=a.get("density_batch_budget", 0),
        factor_gather_bf16=a.get("factor_gather_bf16", False),
        app_sample_budget=a.get("app_sample_budget", 96),
        fea2dense=a.get("fea2denseAct", "softplus"),
        near_far=tuple(a.get("near_far", [a.get("near", 2.0), a.get("far", 6.0)])))
    train_cfg = tt.TensoRFTrainConfig(
        n_iters=a.get("n_iters", 30000),
        batch_size=a.get("batch_size", 4096),
        lr_init=a.get("lr_init", 0.02), lr_basis=a.get("lr_basis", 1e-3),
        lr_decay_iters=a.get("lr_decay_iters", -1),
        lr_decay_target_ratio=a.get("lr_decay_target_ratio", 0.1),
        lr_upsample_reset=bool(a.get("lr_upsample_reset", 1)),
        ortho_weight=a.get("Ortho_weight", 0.0),
        l1_weight_initial=a.get("L1_weight_inital", 0.0),
        l1_weight_rest=a.get("L1_weight_rest", 0.0),
        tv_weight_density=a.get("TV_weight_density", 0.0),
        tv_weight_app=a.get("TV_weight_app", 0.0),
        n_voxel_init=a.get("N_voxel_init", 100**3),
        n_voxel_final=a.get("N_voxel_final", 300**3),
        upsamp_list=tuple(a.get("upsamp_list", [2000, 3000, 4000, 5500, 7000])),
        update_alphamask_list=tuple(a.get("update_AlphaMask_list", [2000, 4000])),
        n_samples_cap=a.get("nSamples", 1_000_000),
        white_bg=bool(a.get("white_bkgd", True)))
    return model_cfg, train_cfg


def build_family_trainer(a: dict, model_cfg, train_cfg, aabb, key=None):
    """Construct a TensoRFTrainer wired for ``a['model_name']``.

    The plain decompositions (TensorVMSplit/TensorVM/TensorCP) run the base
    forward; REFTensoRF swaps in the Ref-NeRF heads + normal-vector penalty
    (tensorf-myc/train.py:253-257, models/REFTensoRF.py:107-233) and
    NerfPlusPlus the inverted-sphere background (models/nerfplusplus.py:
    272-318). Shared by the CLI and scripts/tensorf_budget.py so a
    Scar/Scarf config can never silently train the base model.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    model_name = a.get("model_name", "TensorVMSplit")
    forward_fn = None
    extra_loss = None
    if model_name == "REFTensoRF":
        w = a.get("normal_vector_penalty_weight", 0.0)
        ref_apply = ref_tensorf.make_ref_mlp(model_cfg).apply

        def forward_fn(mc, g, params, bufs, r, key, white_bg):
            return ref_tensorf.ref_tensorf_forward(mc, g, params, bufs, r, key,
                                                   white_bg=white_bg,
                                                   mlp_apply=ref_apply)

        def extra_loss(params, out):
            return w * out.extras["penalty"]
    elif model_name == "NerfPlusPlus":
        pp = nerfpp.NerfPPConfig(bg_freq=a.get("bg_freq", 4),
                                 bg_view_freq=a.get("bg_view_freq", 2),
                                 bg_D=a.get("bg_D", 4),
                                 radii=a.get("radii", 20),
                                 bg_samples=a.get("bg_samples", 512))
        base_apply = tfm.make_render_mlp(model_cfg).apply
        bg_apply = nerfpp.make_bg_net(pp).apply

        def forward_fn(mc, g, params, bufs, r, key, white_bg):
            return nerfpp.nerfpp_forward(mc, pp, g, params, bufs, r, key,
                                         mlp_apply=base_apply,
                                         bg_apply=bg_apply)

    trainer = tt.TensoRFTrainer(model_cfg, train_cfg, aabb, key,
                                extra_loss_fn=extra_loss, forward_fn=forward_fn)
    if model_name == "REFTensoRF":
        trainer.params = ref_tensorf.init_ref_heads(jax.random.PRNGKey(1),
                                                    model_cfg, trainer.params)
        trainer._rebuild(lr_scale=1.0)
    elif model_name == "NerfPlusPlus":
        trainer.params["bg_net"] = nerfpp.init_nerfpp(jax.random.PRNGKey(2), pp)
        trainer._rebuild(lr_scale=1.0)
    return trainer


def load_rays(a: dict):
    if a.get("synthetic"):
        from ..data.synthetic import make_scene

        H = W = a.get("synthetic_size", 20)
        scene = make_scene(n_views=a.get("synthetic_views", 10), H=H, W=W)
        rays = tt.build_ray_store(scene.poses, scene.intr, H, W)
        rgbs = scene.images.reshape(-1, 3)
        aabb = _bbox(a, [[-1.2] * 3, [1.2] * 3])
        return rays, rgbs, aabb, (H, W)
    from ..data import blender

    scene = blender.load_blender_split(a["datadir"], "train",
                                       downsample=a.get("downsample_train", 1.0))
    rays, rgbs = blender.tensorf_ray_store(scene,
                                           bg=1.0 if a.get("white_bkgd", True) else 0.0)
    return rays, rgbs, _bbox(a, [[-1.5] * 3, [1.5] * 3]), (scene.H, scene.W)


def _bbox(a: dict, default) -> np.ndarray:
    """Reference configs use a flat 6-list bbox (configs/Scar.txt)."""
    b = np.asarray(a.get("bbox", default), np.float32)
    return b.reshape(2, 3)


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--render_only", type=int, default=0)
    parser.add_argument("--render_path", type=int, default=0)
    parser.add_argument("--export_mesh", type=int, default=0)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--resume", type=int, default=0,
                        help="resume training from --ckpt/default ckpt "
                             "(opt state + global_step restored)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--n_iters", type=int, default=0)
    args = parser.parse_args(argv)

    a = parse_txt_config(args.config)
    if args.synthetic:
        a["synthetic"] = True
    if args.n_iters:
        a["n_iters"] = args.n_iters
    model_cfg, train_cfg = build_configs(a)
    out_dir = os.path.join(a.get("basedir", "./log"), a.get("expname", "tensorf"))
    os.makedirs(out_dir, exist_ok=True)
    writer = MetricWriter(out_dir)

    rays, rgbs, aabb, train_hw = load_rays(a)
    model_name = a.get("model_name", "TensorVMSplit")

    # variant wiring: swap the model forward + extra loss (train.py:253-257)
    trainer = build_family_trainer(a, model_cfg, train_cfg, aabb,
                                   jax.random.PRNGKey(0))

    ckpt = args.ckpt or os.path.join(out_dir, f"{a.get('expname', 'tensorf')}.ckpt")

    if args.render_only:
        restore_tensorf_ckpt(ckpt, trainer)
        if a.get("synthetic"):
            from ..data.synthetic import make_scene

            H = W = a.get("synthetic_size", 20)
            scene = make_scene(n_views=a.get("synthetic_views", 10), H=H, W=W)
            psnrs, ssims = tt.evaluation(
                trainer, scene.poses, scene.intr, scene.images,
                os.path.join(out_dir, "imgs_test_all"), chunk=H * W)
            log.info(f"render_test: mean psnr {np.mean(psnrs):.2f} "
                     f"ssim {np.mean(ssims):.3f}")
        else:
            # render_test (tensorf-myc/train.py:62-106): render the TEST
            # split (zero-image JSONs supported) into imgs_test_all/ — this
            # is what the competition driver ships to result/.
            render_test_split(a, trainer, out_dir, fallback_hw=train_hw)
        if args.render_path:
            render_novel_path(a, trainer, out_dir, fallback_hw=train_hw)
        return out_dir
    if args.export_mesh:
        restore_tensorf_ckpt(ckpt, trainer)
        from ..evaluation.mesh import convert_density_samples_to_ply
        from ..models.tensorf import compute_alpha

        geom = trainer.geom

        def density_fn(pts):
            return compute_alpha(model_cfg, trainer.params, trainer.buffers,
                                 pts, geom.step_size)

        from ..evaluation.mesh import query_density_grid

        grid = query_density_grid(density_fn, 128,
                                  (float(aabb[0][0]), float(aabb[1][0])))
        convert_density_samples_to_ply(
            grid, os.path.join(out_dir, f"{a.get('expname', 'mesh')}.ply"),
            aabb, level=0.005)
        log.info("mesh exported")
        return out_dir

    n_total = train_cfg.n_iters
    if args.resume and os.path.exists(ckpt):
        restore_tensorf_ckpt(ckpt, trainer, for_training=True)
        log.info(f"resumed training @ step {trainer.global_step}")
    remaining = max(0, n_total - trainer.global_step)
    m = trainer.train(rays, rgbs, n_iters=remaining, log_every=500)
    save_tensorf_ckpt(ckpt, trainer, model_name)
    if m:
        writer.scalar("train/psnr", float(m["psnr"]), trainer.global_step)
        log.info(f"final psnr {float(m['psnr']):.2f} -> {ckpt}")
    return out_dir


def render_test_split(a: dict, trainer, out_dir: str, fallback_hw=None):
    """render_test on real data (tensorf-myc/train.py:62-106): render the
    test split's poses into imgs_test_all/, with PSNR only when GT exists.
    GT-less splits render at the train split's resolution (the reference's
    img_wh comes from the dataset constructor, dataLoader/blender.py:19-21)."""
    from ..data import blender
    from ..geom import conventions, rays as rays_lib

    scene = blender.load_blender_split(a["datadir"], "test",
                                       downsample=a.get("downsample_test", 1.0),
                                       require_images=False)
    if scene.images.shape[0] == 0 and fallback_hw is not None:
        H, W = fallback_hw
        scene = dataclasses_replace_scene(scene, H, W)
    else:
        H, W = scene.H, scene.W
    c2w_cv = np.asarray(conventions.blender2opencv(jnp.asarray(scene.c2w)))
    dirs = rays_lib.get_ray_directions(H, W, scene.focal)

    def ray_fn(i):
        o, d = rays_lib.get_rays_from_directions(dirs, jnp.asarray(c2w_cv[i, :3]))
        return jnp.concatenate([o, d], -1)

    images = (blender.blend_background(
        scene, bg=1.0 if a.get("white_bkgd", True) else 0.0)
        if scene.images.shape[0] else None)
    psnrs, ssims = tt.evaluation(
        trainer, jnp.asarray(scene.c2w), None, images,
        os.path.join(out_dir, "imgs_test_all"), H=H, W=W, ray_fn=ray_fn)
    if psnrs:
        log.info(f"render_test: mean psnr {np.mean(psnrs):.2f}")
    else:
        log.info(f"render_test: {scene.c2w.shape[0]} GT-less test views "
                 f"-> {out_dir}/imgs_test_all")


def dataclasses_replace_scene(scene, H: int, W: int):
    """Re-dimension a GT-less scene: focal rescales with W (focal =
    0.5*W/tan(camera_angle_x/2), dataLoader/blender.py:73)."""
    import dataclasses as _dc

    focal = 0.5 * W / np.tan(0.5 * scene.camera_angle_x)
    return _dc.replace(scene, H=H, W=W, focal=float(focal))


def render_novel_path(a: dict, trainer, out_dir: str, fallback_hw=None):
    """Novel-view orbit video (tensorf-myc/renderer.py:91-148).

    Blender scenes have no shipped render path; orbit like the jnerf demo
    (camera_path.py) at the train split's focal length.
    """
    from ..data import blender
    from ..geom import conventions
    from ..geom.camera_path import path_spherical

    scene = blender.load_blender_split(a["datadir"], "test",
                                       require_images=False)
    if scene.images.shape[0] == 0 and fallback_hw is not None:
        scene = dataclasses_replace_scene(scene, *fallback_hw)
    orbit = path_spherical(a.get("render_path_frames", 40),
                           radius=float(np.linalg.norm(scene.c2w[0][:3, 3])))
    c2ws = np.stack([np.concatenate([m, [[0, 0, 0, 1.0]]], 0) for m in orbit])
    c2ws_cv = np.asarray(conventions.blender2opencv(jnp.asarray(c2ws)))
    tt.evaluation_path(trainer, c2ws_cv, scene.H, scene.W, scene.focal,
                       os.path.join(out_dir, "imgs_path_all"))
    log.info(f"render_path -> {out_dir}/imgs_path_all/video.mp4")


def save_tensorf_ckpt(ckpt: str, trainer, model_name: str):
    """Checkpoint incl. model kwargs needed to rebuild the stage (grid size,
    aabb, alpha volume) — tensorf's get_kwargs scheme (tensorBase.py:253-272)
    — plus optimizer state + lr_scale + global_step so training resumes with
    schedule continuity (train.py:147-164,186-190,336-360)."""
    state = {"params": trainer.params,
             "alpha_volume": (trainer.buffers["alpha_volume"]
                              if trainer.buffers.get("alpha_volume") is not None
                              else jnp.zeros((0, 0, 0))),
             "alpha_aabb": trainer.buffers["alpha_aabb"],
             "aabb": trainer.buffers["aabb"],
             "opt_state": trainer.opt_state}
    save_checkpoint(ckpt, state, step=trainer.global_step,
                    meta={"model_name": model_name,
                          "grid_size": list(trainer.geom.grid_size),
                          "lr_scale": trainer.lr_scale,
                          "global_step": trainer.global_step,
                          "has_opt_state": True})


def restore_tensorf_ckpt(ckpt: str, trainer, for_training: bool = False):
    """Rebuild the trainer at the checkpoint's stage then restore weights.

    ``for_training=True`` additionally restores optimizer state, lr_scale and
    global_step (the reference resumes per-group lr + step so the decay
    schedule and stage boundaries continue, train.py:147-164,186-190)."""
    import json

    meta = json.load(open(ckpt + ".json"))
    gs = meta["grid_size"]
    trainer.params = tfm.upsample_volume_grid(trainer.model_cfg, trainer.params, gs)
    lr_scale = meta.get("lr_scale", 1.0)
    trainer._rebuild(lr_scale=lr_scale)  # shapes opt_state for the stage
    target = {"params": trainer.params,
              "alpha_volume": jnp.zeros((0, 0, 0)),
              "alpha_aabb": trainer.buffers["alpha_aabb"],
              "aabb": trainer.buffers["aabb"]}
    if meta.get("has_opt_state"):
        target["opt_state"] = trainer.opt_state
    try:
        state, _ = restore_checkpoint(ckpt, target)
    except ValueError:
        # checkpoint carries an alpha volume: retry with a shaped target
        reso = min(gs[0], 256)
        target["alpha_volume"] = jnp.zeros((reso,) * 3)
        state, _ = restore_checkpoint(ckpt, target)
    trainer.params = state["params"]
    trainer.buffers["aabb"] = state["aabb"]
    trainer.buffers["alpha_aabb"] = state["alpha_aabb"]
    if state["alpha_volume"].size:
        trainer.buffers["alpha_volume"] = state["alpha_volume"]
        trainer.buffers = tfm.prepare_alpha_buffers(trainer.buffers)
    trainer.geom = tfm.compute_stage_geom(
        trainer.model_cfg, np.asarray(state["aabb"]), gs,
        trainer.cfg.n_samples_cap)
    trainer._rebuild(lr_scale=lr_scale)
    if for_training:
        if "opt_state" in state:
            trainer.opt_state = state["opt_state"]
        trainer.global_step = int(meta.get("global_step", 0))
        # advance the voxel schedule past already-consumed upsample events
        n_done = sum(1 for s in trainer.cfg.upsamp_list
                     if s <= trainer.global_step)
        trainer.voxel_schedule = trainer.voxel_schedule[n_done:]
    return trainer


if __name__ == "__main__":
    main()
