"""Jitted training for the MLP family: NeRF, BARF, GARF.

TPU-native re-implementation of the barf-myc training engine
(model/base.py:15-167, model/nerf.py:46-69, model/barf.py:59-88,
model/garf.py:72-94):

- per-iteration random-ray subsampling across all training images
  (nerf.py:219: same ray indices in every image)
- two optimizers (main MLP + per-image SE(3) pose corrections) with
  exponential LR decay and optional pose-LR warmup
- BARF coarse-to-fine PE annealing driven by progress = step/max_iter
- GARF delayed pose correction (start_pose_correct_iter) — implemented as a
  lax-friendly where() on the step counter, not Python control flow

Parallelism: the ray batch is the data axis; `make_train_step` takes an
optional mesh and shards rays via shard_map-free jit-with-shardings (see
parallel/mesh.py). Loss/grads reduce with psum semantics automatically under
pjit. The reference is single-GPU (options.py:102); multi-chip is new here.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..geom import lie
from ..geom import pose as pose_lib
from ..geom import rays as rays_lib
from ..models.nerf_mlp import NeRFMLP, garf_mlp
from ..render.mlp_renderer import render_image_mlp, render_rays_mlp
from ..utils.metrics import img2mse, mse2psnr


@dataclasses.dataclass(frozen=True)
class NeRFTrainConfig:
    """Config parity with barf-myc options/*.yaml (see SURVEY.md §2 B1)."""

    model: str = "nerf"                    # nerf | barf | garf
    # arch (options nerf_blender.yaml arch.*)
    widths_feat: Tuple[int, ...] = (256,) * 8
    widths_rgb: Tuple[int, ...] = (128, 3)
    skip: Tuple[int, ...] = (4,)
    posenc_L3D: Optional[int] = 10
    posenc_Lview: Optional[int] = 4
    density_activ: str = "softplus"
    # nerf.*
    view_dep: bool = True
    depth_range: Tuple[float, float] = (2.0, 6.0)
    sample_intvs: int = 128
    sample_stratified: bool = True
    fine_sampling: bool = False
    sample_intvs_fine: int = 0
    rand_rays: int = 2048
    density_noise_reg: float = 0.0
    setbg_opaque: bool = False
    bgcolor: float = 1.0
    # barf/garf
    refine_pose: bool = False
    c2f: Optional[Tuple[float, float]] = None       # barf_blender: [0.1, 0.5]
    camera_noise: float = 0.0                        # synthetic pose perturbation (BARF exp)
    start_pose_correct_iter: int = 0                 # garf (Easyship.yaml: 80000)
    # optim.*
    lr: float = 5e-4
    lr_end: float = 1e-4
    lr_pose: float = 3e-3
    lr_pose_end: float = 1e-5
    warmup_pose: int = 0
    max_iter: int = 200000
    # bf16 matmuls in the field MLP (params f32, gaussian/act heads f32) —
    # round-3 GARF throughput lever, quality-gated by scripts/garf_bf16.py
    use_bf16: bool = False
    # re-tile the [n_images, rays_per_image] batch to a non-pow2 internal
    # shape before sampling (render_rays_mlp): 2x step rate on TPU
    # (probe_r4_garf_views layout cliff). Image-axis DP sets False — the
    # tile reshape would cross the "data" shard boundary
    mlp_tile: bool = True


class NeRFTrainState(NamedTuple):
    params: Any
    se3_refine: jnp.ndarray          # [n_images, 6] pose corrections
    opt_state: Any
    opt_state_pose: Any
    pose_noise: jnp.ndarray          # [n_images, 6] fixed synthetic noise (BARF exp)
    step: jnp.ndarray


def build_model(cfg: NeRFTrainConfig) -> NeRFMLP:
    if cfg.model == "garf":
        return garf_mlp(widths_feat=cfg.widths_feat, widths_rgb=cfg.widths_rgb,
                        skip=cfg.skip, view_dep=cfg.view_dep,
                        use_bf16=cfg.use_bf16)
    return NeRFMLP(
        widths_feat=cfg.widths_feat, widths_rgb=cfg.widths_rgb, skip=cfg.skip,
        posenc_L3D=cfg.posenc_L3D, posenc_Lview=cfg.posenc_Lview,
        view_dep=cfg.view_dep, density_activ=cfg.density_activ,
        use_bf16=cfg.use_bf16)


def _exp_schedule(lr: float, lr_end: float, max_iter: int):
    gamma = (lr_end / lr) ** (1.0 / max_iter)
    return optax.exponential_decay(lr, transition_steps=1, decay_rate=gamma)


def make_optimizers(cfg: NeRFTrainConfig):
    """Main AdamW-style Adam + pose Adam with warmup, exp-decayed.

    Ref: nerf.py:31-44, barf.py:59-70 (AdamW in reference; weight decay is 0
    by default there, so plain adam matches).
    """
    tx = optax.adam(_exp_schedule(cfg.lr, cfg.lr_end, cfg.max_iter))
    sched_pose = _exp_schedule(cfg.lr_pose, cfg.lr_pose_end, cfg.max_iter)
    if cfg.warmup_pose:
        warm = optax.linear_schedule(0.0, 1.0, cfg.warmup_pose)
        base = sched_pose
        sched_pose = lambda step: base(step) * warm(step)  # noqa: E731
    tx_pose = optax.adam(sched_pose)
    return tx, tx_pose


def compose_refined_pose(cfg: NeRFTrainConfig, state: NeRFTrainState,
                         poses_gt: jnp.ndarray) -> jnp.ndarray:
    """pose = se3_to_SE3(refine) o (noise o pose_gt); gated by start iter.

    Ref: barf.py Graph.get_pose / garf.py:318-346.
    """
    poses = poses_gt
    if cfg.camera_noise:
        poses = pose_lib.compose_pair(lie.se3_to_SE3(state.pose_noise), poses)
    if not cfg.refine_pose:
        return poses
    correction = lie.se3_to_SE3(state.se3_refine)
    refined = pose_lib.compose_pair(correction, poses)
    active = state.step >= cfg.start_pose_correct_iter
    return jnp.where(active, refined, poses)


def init_state(cfg: NeRFTrainConfig, key: jax.Array, n_images: int) -> Tuple[NeRFMLP, NeRFTrainState]:
    model = build_model(cfg)
    k_param, k_noise, k_fine = jax.random.split(key, 3)
    pts = jnp.zeros((1, 1, cfg.sample_intvs, 3))
    dirs = jnp.zeros_like(pts) if cfg.view_dep else None
    params = model.init(k_param, pts, dirs)
    if cfg.fine_sampling:
        # hierarchical fine NeRF: a second network of the same arch
        # (define_network fine branch, nerf.py:203-209)
        params = {"coarse": params, "fine": model.init(k_fine, pts, dirs)}
    se3_refine = jnp.zeros((n_images, 6))
    pose_noise = (cfg.camera_noise * jax.random.normal(k_noise, (n_images, 6))
                  if cfg.camera_noise else jnp.zeros((n_images, 6)))
    tx, tx_pose = make_optimizers(cfg)
    return model, NeRFTrainState(
        params=params,
        se3_refine=se3_refine,
        opt_state=tx.init(params),
        opt_state_pose=tx_pose.init(se3_refine),
        pose_noise=pose_noise,
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: NeRFTrainConfig, model: NeRFMLP,
                    images: jnp.ndarray, poses_gt: jnp.ndarray,
                    intr: jnp.ndarray):
    """Build the jitted train step closed over the (device-resident) dataset.

    images [B, H, W, 3], poses_gt [B, 3, 4], intr [B, 3, 3].
    Returns step(state, key) -> (state, metrics dict).
    """
    return jax.jit(_make_step_raw(cfg, model, images, poses_gt, intr))


def make_train_block(cfg: NeRFTrainConfig, model: NeRFMLP,
                     images: jnp.ndarray, poses_gt: jnp.ndarray,
                     intr: jnp.ndarray, steps_per_block: int = 16):
    """steps_per_block train steps per dispatch under lax.scan — the data
    is device-resident and the step is key-driven, so blocks amortize the
    platform's ~30 ms dispatch floor with no semantic change (state.step in
    the carry keeps the c2f/pose-warmup schedules exact)."""
    raw = _make_step_raw(cfg, model, images, poses_gt, intr)

    @jax.jit
    def block(state, key):
        keys = jax.random.split(key, steps_per_block)

        def one(st, k):
            st, m = raw(st, k)
            return st, m

        state, ms = jax.lax.scan(one, state, keys)
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    return block


def _make_step_raw(cfg: NeRFTrainConfig, model: NeRFMLP,
                   images: jnp.ndarray, poses_gt: jnp.ndarray,
                   intr: jnp.ndarray):
    B, H, W, _ = images.shape
    rays_per_image = max(cfg.rand_rays // B, 1)
    tx, tx_pose = make_optimizers(cfg)
    pixels = images.reshape(B, H * W, 3)
    grid = rays_lib.pixel_grid(H, W)
    bg = jnp.full((3,), cfg.bgcolor) if cfg.setbg_opaque else None

    def loss_fn(params, se3_refine, state, key):
        k_idx, k_depth, k_noise = jax.random.split(key, 3)
        ray_idx = jax.random.randint(k_idx, (rays_per_image,), 0, H * W)
        state = state._replace(se3_refine=se3_refine)
        poses = compose_refined_pose(cfg, state, poses_gt)
        progress = state.step.astype(jnp.float32) / cfg.max_iter

        center, ray = rays_lib.get_center_and_ray(poses, intr, H, W,
                                                  xy_grid=grid[ray_idx])

        def make_apply(p):
            def apply_fn(points, ray_unit):
                return model.apply(p, points, ray_unit, progress=progress,
                                   c2f=cfg.c2f,
                                   density_noise=cfg.density_noise_reg,
                                   noise_key=(k_noise if cfg.density_noise_reg
                                              else None))
            return apply_fn

        target = pixels[:, ray_idx]
        if cfg.fine_sampling:
            # coarse loss + fine loss (loss_weight.render_fine, nerf.py:228-240)
            out_c = render_rays_mlp(make_apply(params["coarse"]), center, ray,
                                    k_depth, cfg.sample_intvs, cfg.depth_range,
                                    stratified=cfg.sample_stratified,
                                    bg_color=bg, view_dep=cfg.view_dep,
                                    tile=cfg.mlp_tile)
            out_f = render_rays_mlp(make_apply(params["coarse"]), center, ray,
                                    k_depth, cfg.sample_intvs, cfg.depth_range,
                                    stratified=cfg.sample_stratified,
                                    bg_color=bg, view_dep=cfg.view_dep,
                                    fine_apply_fn=make_apply(params["fine"]),
                                    n_samples_fine=cfg.sample_intvs_fine,
                                    tile=cfg.mlp_tile)
            loss = img2mse(out_c.rgb, target) + img2mse(out_f.rgb, target)
            return loss, mse2psnr(img2mse(out_f.rgb, target))
        out = render_rays_mlp(make_apply(params), center, ray, k_depth,
                              cfg.sample_intvs, cfg.depth_range,
                              stratified=cfg.sample_stratified, bg_color=bg,
                              view_dep=cfg.view_dep, tile=cfg.mlp_tile)
        loss = img2mse(out.rgb, target)
        return loss, mse2psnr(loss)

    def step(state: NeRFTrainState, key: jax.Array):
        (loss, psnr_val), grads = jax.value_and_grad(loss_fn, argnums=(0, 1),
                                                     has_aux=True)(
            state.params, state.se3_refine, state, key)
        g_params, g_pose = grads
        updates, opt_state = tx.update(g_params, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if cfg.refine_pose:
            up_pose, opt_state_pose = tx_pose.update(g_pose, state.opt_state_pose,
                                                     state.se3_refine)
            se3_refine = optax.apply_updates(state.se3_refine, up_pose)
        else:
            se3_refine, opt_state_pose = state.se3_refine, state.opt_state_pose
        new_state = NeRFTrainState(
            params=params, se3_refine=se3_refine, opt_state=opt_state,
            opt_state_pose=opt_state_pose, pose_noise=state.pose_noise,
            step=state.step + 1)
        return new_state, {"loss": loss, "psnr": psnr_val}

    return step


def render_validation(cfg: NeRFTrainConfig, model: NeRFMLP, params,
                      pose: jnp.ndarray, intr: jnp.ndarray, H: int, W: int,
                      chunk: int = 2048):
    """Full-image deterministic render (validate(), base.py:131-148).

    With fine sampling the eval path runs the SAME coarse -> PDF -> fine
    graph as training (render_by_slices goes through the full graph,
    nerf.py:273-284, 396-403) — not the fine net on uniform samples.
    """
    bg = jnp.full((3,), cfg.bgcolor) if cfg.setbg_opaque else None
    fine_apply = None
    n_fine = 0
    if cfg.fine_sampling and isinstance(params, dict) and "fine" in params:
        params_fine = params["fine"]
        params = params["coarse"]

        def fine_apply(points, ray_unit):
            return model.apply(params_fine, points, ray_unit,
                               progress=jnp.float32(1.0), c2f=cfg.c2f)

        n_fine = cfg.sample_intvs_fine

    def apply_fn(points, ray_unit):
        return model.apply(params, points, ray_unit, progress=jnp.float32(1.0),
                           c2f=cfg.c2f)

    return render_image_mlp(apply_fn, pose, intr, H, W, cfg.sample_intvs,
                            cfg.depth_range, bg_color=bg, view_dep=cfg.view_dep,
                            chunk=chunk, fine_apply_fn=fine_apply,
                            n_samples_fine=n_fine)
