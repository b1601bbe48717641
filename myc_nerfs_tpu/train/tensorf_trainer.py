"""Staged TensoRF training (progressive upsampling + alpha-mask events).

TPU-native re-implementation of tensorf-myc/train.py reconstruction():

- ray-level SGD over a precomputed ray store with permutation batching
  (SimpleSampler, train.py:25-37)
- loss = MSE + Ortho/L1/TV regularizers with the reference's weight schedule
  (train.py:228-257; TV weights themselves decay by lr_factor per step)
- per-iteration exponential LR decay, split into spatial (factor grids,
  lr_init 0.02) and network (basis/MLP, lr_basis 1e-3) groups
  (tensoRF.py:168-174, train.py:176-183,270-271)
- progressive voxel upsampling at upsamp_list with a log-space N_voxel
  schedule and optimizer re-creation (train.py:315-330) — here each
  (grid-resolution, AABB) stage is its own jitted program; params are
  functionally resized between stages
- alpha-mask update + AABB shrink + ray refiltering at update_AlphaMask_list
  (train.py:293-312)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import tensorf as tf
from ..utils.metrics import mse2psnr


@dataclasses.dataclass(frozen=True)
class TensoRFTrainConfig:
    """Parity with tensorf-myc opt.py flags (SURVEY.md §2 T1/T2)."""

    n_iters: int = 30000
    batch_size: int = 4096
    lr_init: float = 0.02
    lr_basis: float = 1e-3
    lr_decay_iters: int = -1
    lr_decay_target_ratio: float = 0.1
    lr_upsample_reset: bool = True
    ortho_weight: float = 0.0
    l1_weight_initial: float = 0.0
    l1_weight_rest: float = 0.0
    tv_weight_density: float = 0.0
    tv_weight_app: float = 0.0
    n_voxel_init: int = 100**3
    n_voxel_final: int = 300**3
    upsamp_list: Tuple[int, ...] = (2000, 3000, 4000, 5500, 7000)
    update_alphamask_list: Tuple[int, ...] = (2000, 4000)
    alpha_mask_reso_cap: int = 256
    n_samples_cap: int = 1_000_000
    white_bg: bool = True


def n_to_reso(n_voxels: int, aabb: np.ndarray) -> List[int]:
    """Voxel count -> per-axis resolution (tensorf-myc/utils.py:56-59)."""
    aabb = np.asarray(aabb, np.float64)
    size = aabb[1] - aabb[0]
    voxel_size = (size.prod() / n_voxels) ** (1.0 / 3)
    return [int(x) for x in (size / voxel_size)]


def n_voxel_schedule(cfg: TensoRFTrainConfig) -> List[int]:
    """Log-space N_voxel schedule (train.py:196-197)."""
    n = len(cfg.upsamp_list) + 1
    return [int(round(v)) for v in np.exp(np.linspace(
        np.log(cfg.n_voxel_init), np.log(cfg.n_voxel_final), n))][1:]


_NET_KEYS = ("basis_mat", "mlp", "bg_net", "normal_linear", "diffuse_linear",
             "specular_linear", "rho_linear")


def _label_params(params) -> Dict[str, Any]:
    """Factor grids at lr_init; MLP/basis/heads at lr_basis (tensoRF.py:
    168-174, REFTensoRF.py:100-108, nerfplusplus.py:173-176)."""
    return {k: ("net" if k in _NET_KEYS else "spatial") for k in params}


def make_optimizer(cfg: TensoRFTrainConfig, params, lr_scale: float = 1.0):
    lr_factor = cfg.lr_decay_target_ratio ** (
        1.0 / (cfg.lr_decay_iters if cfg.lr_decay_iters > 0 else cfg.n_iters))
    def sched(base):
        return optax.exponential_decay(base * lr_scale, 1, lr_factor)
    tx = optax.multi_transform(
        {"spatial": optax.adam(sched(cfg.lr_init), b1=0.9, b2=0.99),
         "net": optax.adam(sched(cfg.lr_basis), b1=0.9, b2=0.99)},
        _label_params(params))
    return tx, lr_factor


def make_train_step(model_cfg: tf.TensoRFConfig, cfg: TensoRFTrainConfig,
                    geom: tf.StageGeom, tx, buffers, lr_factor: float,
                    extra_loss_fn=None, forward_fn=None):
    """One jitted SGD step over a ray batch. ``buffers`` is closed over
    (constant within a stage). extra_loss_fn(params, out) -> scalar lets
    Ref-NeRF add its normal-orientation penalty (REFTensoRF.py:236-238);
    forward_fn swaps the model forward (Ref-NeRF / NeRF++ variants) with the
    same signature as tensorf_forward minus mlp_apply."""
    core = _make_step_core(model_cfg, cfg, geom, tx, buffers, lr_factor,
                           extra_loss_fn, forward_fn)
    return jax.jit(core)


def _make_step_core(model_cfg, cfg, geom, tx, buffers, lr_factor,
                    extra_loss_fn=None, forward_fn=None):
    mlp_apply = tf.make_render_mlp(model_cfg).apply

    def default_forward(mc, g, params, bufs, rays, key, white_bg):
        return tf.tensorf_forward(mc, g, params, bufs, rays, key,
                                  white_bg=white_bg, mlp_apply=mlp_apply)

    fwd = forward_fn or default_forward

    def loss_fn(params, rays, rgbs, key, step):
        out = fwd(model_cfg, geom, params, buffers, rays, key, cfg.white_bg)
        mse = jnp.mean((out.rgb_map - rgbs) ** 2)
        total = mse
        if cfg.ortho_weight > 0:
            total = total + cfg.ortho_weight * tf.vector_comp_diffs(params)
        l1_w = jnp.where(step < (cfg.update_alphamask_list[0]
                                 if cfg.update_alphamask_list else cfg.n_iters),
                         cfg.l1_weight_initial, cfg.l1_weight_rest)
        total = total + l1_w * tf.density_L1(model_cfg, params)
        decay = lr_factor ** (step.astype(jnp.float32) + 1.0)
        if cfg.tv_weight_density > 0:
            total = total + cfg.tv_weight_density * decay * \
                tf.tv_loss_density(model_cfg, params)
        if cfg.tv_weight_app > 0:
            total = total + cfg.tv_weight_app * decay * \
                tf.tv_loss_app(model_cfg, params)
        if extra_loss_fn is not None:
            total = total + extra_loss_fn(params, out)
        return total, mse

    def core(params, opt_state, rays, rgbs, key, step):
        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, rays, rgbs, key, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"mse": mse, "psnr": mse2psnr(mse)}

    return core


def make_train_block(model_cfg, cfg, geom, tx, buffers, lr_factor,
                     extra_loss_fn=None, forward_fn=None):
    """S steps per dispatch under lax.scan (amortizes this platform's ~30 ms
    per-call dispatch floor — the reference budgets run to 1M iterations).
    rays/rgbs are stacked [S, B, ...]; step0 is the absolute iteration of
    the first step so the per-step LR/TV decay schedule stays exact."""
    core = _make_step_core(model_cfg, cfg, geom, tx, buffers, lr_factor,
                           extra_loss_fn, forward_fn)

    @jax.jit
    def block_fn(params, opt_state, rays, rgbs, key, step0):
        S = rays.shape[0]
        keys = jax.random.split(key, S)
        steps = step0 + jnp.arange(S, dtype=jnp.int32)

        def one(carry, xs):
            params, opt_state = carry
            r, g, k, s = xs
            params, opt_state, m = core(params, opt_state, r, g, k, s)
            return (params, opt_state), m

        (params, opt_state), ms = jax.lax.scan(one, (params, opt_state),
                                               (rays, rgbs, keys, steps))
        last = jax.tree_util.tree_map(lambda x: x[-1], ms)
        return params, opt_state, last

    return block_fn


class PermutationSampler:
    """Random-permutation ray batches (SimpleSampler, train.py:25-37)."""

    def __init__(self, total: int, batch: int, seed: int = 0):
        self.total = total
        self.batch = batch
        self.curr = total
        self.ids = None
        self.rng = np.random.default_rng(seed)

    def nextids(self) -> np.ndarray:
        self.curr += self.batch
        if self.ids is None or self.curr + self.batch > self.total:
            self.ids = self.rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr:self.curr + self.batch]


class TensoRFTrainer:
    """Host-side stage orchestrator: owns params/buffers across jit stages."""

    def __init__(self, model_cfg: tf.TensoRFConfig, cfg: TensoRFTrainConfig,
                 aabb, key: jax.Array, extra_loss_fn=None, forward_fn=None):
        self.model_cfg = model_cfg
        self.cfg = cfg
        self.extra_loss_fn = extra_loss_fn
        self.forward_fn = forward_fn
        reso = n_to_reso(cfg.n_voxel_init, np.asarray(aabb))
        self.geom = tf.compute_stage_geom(model_cfg, np.asarray(aabb), reso,
                                          cfg.n_samples_cap)
        self.params, self.buffers = tf.init_tensorf(key, model_cfg, aabb, reso)
        self.voxel_schedule = n_voxel_schedule(cfg)
        self.global_step = 0
        self.lr_scale = 1.0
        self._rebuild(lr_scale=1.0)

    def _rebuild(self, lr_scale: float):
        self.lr_scale = lr_scale
        self.tx, self.lr_factor = make_optimizer(self.cfg, self.params, lr_scale)
        self.opt_state = self.tx.init(self.params)
        self.step_fn = make_train_step(self.model_cfg, self.cfg, self.geom,
                                       self.tx, self.buffers, self.lr_factor,
                                       self.extra_loss_fn, self.forward_fn)
        self.block_fn = make_train_block(self.model_cfg, self.cfg, self.geom,
                                         self.tx, self.buffers, self.lr_factor,
                                         self.extra_loss_fn, self.forward_fn)
        self._render_chunk = None  # stage changed: drop the cached renderer

    def train(self, all_rays: jnp.ndarray, all_rgbs: jnp.ndarray,
              n_iters: Optional[int] = None, key: Optional[jax.Array] = None,
              log_every: int = 0, steps_per_block: int = 16):
        """Training loop. Steps run in scanned blocks of up to
        ``steps_per_block`` per dispatch; blocks stop exactly at upsample /
        alpha-mask event boundaries so event semantics match the per-step
        reference loop (train.py:219-334)."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        sampler = PermutationSampler(all_rays.shape[0], cfg.batch_size)
        metrics = {}
        end = self.global_step + (n_iters or cfg.n_iters)
        events = sorted(set(list(cfg.update_alphamask_list)
                            + list(cfg.upsamp_list) + [end]))
        while self.global_step < end:
            it = self.global_step
            next_event = min(e for e in events if e > it)
            s = max(1, min(steps_per_block, next_event - it, end - it))
            key, k = jax.random.split(key)
            ids = np.stack([sampler.nextids() for _ in range(s)])
            self.params, self.opt_state, metrics = self.block_fn(
                self.params, self.opt_state, all_rays[jnp.asarray(ids)],
                all_rgbs[jnp.asarray(ids)], k, jnp.int32(it))
            self.global_step += s
            it = self.global_step - 1
            if log_every and (it // max(log_every, 1)) != \
                    ((it - s) // max(log_every, 1)):
                print(f"iter {it} psnr {float(metrics['psnr']):.2f}")

            if it + 1 in cfg.update_alphamask_list:
                reso_mask = [min(g, cfg.alpha_mask_reso_cap)
                             for g in self.geom.grid_size]
                self.buffers, new_aabb = tf.update_alpha_mask(
                    self.model_cfg, self.geom, self.params, self.buffers,
                    tuple(reso_mask))
                degenerate = (not np.all(np.isfinite(new_aabb))) or \
                    np.any(new_aabb[1] <= new_aabb[0])
                if degenerate:
                    # empty alpha mask (nothing above threshold yet): keep the
                    # current AABB and drop the useless mask
                    new_aabb = np.asarray(self.buffers["aabb"])
                    self.buffers["alpha_volume"] = None
                    self.buffers = tf.prepare_alpha_buffers(self.buffers)
                if it + 1 == cfg.update_alphamask_list[0] and not degenerate:
                    self.params, self.buffers, new_size = tf.shrink(
                        self.model_cfg, self.geom, self.params, self.buffers,
                        new_aabb)
                    self.geom = tf.compute_stage_geom(
                        self.model_cfg, np.asarray(self.buffers["aabb"]),
                        new_size, cfg.n_samples_cap)
                if len(cfg.update_alphamask_list) > 1 and \
                        it + 1 == cfg.update_alphamask_list[1]:
                    keep = np.asarray(tf.filter_rays_bbox(self.buffers["aabb"],
                                                          all_rays))
                    all_rays = all_rays[keep]
                    all_rgbs = all_rgbs[keep]
                    sampler = PermutationSampler(all_rays.shape[0], cfg.batch_size)
                self._rebuild(lr_scale=1.0)

            if it + 1 in cfg.upsamp_list:
                n_vox = self.voxel_schedule.pop(0)
                reso = n_to_reso(n_vox, np.asarray(self.buffers["aabb"]))
                self.params = tf.upsample_volume_grid(self.model_cfg,
                                                      self.params, reso)
                self.geom = tf.compute_stage_geom(
                    self.model_cfg, np.asarray(self.buffers["aabb"]), reso,
                    cfg.n_samples_cap)
                lr_scale = (1.0 if cfg.lr_upsample_reset else
                            cfg.lr_decay_target_ratio ** (it / cfg.n_iters))
                self._rebuild(lr_scale=lr_scale)
        return metrics

    def render_rays(self, rays: jnp.ndarray, chunk: int = 4096):
        """Chunked eval render (OctreeRender_trilinear_fast, renderer.py:12-27).

        The jitted chunk renderer is cached per stage (params/buffers passed
        as arguments) so repeated full-image renders don't recompile.
        """
        if self._render_chunk is None:
            mlp_apply = tf.make_render_mlp(self.model_cfg).apply
            fwd = self.forward_fn
            model_cfg, geom, white_bg = self.model_cfg, self.geom, self.cfg.white_bg

            @jax.jit
            def render_all(params, buffers, rays_3d):
                def one_chunk(r):
                    if fwd is not None:
                        out = fwd(model_cfg, geom, params, buffers, r, None,
                                  white_bg)
                    else:
                        out = tf.tensorf_forward(model_cfg, geom, params,
                                                 buffers, r, None,
                                                 white_bg=white_bg,
                                                 mlp_apply=mlp_apply)
                    return out.rgb_map, out.depth_map

                return jax.lax.map(one_chunk, rays_3d)

            self._render_chunk = render_all
        n = rays.shape[0]
        pad = (-n) % chunk
        rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
        rgbs, depths = self._render_chunk(
            self.params, self.buffers, rays_p.reshape(-1, chunk, rays.shape[-1]))
        return rgbs.reshape(-1, 3)[:n], depths.reshape(-1)[:n]


def evaluation(trainer: "TensoRFTrainer", poses: jnp.ndarray,
               intr: jnp.ndarray, images, out_dir: str,
               prefix: str = "", chunk: int = 4096,
               compute_extra_metrics: bool = True,
               H: Optional[int] = None, W: Optional[int] = None,
               ray_fn=None):
    """Full-image eval loop: PSNR (+SSIM), PNG + depth dumps, mean.txt.

    Ref: tensorf-myc/renderer.py:30-148 (evaluation()). ``images`` may be
    None or empty (test splits ship zero-image JSONs, dataLoader/
    blender.py:108-113) — then H/W are required and no metrics are written.
    ``ray_fn(i) -> [H*W, 6]`` overrides the default ray builder so callers
    can supply blender2opencv-convention rays matching their train rays.
    """
    import os

    import numpy as np
    from PIL import Image

    from ..utils.metrics import psnr as psnr_fn, ssim as ssim_fn

    os.makedirs(out_dir, exist_ok=True)
    have_gt = images is not None and len(images) > 0
    if have_gt:
        H, W = images.shape[1:3]
    assert H is not None and W is not None, "H/W required without GT images"
    psnrs, ssims = [], []
    n_views = poses.shape[0]
    for i in range(n_views):
        if ray_fn is not None:
            rays = ray_fn(i)
        else:
            rays = build_ray_store(poses[i:i + 1], intr[i:i + 1], H, W)
        rgb, depth = trainer.render_rays(rays, chunk=chunk)
        rgb = rgb.reshape(H, W, 3)
        if have_gt and i < len(images):
            psnrs.append(float(psnr_fn(rgb, images[i])))
            if compute_extra_metrics:
                ssims.append(float(ssim_fn(rgb, images[i])))
        Image.fromarray((np.asarray(jnp.clip(rgb, 0, 1)) * 255).astype(np.uint8)
                        ).save(os.path.join(out_dir, f"{prefix}{i:03d}.png"))
        from ..evaluation.visualization import visualize_depth

        dimg, _ = visualize_depth(np.asarray(depth).reshape(H, W))
        Image.fromarray((dimg * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{prefix}{i:03d}_depth.png"))
    if psnrs:
        with open(os.path.join(out_dir, "mean.txt"), "w") as f:
            f.write(f"psnr {float(np.mean(psnrs))}\n")
            if ssims:
                f.write(f"ssim {float(np.mean(ssims))}\n")
    return psnrs, ssims


def evaluation_path(trainer: "TensoRFTrainer", c2ws, H: int, W: int,
                    focal: float, out_dir: str, chunk: int = 4096,
                    fps: int = 30, ray_fn=None):
    """Novel-view video render along a camera path.

    Ref: tensorf-myc/renderer.py:91-148 (evaluation_path): renders each c2w,
    dumps PNG frames and an rgb+depth video (imageio mimwrite, fps 30).
    """
    import os

    import numpy as np
    from PIL import Image

    from ..evaluation.visualization import visualize_depth, write_video
    from ..geom import rays as rays_lib

    os.makedirs(out_dir, exist_ok=True)
    dirs = rays_lib.get_ray_directions(H, W, focal)
    frames = []
    for i, c2w in enumerate(c2ws):
        if ray_fn is not None:
            rays = ray_fn(i)
        else:
            o, d = rays_lib.get_rays_from_directions(dirs, jnp.asarray(c2w)[:3])
            rays = jnp.concatenate([o, d], -1)
        rgb, depth = trainer.render_rays(rays, chunk=chunk)
        rgb = np.asarray(jnp.clip(rgb, 0, 1)).reshape(H, W, 3)
        dimg, _ = visualize_depth(np.asarray(depth).reshape(H, W))
        frame = np.concatenate([rgb, dimg], axis=1)
        frames.append(frame)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{i:03d}.png"))
    write_video(os.path.join(out_dir, "video.mp4"), frames, fps=fps)
    return out_dir


def build_ray_store(poses: jnp.ndarray, intr: jnp.ndarray, H: int, W: int):
    """Precompute all (origin, normalised dir) rays for all images
    ([N*H*W, 6]) like tensorf's blender loader (dataLoader/blender.py:116-128)."""
    from ..geom import rays as rays_lib

    center, ray = rays_lib.get_center_and_ray(poses, intr, H, W)
    d = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    return jnp.concatenate([center, d], axis=-1).reshape(-1, 6)
