"""NeRF++ inverted-sphere background on top of TensorVMSplit.

TPU-native re-implementation of tensorf-myc/models/nerfplusplus.py:
- ``Embedder`` PE (include_input + per-freq sin/cos, :7-56)
- ``MLPNet`` background MLP with skip + base_remap + |sigma| (:66-140)
- sphere intersection (:178-194), inverted-sphere 4D parametrisation
  (x', y', z', 1/r) via Rodrigues rotation (:207-237)
- foreground sampled from near to the sphere-exit depth (:239-269)
- fg/bg compositing weighted by leftover transmittance bg_lambda with the
  reference's >0.1 gate (:272-318)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..render.composite import raw2alpha
from ..ops.compaction import compact_first_k
from . import tensorf as tf

HUGE = 1e10
TINY = 1e-6


def nerfpp_embed(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """[input, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)].

    Ref: Embedder (nerfplusplus.py:7-56), log-sampled, include_input.
    """
    out = [x]
    for i in range(n_freqs):
        f = 2.0 ** i
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)


class BgMLPNet(nn.Module):
    """Background MLP (MLPNet, nerfplusplus.py:66-140)."""

    D: int = 4
    W: int = 128
    skips: Tuple[int, ...] = (2,)

    @nn.compact
    def __call__(self, pts_embed: jnp.ndarray, view_embed: jnp.ndarray):
        base = nn.relu(nn.Dense(self.W)(pts_embed))
        for i in range(self.D - 1):
            if i in self.skips:
                base = jnp.concatenate([pts_embed, base], axis=-1)
            base = nn.relu(nn.Dense(self.W)(base))
        sigma = jnp.abs(nn.Dense(1)(base))[..., 0]
        base_remap = nn.Dense(256)(base)
        h = jnp.concatenate([base_remap, view_embed], axis=-1)
        h = nn.relu(nn.Dense(self.W // 2)(h))
        rgb = jax.nn.sigmoid(nn.Dense(3)(h))
        return rgb, sigma


@dataclasses.dataclass(frozen=True)
class NerfPPConfig:
    """set_nerfplusplus args (nerfplusplus.py:147-163); Scarf uses radii=28."""

    bg_freq: int = 4
    bg_view_freq: int = 2
    bg_D: int = 4
    radii: float = 20.0
    bg_samples: int = 512


def make_bg_net(cfg: NerfPPConfig) -> BgMLPNet:
    return BgMLPNet(D=cfg.bg_D, W=128, skips=(cfg.bg_D // 2,))


def init_nerfpp(key: jax.Array, cfg: NerfPPConfig):
    net = make_bg_net(cfg)
    pts_dim = 4 * (1 + 2 * cfg.bg_freq)
    view_dim = 3 * (1 + 2 * cfg.bg_view_freq)
    return net.init(key, jnp.zeros((1, pts_dim)), jnp.zeros((1, view_dim)))


def intersect_sphere(ray_o: jnp.ndarray, ray_d: jnp.ndarray, radii_sq) -> jnp.ndarray:
    """Depth of the exit intersection with the sphere of squared radius
    ``radii_sq``. Ref: nerfplusplus.py:178-194."""
    d1 = -jnp.sum(ray_d * ray_o, -1) / jnp.sum(ray_d * ray_d, -1)
    p = ray_o + d1[..., None] * ray_d
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    p_norm_sq = jnp.sum(p * p, -1)
    d2 = jnp.sqrt(jnp.maximum(radii_sq - p_norm_sq, 0.0)) * ray_d_cos
    return d1 + d2


def perturb_samples(key: Optional[jax.Array], z_vals: jnp.ndarray) -> jnp.ndarray:
    """Jitter inside per-sample intervals (nerfplusplus.py:196-205)."""
    if key is None:
        return z_vals
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
    lower = jnp.concatenate([z_vals[..., :1], mids], -1)
    t = jax.random.uniform(key, z_vals.shape)
    return lower + (upper - lower) * t


def depth2pts_outside(ray_o: jnp.ndarray, ray_d: jnp.ndarray,
                      depth: jnp.ndarray, radii: float):
    """Inverted-sphere 4D points (x', y', z', 1/r). Ref: :207-237."""
    d1 = -jnp.sum(ray_d * ray_o, -1) / jnp.sum(ray_d * ray_d, -1)
    p_mid = ray_o + d1[..., None] * ray_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)
    ray_d_cos = 1.0 / jnp.linalg.norm(ray_d, axis=-1)
    d2 = jnp.sqrt(jnp.maximum(radii * radii - p_mid_norm**2, 0.0)) * ray_d_cos
    p_sphere = ray_o + (d1 + d2)[..., None] * ray_d

    rot_axis = jnp.cross(ray_o, p_sphere)
    rot_axis = rot_axis / (jnp.linalg.norm(rot_axis, axis=-1, keepdims=True) + TINY)
    phi = jnp.arcsin(jnp.clip(p_mid_norm / radii, -1, 1))
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth / (radii * radii), -1, 1))
    rot_angle = (phi - theta)[..., None]

    p_new = p_sphere * jnp.cos(rot_angle) + \
        jnp.cross(rot_axis, p_sphere) * jnp.sin(rot_angle) + \
        rot_axis * jnp.sum(rot_axis * p_sphere, -1, keepdims=True) * (1.0 - jnp.cos(rot_angle))
    pts = jnp.concatenate([p_new, depth[..., None]], -1)
    depth_real = radii / (depth + TINY) * jnp.cos(theta) * ray_d_cos + d1
    return pts, depth_real


def nerfpp_forward(model_cfg: tf.TensoRFConfig, pp_cfg: NerfPPConfig,
                   geom: tf.StageGeom, params, buffers, rays: jnp.ndarray,
                   key: Optional[jax.Array] = None,
                   n_samples: Optional[int] = None, mlp_apply=None,
                   bg_apply=None):
    """Foreground TensoRF + inverted-sphere background (execute, :272-318).

    params must contain a "bg_net" entry (init_nerfpp).
    """
    n_s = n_samples or geom.n_samples
    ray_o, ray_d = rays[:, :3], rays[:, 3:6]
    k_fg, k_bg = (jax.random.split(key) if key is not None else (None, None))

    # --- foreground: sample from near to sphere exit (sample_ray, :239-269)
    fg_far = intersect_sphere(ray_o, ray_d, pp_cfg.radii * pp_cfg.radii)
    near = model_cfg.near_far[0]
    step = (fg_far - near) / (n_s - 1)
    fg_depth = near + step[..., None] * jnp.arange(n_s, dtype=jnp.float32)[None]
    fg_depth = perturb_samples(k_fg, fg_depth)
    pts = ray_o[:, None, :] + ray_d[:, None, :] * fg_depth[..., None]
    aabb = buffers["aabb"]
    valid = jnp.logical_not(jnp.logical_or(aabb[0] > pts, pts > aabb[1]).any(-1))
    dists = jnp.concatenate([fg_depth[:, 1:] - fg_depth[:, :-1],
                             jnp.zeros_like(fg_depth[:, :1])], -1)
    occ = tf.alpha_mask_valid(buffers, pts)
    if occ is not None:
        valid = jnp.logical_and(valid, occ)

    xyz = tf.normalize_coord(aabb, pts)
    valid, xyz, fg_depth, dists = tf.compact_density_samples(
        model_cfg, buffers, valid, xyz, fg_depth, dists)
    sigma = jnp.where(valid, tf.feature2density(
        model_cfg, tf.compute_density_feature(model_cfg, params, xyz)), 0.0)
    alpha, weight, _ = raw2alpha(sigma, dists * model_cfg.distance_scale)
    app_mask = weight > model_cfg.ray_march_weight_thres
    K = model_cfg.app_sample_budget
    apply = mlp_apply or tf.make_render_mlp(model_cfg).apply
    if K and K < xyz.shape[1] and buffers.get("alpha_volume") is not None:
        # static app_mask compaction (see tensorf_forward; gated on the
        # alpha mask existing): fg appearance runs on at most K
        # weight>thresh survivors per ray
        idx, valid_app = compact_first_k(app_mask, K)
        xyz_s = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        w_s = jnp.where(valid_app,
                        jnp.take_along_axis(weight, idx, axis=1), 0.0)
        dirs_s = jnp.broadcast_to(ray_d[:, None, :], xyz_s.shape)
        app_feat = tf.compute_app_feature(model_cfg, params, xyz_s)
        rgb_s = jnp.where(valid_app[..., None],
                          apply(params["mlp"], xyz_s, dirs_s, app_feat), 0.0)
        fg_rgb_map = (w_s[..., None] * rgb_s).sum(-2)
    else:
        dirs = jnp.broadcast_to(ray_d[:, None, :], xyz.shape)
        app_feat = tf.compute_app_feature(model_cfg, params, xyz)
        rgb_s = jnp.where(app_mask[..., None],
                          apply(params["mlp"], xyz, dirs, app_feat), 0.0)
        fg_rgb_map = (weight[..., None] * rgb_s).sum(-2)
    acc = weight.sum(-1)
    depth_map = (weight * fg_depth).sum(-1)

    # --- background lambda from fg alphas (:279-281)
    T = jnp.cumprod(1.0 - alpha + TINY, axis=-1)
    bg_lambda = T[..., -1]

    # --- background march over inverse depth (:283-311)
    N_bg = pp_cfg.bg_samples
    viewdirs = ray_d / jnp.linalg.norm(ray_d, axis=-1, keepdims=True)
    bg_z = jnp.broadcast_to(jnp.linspace(0.0, pp_cfg.radii, N_bg),
                            ray_d.shape[:-1] + (N_bg,))
    bg_z = perturb_samples(k_bg, bg_z)
    bro = jnp.broadcast_to(ray_o[:, None, :], ray_o.shape[:-1] + (N_bg, 3))
    brd = jnp.broadcast_to(ray_d[:, None, :], ray_d.shape[:-1] + (N_bg, 3))
    bvd = jnp.broadcast_to(viewdirs[:, None, :], viewdirs.shape[:-1] + (N_bg, 3))
    bg_pts, _ = depth2pts_outside(bro, brd, bg_z, pp_cfg.radii)
    pts_embed = nerfpp_embed(bg_pts, pp_cfg.bg_freq)
    view_embed = nerfpp_embed(bvd, pp_cfg.bg_view_freq)
    # flip: near_depth param == physical far (:296-300)
    pts_embed = jnp.flip(pts_embed, axis=-2)
    view_embed_f = jnp.flip(view_embed, axis=-2)
    bg_z_f = jnp.flip(bg_z, axis=-1)
    bg_dists = jnp.concatenate([bg_z_f[..., :-1] - bg_z_f[..., 1:],
                                HUGE * jnp.ones_like(bg_z_f[..., :1])], -1)
    bapply = bg_apply or make_bg_net(pp_cfg).apply
    bg_rgb, bg_sigma = bapply(params["bg_net"], pts_embed, view_embed_f)
    bg_alpha = 1.0 - jnp.exp(-bg_sigma * bg_dists)
    Tb = jnp.cumprod(1.0 - bg_alpha + TINY, axis=-1)[..., :-1]
    Tb = jnp.concatenate([jnp.ones_like(Tb[..., :1]), Tb], -1)
    bg_weights = bg_alpha * Tb
    bg_rgb_map = (bg_weights[..., None] * bg_rgb).sum(-2)
    bg_depth_map = (bg_weights * bg_z_f).sum(-1)

    # --- compose with the >0.1 gate (:313-318)
    bg_lambda = jnp.where(bg_lambda > 0.1, bg_lambda, 0.0)
    rgb_map = fg_rgb_map + bg_lambda[..., None] * bg_rgb_map
    depth_map = depth_map + bg_lambda * bg_depth_map
    return tf.TensoRFOut(rgb_map=rgb_map, depth_map=depth_map, weight=weight,
                         sigma=sigma, bg_weight=bg_lambda[..., None],
                         z_vals=fg_depth,
                         extras={"app_mask": app_mask, "valid": valid,
                                 "bg_rgb_map": bg_rgb_map})
