"""Ref-NeRF-style reflective shading on TensorVMSplit (REFTensoRF).

TPU-native re-implementation of tensorf-myc/models/REFTensoRF.py:
- appearance head additionally predicts normal, diffuse rgb, specular tint
  and roughness rho from the shared factor features (:85-96, :107-133)
- render: reflect the view dir about the predicted normal, feed reflection
  (+IDE-attenuated SH bases in the SH variant, MLPRender_SH_Ref :31-60) and
  the dot product to the specular MLP; rgb = tint * clamp(rgb_s) + rgb_d
  (:213-233)
- normal-orientation penalty sum(w * relu(-n.d)^2) returned in extras for the
  trainer to weight (:236-238, train.py:253-257)
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compaction import compact_first_k
from ..ops.sh import eval_sh_bases
from ..render.composite import raw2alpha
from . import tensorf as tf


class RefMLPRender(nn.Module):
    """MLPRender_Fea_Ref / MLPRender_SH_Ref (REFTensoRF.py:5-60)."""

    mode: str = "Fea"       # "Fea" | "SH"
    view_pe: int = 6
    fea_pe: int = 6
    featureC: int = 128

    @nn.compact
    def __call__(self, pts, viewdirs, features, dot_product, k):
        indata = [dot_product, features, viewdirs]
        if self.fea_pe > 0:
            indata.append(tf._tensorf_pe(features, self.fea_pe))
        if self.mode == "SH":
            for l_base in range(1, self.view_pe + 1):
                l = l_base**2
                a = jnp.exp(-(l * (l + 1)) / (2.0 * k))
                indata.append(a * eval_sh_bases(l_base - 1, viewdirs))
        elif self.view_pe > 0:
            indata.append(tf._tensorf_pe(viewdirs, self.view_pe))
        x = jnp.concatenate(indata, axis=-1)
        x = nn.relu(nn.Dense(self.featureC)(x))
        x = nn.relu(nn.Dense(self.featureC)(x))
        x = nn.Dense(3, bias_init=nn.initializers.zeros)(x)
        return jax.nn.sigmoid(x)


def make_ref_mlp(cfg: tf.TensoRFConfig) -> RefMLPRender:
    mode = "SH" if cfg.shading_mode == "SH" else "Fea"
    return RefMLPRender(mode=mode, view_pe=cfg.view_pe, fea_pe=cfg.fea_pe,
                        featureC=cfg.featureC)


def init_ref_heads(key: jax.Array, cfg: tf.TensoRFConfig, params):
    """Add normal/diffuse/specular/rho linear heads (REFTensoRF.py:85-96)
    and replace the shading MLP with the Ref variant."""
    n_in = sum(cfg.app_n_comp)
    ks = jax.random.split(key, 6)

    def linear(k, n_out):
        bound = 1.0 / np.sqrt(n_in)
        k1, k2 = jax.random.split(k)
        return {"w": jax.random.uniform(k1, (n_in, n_out), minval=-bound, maxval=bound),
                "b": jax.random.uniform(k2, (n_out,), minval=-bound, maxval=bound)}

    params = dict(params)
    params["normal_linear"] = linear(ks[0], 3)
    params["diffuse_linear"] = linear(ks[1], 3)
    params["specular_linear"] = linear(ks[2], 1)
    params["rho_linear"] = linear(ks[3], 1)
    mlp = make_ref_mlp(cfg)
    params["mlp"] = mlp.init(ks[4], jnp.zeros((1, 3)), jnp.zeros((1, 3)),
                             jnp.zeros((1, cfg.app_dim)), jnp.zeros((1, 1)),
                             jnp.ones((1, 1)))
    return params


def compute_ref_appfeature(cfg: tf.TensoRFConfig, params, xyz: jnp.ndarray):
    """(app_features, rgb_d, tint, normal, rho) from shared factor features.

    Ref: REFTensoRF.py:107-133.
    """
    feats = []
    for i in range(3):
        m0, m1 = tf.MAT_MODE[i]
        plane_feat = tf.grid_sample_2d(params["app_plane"][i],
                                       jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
        line_feat = tf._line_sample(params["app_line"][i], xyz[..., tf.VEC_MODE[i]])
        feats.append(plane_feat * line_feat)
    h = jnp.concatenate(feats, axis=-1)
    app = h @ params["basis_mat"]
    normal = h @ params["normal_linear"]["w"] + params["normal_linear"]["b"]
    rgb_d = h @ params["diffuse_linear"]["w"] + params["diffuse_linear"]["b"]
    tint = nn.relu(h @ params["specular_linear"]["w"] + params["specular_linear"]["b"])
    rho = nn.relu(h @ params["rho_linear"]["w"] + params["rho_linear"]["b"])
    return app, rgb_d, tint, normal, rho


def ref_tensorf_forward(cfg: tf.TensoRFConfig, geom: tf.StageGeom, params,
                        buffers, rays: jnp.ndarray,
                        key: Optional[jax.Array] = None, white_bg: bool = True,
                        n_samples: Optional[int] = None, mlp_apply=None
                        ) -> tf.TensoRFOut:
    """REFTensoRF.execute (:174-256): reflective shading + normal penalty."""
    n_s = n_samples or geom.n_samples
    rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
    pts, z_vals, valid = tf.sample_ray(buffers["aabb"], rays_o, viewdirs,
                                       geom.step_size, n_s, cfg.near_far, key)
    dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                             jnp.zeros_like(z_vals[:, :1])], -1)
    occ = tf.alpha_mask_valid(buffers, pts)
    if occ is not None:
        valid = jnp.logical_and(valid, occ)

    xyz = tf.normalize_coord(buffers["aabb"], pts)
    valid, xyz, z_vals, dists = tf.compact_density_samples(
        cfg, buffers, valid, xyz, z_vals, dists)
    sigma = jnp.where(valid, tf.feature2density(
        cfg, tf.compute_density_feature(cfg, params, xyz)), 0.0)
    alpha, weight, bg_weight = raw2alpha(sigma, dists * cfg.distance_scale)
    app_mask = weight > cfg.ray_march_weight_thres

    K = cfg.app_sample_budget
    if K and K < xyz.shape[1] and buffers.get("alpha_volume") is not None:
        # static app_mask compaction (see tensorf_forward; gated on the
        # alpha mask existing): all appearance heads + the reflection MLP
        # run on at most K survivors per ray
        idx, valid_app = compact_first_k(app_mask, K)
        xyz_s = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        w_s = jnp.where(valid_app,
                        jnp.take_along_axis(weight, idx, axis=1), 0.0)
        sel = valid_app
    else:
        xyz_s, w_s, sel = xyz, weight, app_mask

    app, rgb_d, tint, normal, rho = compute_ref_appfeature(cfg, params, xyz_s)
    normal = normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + 1e-8)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], xyz_s.shape)
    d = -dirs
    dot = jnp.sum(d * normal, axis=-1, keepdims=True)
    reflection = 2.0 * dot * normal - d
    apply = mlp_apply or make_ref_mlp(cfg).apply
    rgb_s = apply(params["mlp"], xyz_s, reflection, app, -dot,
                  1.0 / (rho + 1e-6))
    rgb_samples = tint * jnp.clip(rgb_s, 0.0, None) + rgb_d
    rgb_samples = jnp.where(sel[..., None], rgb_samples, 0.0)

    # normal-orientation penalty (:236-238); scalar over masked samples
    pen = nn.relu(-dot)[..., 0] ** 2
    penalty = jnp.sum(jnp.where(sel, w_s * pen, 0.0))

    acc_map = weight.sum(-1)
    rgb_map = (w_s[..., None] * rgb_samples).sum(-2)
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
    depth_map = (weight * z_vals).sum(-1)
    far_plane = rays[:, -1] if rays.shape[-1] > 6 else jnp.full_like(
        acc_map, cfg.near_far[1])
    depth_map = depth_map + (1.0 - acc_map) * far_plane
    return tf.TensoRFOut(rgb_map=rgb_map, depth_map=depth_map, weight=weight,
                         sigma=sigma, bg_weight=bg_weight, z_vals=z_vals,
                         extras={"app_mask": app_mask, "valid": valid,
                                 "penalty": penalty, "normal": normal})
