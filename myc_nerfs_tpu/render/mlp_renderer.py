"""Ray rendering for the MLP (NeRF/BARF/GARF) family.

TPU-native re-implementation of the barf-myc Graph render path
(model/nerf.py:211-284): ray generation from (possibly refined) poses,
stratified depth sampling, MLP evaluation over [rays, samples], quadrature
compositing. Static shapes throughout; full-image rendering is chunked by
``lax.map`` over fixed-size ray slices (render_by_slices, nerf.py:273-284).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..geom import rays as rays_lib
from ..render import sampling
from ..render.composite import composite_nerf


class RenderOut(NamedTuple):
    rgb: jnp.ndarray      # [B, R, 3]
    depth: jnp.ndarray    # [B, R, 1]
    opacity: jnp.ndarray  # [B, R, 1]
    prob: jnp.ndarray     # [B, R, N, 1]


def render_rays_mlp(
    apply_fn,
    center: jnp.ndarray,
    ray: jnp.ndarray,
    key: Optional[jax.Array],
    n_samples: int,
    depth_range: Tuple[float, float],
    stratified: bool = True,
    bg_color: Optional[jnp.ndarray] = None,
    view_dep: bool = True,
    fine_apply_fn=None,
    n_samples_fine: int = 0,
) -> RenderOut:
    """Render rays with an MLP field.

    ``apply_fn(points [B,R,N,3], ray_unit [B,R,N,3] | None) -> (rgb, sigma)``
    closes over params/progress. center/ray: [B, R, 3].
    """
    B, R = center.shape[:2]
    depth = sampling.sample_depth(key, (B, R), n_samples, depth_range,
                                  stratified=stratified)
    out = _eval_and_composite(apply_fn, center, ray, depth, bg_color, view_dep)
    if fine_apply_fn is not None and n_samples_fine > 0:
        # hierarchical fine sampling from the coarse probability (nerf.py:252-266)
        pdf = out.prob[..., 0]
        depth_fine = sampling.sample_depth_from_pdf(pdf, n_samples_fine, depth_range)
        depth_all = jnp.sort(jnp.concatenate([depth, depth_fine], axis=-2), axis=-2)
        out_fine = _eval_and_composite(fine_apply_fn, center, ray, depth_all,
                                       bg_color, view_dep)
        return out_fine
    return out


def _eval_and_composite(apply_fn, center, ray, depth, bg_color, view_dep) -> RenderOut:
    points = center[..., None, :] + ray[..., None, :] * depth
    if view_dep:
        ray_unit = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-8)
        ray_unit = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
    else:
        ray_unit = None
    rgb_s, sigma_s = apply_fn(points, ray_unit)
    rgb, d, opacity, prob = composite_nerf(ray, rgb_s, sigma_s, depth, bg_color=bg_color)
    return RenderOut(rgb=rgb, depth=d, opacity=opacity, prob=prob)


def render_image_mlp(
    apply_fn,
    pose: jnp.ndarray,
    intr: jnp.ndarray,
    H: int,
    W: int,
    n_samples: int,
    depth_range: Tuple[float, float],
    bg_color: Optional[jnp.ndarray] = None,
    view_dep: bool = True,
    chunk: int = 4096,
    fine_apply_fn=None,
    n_samples_fine: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image render in fixed-size ray slices -> (rgb [H,W,3], depth [H,W]).

    Ref: render_by_slices (nerf.py:273-284), deterministic midpoint sampling
    like the reference eval path. With ``fine_apply_fn`` the full
    coarse -> inverse-CDF -> fine graph runs per slice, exactly like training
    (nerf.py:396-403) — eval and train share the sampling graph.
    """
    center, ray = rays_lib.get_center_and_ray(pose[None], intr[None], H, W)
    n = H * W
    pad = (-n) % chunk
    center = jnp.pad(center, ((0, 0), (0, pad), (0, 0)))
    ray = jnp.pad(ray, ((0, 0), (0, pad), (0, 0)))
    centers = center.reshape(-1, chunk, 3)
    rays_ = ray.reshape(-1, chunk, 3)

    def render_chunk(cr):
        c, r = cr
        out = render_rays_mlp(apply_fn, c[None], r[None], None, n_samples,
                              depth_range, stratified=False, bg_color=bg_color,
                              view_dep=view_dep, fine_apply_fn=fine_apply_fn,
                              n_samples_fine=n_samples_fine)
        return out.rgb[0], out.depth[0, :, 0]

    rgb, depth = jax.lax.map(render_chunk, (centers, rays_))
    rgb = rgb.reshape(-1, 3)[:n].reshape(H, W, 3)
    depth = depth.reshape(-1)[:n].reshape(H, W)
    return rgb, depth
