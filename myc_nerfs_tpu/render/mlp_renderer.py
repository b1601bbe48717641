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
    tile: bool = True,
) -> RenderOut:
    """Render rays with an MLP field.

    ``apply_fn(points [B,R,N,3], ray_unit [B,R,N,3] | None) -> (rgb, sigma)``
    closes over params/progress. center/ray: [B, R, 3].

    The [B, R] split is an internal choice (the reference's contract is the
    total ray count, nerf.py:219); rays are re-tiled to a non-pow2 x
    non-pow2 [G1, G2] BEFORE depth sampling so every downstream activation
    is born at that shape — see _mlp_tile_dims for the measured XLA:TPU
    layout cliff this sidesteps. Outputs are un-tiled back to [B, R].
    ``tile=False`` keeps the caller's [B, R] (image-axis DP shards rays on
    B; the tile reshape would cross the shard boundary).
    """
    B, R = center.shape[:2]
    g1, g2, pad = _mlp_tile_dims(B * R)
    tiled = tile and (g1, g2) != (B, R)
    if tiled:
        center = _tile_rays(center, g1, g2, pad)
        ray = _tile_rays(ray, g1, g2, pad)
    depth = sampling.sample_depth(key, center.shape[:2], n_samples,
                                  depth_range, stratified=stratified)
    out = _eval_and_composite(apply_fn, center, ray, depth, bg_color, view_dep)
    if fine_apply_fn is not None and n_samples_fine > 0:
        # hierarchical fine sampling from the coarse probability (nerf.py:252-266)
        pdf = out.prob[..., 0]
        depth_fine = sampling.sample_depth_from_pdf(pdf, n_samples_fine, depth_range)
        depth_all = jnp.sort(jnp.concatenate([depth, depth_fine], axis=-2), axis=-2)
        out = _eval_and_composite(fine_apply_fn, center, ray, depth_all,
                                  bg_color, view_dep)
    if tiled:
        out = RenderOut(*(_untile_rays(x, B, R) for x in out))
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


def _mlp_tile_dims(n_rays: int) -> Tuple[int, int, int]:
    """(G1, G2, pad): non-pow2 x non-pow2 factorization of >= n_rays rays.

    probe_r4_garf_views (TPU v5e, f32): the same per-step MLP work runs ~2x
    faster when neither leading batch dim of the [G1, G2, N, C] activations
    is a power of two — XLA:TPU layout assignment then picks one consistent
    {2,3,1,0} activation layout for every dot and emits zero relayout
    copies, vs mixed {3,2,1,0}/{2,3,1,0} with several full-activation
    (~128 MB) copies per step at e.g. [8, 256, 128, 256]. G1=12 fixed; G2
    bumped off powers of two. The tiling must happen BEFORE the big
    activations are materialized (reshaping afterwards anchors the slow
    layout via the producers — measured, see PERF_NOTES round 4).
    """
    g1 = 12
    g2 = -(-n_rays // g1)
    while g2 & (g2 - 1) == 0:  # pow2 (or 1): bump off the cliff
        g2 += 1
    return g1, g2, g1 * g2 - n_rays


def _tile_rays(x: jnp.ndarray, g1: int, g2: int, pad: int) -> jnp.ndarray:
    """[B, R, ...] -> [G1, G2, ...] (pad rays replicate ray 0, dropped by
    _untile_rays)."""
    flat = x.reshape((-1,) + x.shape[2:])
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.broadcast_to(flat[:1], (pad,) + flat.shape[1:])], 0)
    return flat.reshape((g1, g2) + x.shape[2:])


def _untile_rays(x: jnp.ndarray, B: int, R: int) -> jnp.ndarray:
    flat = x.reshape((-1,) + x.shape[2:])
    return flat[:B * R].reshape((B, R) + x.shape[2:])


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
