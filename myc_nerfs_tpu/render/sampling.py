"""Depth/ray sampling: stratified bins + inverse-CDF importance sampling.

TPU-native re-implementation of the reference samplers:
- stratified depth bins + hierarchical fine sampling
  (barf-myc/model/nerf.py:286-317)
- sample_pdf for TensoRF-style hierarchical sampling
  (tensorf-myc/dataLoader/ray_utils.py:195+)
All static-shape, jit/vmap-safe; randomness from explicit jax.random keys
(replacing Jittor's global RNG — SURVEY.md §2 checklist item 8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_depth", "sample_depth_from_pdf", "sample_pdf"]


def sample_depth(
    key: jax.Array | None,
    shape: tuple,
    n_samples: int,
    depth_range: tuple,
    stratified: bool = True,
    param: str = "metric",
) -> jnp.ndarray:
    """Stratified depth samples [*shape, n_samples, 1] over depth_range.

    ``shape`` are the leading (batch, rays) dims. With ``stratified`` the
    offset inside each bin is uniform random, else the bin midpoint (0.5).
    ``param='inverse'`` returns reciprocal depths (for unbounded scenes).
    Ref: nerf.py:286-296.
    """
    depth_min, depth_max = depth_range
    if stratified:
        if key is None:
            raise ValueError("stratified sampling needs a PRNG key")
        rand = jax.random.uniform(key, shape + (n_samples, 1))
    else:
        rand = jnp.full(shape + (n_samples, 1), 0.5)
    rand = rand + jnp.arange(n_samples, dtype=jnp.float32)[None, :, None]
    depth = rand / n_samples * (depth_max - depth_min) + depth_min
    if param == "inverse":
        depth = 1.0 / (depth + 1e-8)
    return depth


def sample_depth_from_pdf(
    pdf: jnp.ndarray,
    n_fine: int,
    depth_range: tuple,
) -> jnp.ndarray:
    """Inverse-transform sampling of fine depths from a per-bin pdf.

    pdf: [..., N] (weights over the N coarse bins spanning depth_range).
    Returns [..., n_fine, 1]. Deterministic midpoints like the reference.
    Ref: nerf.py:298-317.
    """
    depth_min, depth_max = depth_range
    N = pdf.shape[-1]
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., N+1]
    grid = jnp.linspace(0.0, 1.0, n_fine + 1)
    unif = 0.5 * (grid[:-1] + grid[1:])
    unif = jnp.broadcast_to(unif, cdf.shape[:-1] + (n_fine,))
    idx = jax.vmap(lambda c, u: jnp.searchsorted(c, u, side="right"), in_axes=(0, 0))(
        cdf.reshape(-1, N + 1), unif.reshape(-1, n_fine)
    ).reshape(unif.shape)
    depth_bin = jnp.linspace(depth_min, depth_max, N + 1)
    depth_bin = jnp.broadcast_to(depth_bin, cdf.shape)
    lo = jnp.clip(idx - 1, 0, N)
    hi = jnp.clip(idx, 0, N)
    depth_low = jnp.take_along_axis(depth_bin, lo, axis=-1)
    depth_high = jnp.take_along_axis(depth_bin, hi, axis=-1)
    cdf_low = jnp.take_along_axis(cdf, lo, axis=-1)
    cdf_high = jnp.take_along_axis(cdf, hi, axis=-1)
    t = (unif - cdf_low) / (cdf_high - cdf_low + 1e-8)
    return (depth_low + t * (depth_high - depth_low))[..., None]


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: jax.Array | None = None,
) -> jnp.ndarray:
    """Hierarchical sampling over explicit bin edges (TensoRF/NeRF flavor).

    bins: [..., M+1] edges; weights: [..., M]. Deterministic midpoints when
    ``key`` is None, else uniform randoms. Ref: ray_utils.py:195+.
    """
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [..., M+1]
    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))
    M1 = cdf.shape[-1]
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, M1), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.clip(idx - 1, 0, M1 - 1)
    above = jnp.clip(idx, 0, M1 - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
    denom = jnp.where(cdf_g1 - cdf_g0 < 1e-5, 1.0, cdf_g1 - cdf_g0)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
