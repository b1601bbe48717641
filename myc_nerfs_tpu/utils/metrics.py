"""Image metrics: MSE/PSNR/SSIM.

Re-implements jnerf-myc losses/mse_loss.py:6-14 (img2mse/mse2psnr) and
tensorf-myc/utils.py:73-120 (rgb_ssim, gaussian-filter SSIM) in pure jnp.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["img2mse", "mse2psnr", "psnr", "ssim"]


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse + 1e-12)


def psnr(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return mse2psnr(img2mse(x, y))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(img0: jnp.ndarray, img1: jnp.ndarray, max_val: float = 1.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM over an [H, W, C] image pair (tensorf-myc utils.py:73-120)."""
    kern = _gaussian_kernel(filter_size, filter_sigma)

    def filt(img):
        # separable gaussian blur over H then W, per channel
        out = jax.vmap(lambda c: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kern, mode="valid"), 0, c), in_axes=-1, out_axes=-1)(img)
        out = jax.vmap(lambda c: jnp.apply_along_axis(
            lambda v: jnp.convolve(v, kern, mode="valid"), 1, c), in_axes=-1, out_axes=-1)(out)
        return out

    mu0 = filt(img0)
    mu1 = filt(img1)
    s00 = filt(img0 * img0) - mu0**2
    s11 = filt(img1 * img1) - mu1**2
    s01 = filt(img0 * img1) - mu0 * mu1
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0**2 + mu1**2 + c1) * (s00 + s11 + c2))
    return ssim_map.mean()
