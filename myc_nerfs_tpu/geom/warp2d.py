"""Planar warp library: SO(2)/SE(2)/SL(3) Lie ops + grid warps.

Re-implements barf-myc/warp.py:10-169 (the planar-alignment experiment
library; the reference ships the library without a planar model file —
SURVEY.md B13). Pure jnp, jit/vmap-safe.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .pose import to_hom

__all__ = ["so2_to_SO2", "SO2_to_so2", "se2_to_SE2", "SE2_to_se2",
           "sl3_to_SL3", "warp_grid", "normalized_pixel_grid",
           "normalized_pixel_grid_crop", "warp_corners",
           "check_corners_in_range"]


def _taylor_A(x, nth=10):
    """sin(x)/x (warp.py:151-157)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        if i > 0:
            denom *= (2 * i) * (2 * i + 1)
        ans = ans + (-1.0) ** i * x ** (2 * i) / denom
    return ans


def _taylor_B(x, nth=10):
    """(1-cos(x))/x (warp.py:158-164 — note: /x, not /x^2)."""
    ans = jnp.zeros_like(x)
    denom = 1.0
    for i in range(nth + 1):
        denom *= (2 * i + 1) * (2 * i + 2)
        ans = ans + (-1.0) ** i * x ** (2 * i + 1) / denom
    return ans


def so2_to_SO2(theta: jnp.ndarray) -> jnp.ndarray:
    """[..., 1] -> [..., 2, 2] (warp.py:122-126)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.concatenate([c, -s], -1),
                      jnp.concatenate([s, c], -1)], -2)


def SO2_to_so2(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 2, 2] -> [..., 1] (warp.py:128-130)."""
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])[..., None]


def se2_to_SE2(delta: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] (u, theta) -> [..., 2, 3] [R | V u] (warp.py:139-147)."""
    u, theta = delta[..., :2], delta[..., 2:]
    A = _taylor_A(theta)
    B = _taylor_B(theta)
    V = jnp.stack([jnp.concatenate([A, -B], -1),
                   jnp.concatenate([B, A], -1)], -2)
    R = so2_to_SO2(theta)
    t = (V @ u[..., None])
    return jnp.concatenate([R, t], -1)


def SE2_to_se2(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Inverse of se2_to_SE2: [..., 2, 3] -> [..., 3]."""
    R, t = Rt[..., :2], Rt[..., 2:]
    theta = SO2_to_so2(R)
    A = _taylor_A(theta)
    B = _taylor_B(theta)
    denom = A**2 + B**2 + eps
    invV = jnp.stack([jnp.concatenate([A, B], -1),
                      jnp.concatenate([-B, A], -1)], -2) / denom[..., None]
    u = (invV @ t)[..., 0]
    return jnp.concatenate([u, theta], -1)


def sl3_to_SL3(h: jnp.ndarray) -> jnp.ndarray:
    """[..., 8] -> homography [..., 3, 3] via matrix exp (warp.py:133-141)."""
    h1, h2, h3, h4, h5, h6, h7, h8 = jnp.split(h, 8, axis=-1)
    A = jnp.stack([jnp.concatenate([h5, h3, h1], -1),
                   jnp.concatenate([h4, -h5 - h6, h2], -1),
                   jnp.concatenate([h7, h8, h6], -1)], -2)
    flat = A.reshape((-1, 3, 3))
    H = jax.vmap(jax.scipy.linalg.expm)(flat)
    return H.reshape(A.shape)


def normalized_pixel_grid(H: int, W: int, batch: int = 1) -> jnp.ndarray:
    """[B, HW, 2] grid in [-1, 1] scaled by aspect (warp.py:10-16)."""
    m = max(H, W)
    y = ((jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / m)
    x = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / m)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([X, Y], -1).reshape(-1, 2)
    return jnp.broadcast_to(grid[None], (batch,) + grid.shape)


def normalized_pixel_grid_crop(H: int, W: int, H_crop: int, W_crop: int,
                               batch: int = 1) -> jnp.ndarray:
    """Centre-crop variant (warp.py:18-26)."""
    m = max(H, W)
    y0, y1 = H // 2 - H_crop // 2, H // 2 + H_crop // 2
    x0, x1 = W // 2 - W_crop // 2, W // 2 + W_crop // 2
    y = ((jnp.arange(y0, y1, dtype=jnp.float32) + 0.5) / H * 2 - 1) * (H / m)
    x = ((jnp.arange(x0, x1, dtype=jnp.float32) + 0.5) / W * 2 - 1) * (W / m)
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    grid = jnp.stack([X, Y], -1).reshape(-1, 2)
    return jnp.broadcast_to(grid[None], (batch,) + grid.shape)


def warp_grid(xy_grid: jnp.ndarray, warp: jnp.ndarray, warp_type: str) -> jnp.ndarray:
    """Apply a planar warp to [B, N, 2] (warp.py:28-48)."""
    if warp_type == "translation":
        return xy_grid + warp[..., None, :]
    if warp_type == "rotation":
        return xy_grid @ jnp.swapaxes(so2_to_SO2(warp), -1, -2)
    if warp_type == "rigid":
        return to_hom(xy_grid) @ jnp.swapaxes(se2_to_SE2(warp), -1, -2)
    if warp_type == "homography":
        out = to_hom(xy_grid) @ jnp.swapaxes(sl3_to_SL3(warp), -1, -2)
        return out[..., :2] / (out[..., 2:] + 1e-8)
    raise ValueError(warp_type)


def warp_corners(H: int, W: int, H_crop: int, W_crop: int,
                 warp_param: jnp.ndarray, warp_type: str) -> jnp.ndarray:
    """Warped crop corners (warp.py:50-59)."""
    m = max(H, W)
    y_crop = (H // 2 - H_crop // 2, H // 2 + H_crop // 2)
    x_crop = (W // 2 - W_crop // 2, W // 2 + W_crop // 2)
    Y = [((y + 0.5) / H * 2 - 1) * (H / m) for y in y_crop]
    X = [((x + 0.5) / W * 2 - 1) * (W / m) for x in x_crop]
    corners = jnp.asarray([(X[0], Y[0]), (X[0], Y[1]), (X[1], Y[1]), (X[1], Y[0])])
    corners = jnp.broadcast_to(corners[None], (warp_param.shape[0], 4, 2))
    return warp_grid(corners, warp_param, warp_type)


def check_corners_in_range(H: int, W: int, H_crop: int, W_crop: int,
                           warp_param: jnp.ndarray, warp_type: str) -> jnp.ndarray:
    """All warped corners inside the image (warp.py:61-66)."""
    m = max(H, W)
    c = warp_corners(H, W, H_crop, W_crop, warp_param, warp_type)
    X = (c[..., 0] / W * m + 1) / 2 * W - 0.5
    Y = (c[..., 1] / H * m + 1) / 2 * H - 0.5
    return ((0 <= X) & (X < W) & (0 <= Y) & (Y < H)).all()
