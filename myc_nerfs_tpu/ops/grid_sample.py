"""Bilinear/trilinear grid sampling with align_corners=True semantics.

TPU-native equivalent of torch/Jittor ``F.grid_sample`` as used by TensoRF
factor grids (tensorf-myc/models/tensoRF.py:209-244) and the alpha mask
(tensorBase.py:39-59). Implemented as gathers + lerps, which XLA fuses well;
coordinates are in [-1, 1] per grid_sample convention. Out-of-range
coordinates are clamped to the border (matching the reference's usage where
coords are pre-normalised in-bounds).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_2d", "grid_sample_3d"]


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1,1] -> [0, size-1] continuous index (align_corners=True)."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [C, H, W] at coords [..., 2] ((x, y) in [-1, 1]).

    Returns [..., C]. Bilinear, align_corners=True, border clamp.
    """
    C, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    g = jnp.moveaxis(grid, 0, -1)  # [H, W, C] so gathers index leading dims
    v00 = g[y0, x0]
    v01 = g[y0, x1]
    v10 = g[y1, x0]
    v11 = g[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [C, D, H, W] at coords [..., 3] ((x, y, z) in [-1, 1]).

    grid_sample convention: x indexes W, y indexes H, z indexes D.
    Returns [..., C]. Trilinear, align_corners=True, border clamp.
    """
    C, D, H, W = grid.shape
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    z = _unnormalize(coords[..., 2], D)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    z1 = jnp.clip(z0 + 1, 0, D - 1)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    wz = jnp.clip(z - z0, 0.0, 1.0)[..., None]
    g = jnp.moveaxis(grid, 0, -1)  # [D, H, W, C]
    v000 = g[z0, y0, x0]
    v001 = g[z0, y0, x1]
    v010 = g[z0, y1, x0]
    v011 = g[z0, y1, x1]
    v100 = g[z1, y0, x0]
    v101 = g[z1, y0, x1]
    v110 = g[z1, y1, x0]
    v111 = g[z1, y1, x1]
    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
