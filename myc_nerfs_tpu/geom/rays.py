"""Ray generation and NDC conversion, vmap-first.

TPU-native re-implementation of ray synthesis from the three reference stacks:
- barf-myc/camera.py:234-277 (pixel grid -> center+ray, NDC)
- tensorf-myc/dataLoader/ray_utils.py:81-173 (two axis conventions, get_rays)
The pixel grid uses half-pixel centers (x+0.5) per barf convention; tensorf's
conventions are provided as explicit variants.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .pose import cam2world, img2cam, to_hom

__all__ = [
    "pixel_grid",
    "get_center_and_ray",
    "get_ray_directions",
    "get_rays_from_directions",
    "convert_ndc",
    "points_from_depth",
]


def pixel_grid(H: int, W: int, offset: float = 0.5, dtype=jnp.float32) -> jnp.ndarray:
    """[H*W, 2] (x, y) pixel-center coordinates. Ref: camera.py:238-242."""
    y = jnp.arange(H, dtype=dtype) + offset
    x = jnp.arange(W, dtype=dtype) + offset
    Y, X = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)


def get_center_and_ray(
    pose: jnp.ndarray,
    intr: jnp.ndarray,
    H: int,
    W: int,
    xy_grid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Camera centers + (unnormalised) ray directions in world frame.

    pose: [B, 3, 4] world->cam; intr: [B, 3, 3]. Returns ([B, N, 3], [B, N, 3]).
    Optionally pass a precomputed/subsampled ``xy_grid`` [N, 2].
    Ref: camera.py:234-252.
    """
    if xy_grid is None:
        xy_grid = pixel_grid(H, W, dtype=pose.dtype)
    B = pose.shape[0]
    xy = jnp.broadcast_to(xy_grid[None], (B,) + xy_grid.shape)
    grid_3d = img2cam(to_hom(xy), intr)
    center_3d = jnp.zeros_like(grid_3d)
    grid_3d = cam2world(grid_3d, pose)
    center_3d = cam2world(center_3d, pose)
    return center_3d, grid_3d - center_3d


def get_ray_directions(H: int, W: int, focal, center=None, blender: bool = False) -> jnp.ndarray:
    """Per-pixel camera-frame ray directions [H, W, 3].

    ``blender=False`` -> OpenCV-style +z forward (ray_utils.py:81-103);
    ``blender=True``  -> Blender-style -z forward, +y up (ray_utils.py:106-129).
    """
    fx, fy = (focal, focal) if np.ndim(focal) == 0 else (focal[0], focal[1])
    cx, cy = (W / 2.0, H / 2.0) if center is None else (center[0], center[1])
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32) + 0.5,
                        jnp.arange(W, dtype=jnp.float32) + 0.5, indexing="ij")
    if blender:
        return jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1)
    return jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)


def get_rays_from_directions(directions: jnp.ndarray, c2w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate cam-frame dirs [..., 3] by c2w [3, 4]; normalised dirs + origins.

    Ref: ray_utils.py:132-153 (rays_d normalised, rays_o broadcast).
    """
    rays_d = directions @ c2w[:3, :3].T
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


def convert_ndc(center: jnp.ndarray, ray: jnp.ndarray, intr: jnp.ndarray, near: float = 1.0):
    """Shift origins to the near plane and project to NDC (cameras facing +z).

    Ref: camera.py:260-277.
    """
    center = center + (near - center[..., 2:]) / ray[..., 2:] * ray
    cx, cy, cz = center[..., 0], center[..., 1], center[..., 2]
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    scale_x = (intr[:, 0, 0] / intr[:, 0, 2])[:, None]
    scale_y = (intr[:, 1, 1] / intr[:, 1, 2])[:, None]
    cnx = scale_x * (cx / cz)
    cny = scale_y * (cy / cz)
    cnz = 1.0 - 2.0 * near / cz
    rnx = scale_x * (rx / rz - cx / cz)
    rny = scale_y * (ry / rz - cy / cz)
    rnz = 2.0 * near / cz
    center_ndc = jnp.stack([cnx, cny, cnz], axis=-1)
    ray_ndc = jnp.stack([rnx, rny, rnz], axis=-1)
    return center_ndc, ray_ndc


def points_from_depth(center: jnp.ndarray, ray: jnp.ndarray, depth: jnp.ndarray,
                      multi_samples: bool = False) -> jnp.ndarray:
    """x = c + d v. Ref: camera.py:254-258."""
    if multi_samples:
        center, ray = center[..., None, :], ray[..., None, :]
    return center + ray * depth
