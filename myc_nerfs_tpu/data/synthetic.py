"""Synthetic multi-view scenes for tests and benches.

The environment has no competition image data (download_data.sh is not run),
so integration tests overfit on analytically-rendered scenes: a density/color
field with closed form, volume-rendered along rays at high sample count to
produce ground-truth images from Blender-style orbit cameras. This follows
the SURVEY.md §4 test strategy (overfit-to-PSNR integration tests).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import pose as pose_lib
from ..geom import rays as rays_lib
from ..render.composite import composite_nerf


class SyntheticScene(NamedTuple):
    images: jnp.ndarray   # [N, H, W, 3]
    poses: jnp.ndarray    # [N, 3, 4] world->cam (BARF convention)
    intr: jnp.ndarray     # [N, 3, 3]
    H: int
    W: int
    depth_range: Tuple[float, float]


def analytic_field(points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """A smooth two-blob emissive field: returns (rgb [..., 3], sigma [...])."""
    c1 = jnp.array([0.35, 0.0, 0.0])
    c2 = jnp.array([-0.35, 0.15, 0.1])
    d1 = ((points - c1) ** 2).sum(-1)
    d2 = ((points - c2) ** 2).sum(-1)
    sigma = 18.0 * jnp.exp(-d1 / 0.05) + 14.0 * jnp.exp(-d2 / 0.08)
    w1 = jnp.exp(-d1 / 0.05)[..., None]
    w2 = jnp.exp(-d2 / 0.08)[..., None]
    col1 = jnp.array([0.9, 0.25, 0.2])
    col2 = jnp.array([0.2, 0.45, 0.95])
    rgb = (w1 * col1 + w2 * col2) / (w1 + w2 + 1e-8)
    return rgb, sigma


def analytic_field_textured(points: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharper, textured field for pose-refinement tests: a dense ball with
    high-frequency color stripes (pose errors must cost photometric loss)."""
    c = jnp.array([0.0, 0.0, 0.0])
    r = jnp.linalg.norm(points - c, axis=-1)
    sigma = 40.0 * jax.nn.sigmoid((0.6 - r) * 30.0)
    stripes = 0.5 + 0.5 * jnp.sin(12.0 * points[..., 0]) * jnp.sin(12.0 * points[..., 1])
    rings = 0.5 + 0.5 * jnp.cos(10.0 * points[..., 2])
    rgb = jnp.stack([stripes, rings, 1.0 - stripes * rings], axis=-1)
    return rgb, sigma


def orbit_poses(n: int, radius: float = 3.0, elevation: float = 0.35) -> jnp.ndarray:
    """n world->cam poses on a circular orbit looking at the origin."""
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses = []
    for a in angles:
        cam = np.array([radius * np.cos(a), radius * np.sin(a), radius * np.sin(elevation)])
        fwd = -cam / np.linalg.norm(cam)          # camera +z looks at origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_c2w = np.stack([right, down, fwd], axis=1)  # columns = cam axes in world
        R = R_c2w.T                                   # world->cam
        t = -R @ cam
        poses.append(np.concatenate([R, t[:, None]], axis=1))
    return jnp.asarray(np.stack(poses), jnp.float32)


def render_analytic(pose: jnp.ndarray, intr: jnp.ndarray, H: int, W: int,
                    depth_range=(1.5, 4.5), n_samples: int = 192,
                    bg_color: float = 1.0, field=None) -> jnp.ndarray:
    """Ground-truth render of an analytic field from one camera."""
    field = field or analytic_field
    center, ray = rays_lib.get_center_and_ray(pose[None], intr[None], H, W)
    depth = jnp.linspace(depth_range[0], depth_range[1], n_samples)
    depth = jnp.broadcast_to(depth[None, None, :, None], (1, H * W, n_samples, 1))
    points = center[..., None, :] + ray[..., None, :] * depth
    rgb_s, sigma_s = field(points)
    rgb, _, _, _ = composite_nerf(ray, rgb_s, sigma_s, depth,
                                  bg_color=jnp.full((3,), bg_color))
    return rgb.reshape(H, W, 3)


def make_scene(n_views: int = 6, H: int = 32, W: int = 32,
               focal_factor: float = 1.2, depth_range=(1.5, 4.5),
               textured: bool = False) -> SyntheticScene:
    poses = orbit_poses(n_views)
    f = focal_factor * W
    intr = jnp.broadcast_to(
        jnp.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]), (n_views, 3, 3))
    field = analytic_field_textured if textured else analytic_field
    render = jax.jit(lambda p, k: render_analytic(p, k, H, W, depth_range, field=field))
    images = jnp.stack([render(poses[i], intr[i]) for i in range(n_views)])
    return SyntheticScene(images=images, poses=poses, intr=intr, H=H, W=W,
                          depth_range=depth_range)
