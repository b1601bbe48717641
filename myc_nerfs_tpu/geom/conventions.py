"""The three camera-pose conventions used by the reference stacks, made explicit.

Each reference stack parses Blender ``transform_matrix`` (a camera-to-world
4x4 with -z forward / +y up) differently; PSNR parity requires reproducing
each exactly (SURVEY.md §7.3):

- BARF:    flip diag(-1,-1,1) then invert -> world->cam [3,4]
  (barf-myc/data/blender.py:87-92)
- TensoRF: right-multiply blender2opencv diag(1,-1,-1,1) -> cam->world
  (tensorf-myc/dataLoader/blender.py:33,91)
- NGP:     per-axis sign flips (correct_pose), t*scale+offset, row cycle [1,2,0]
  (jnerf-myc/python/jnerf/dataset/dataset.py:313-327)
"""
from __future__ import annotations

import jax.numpy as jnp

from .pose import compose, invert_pose, make_pose

__all__ = [
    "parse_raw_camera_barf",
    "unparse_camera_barf",
    "blender2opencv",
    "matrix_nerf2ngp",
    "matrix_ngp2nerf",
    "NERF_SCALE",
]

NERF_SCALE = 0.33  # jnerf-myc dataset.py: global scene scale applied to t


def parse_raw_camera_barf(pose_raw: jnp.ndarray) -> jnp.ndarray:
    """Blender c2w 4x4 (or [...,4,4]) -> BARF world->cam [..., 3, 4].

    pose = invert(flip(diag(-1,-1,1)) o c2w[:3]). Ref: data/blender.py:87-92.
    """
    pose_flip = make_pose(R=jnp.diag(jnp.array([-1.0, -1.0, 1.0])))
    flip = jnp.broadcast_to(pose_flip, pose_raw.shape[:-2] + (3, 4))
    pose = compose([flip, pose_raw[..., :3, :]])
    return invert_pose(pose)


def unparse_camera_barf(pose: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`parse_raw_camera_barf`; returns [..., 3, 4] c2w rows.

    Mirrors the pose-export path (barf-myc/model/barf.py:167-202): raw c2w =
    flip o invert(pose).
    """
    pose_flip = make_pose(R=jnp.diag(jnp.array([-1.0, -1.0, 1.0])))
    flip = jnp.broadcast_to(pose_flip, pose.shape[:-2] + (3, 4))
    return compose([flip, invert_pose(pose)])


def blender2opencv(c2w_blender: jnp.ndarray) -> jnp.ndarray:
    """TensoRF convention: c2w @ diag(1,-1,-1,1). Ref: dataLoader/blender.py:33,91."""
    B2CV = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0], dtype=c2w_blender.dtype))
    return c2w_blender @ B2CV


def matrix_nerf2ngp(matrix: jnp.ndarray, scale, offset, correct_pose=(1, -1, -1)) -> jnp.ndarray:
    """NeRF c2w [3|4, 4] top-3-rows -> NGP layout. Ref: dataset.py:313-320.

    Column sign flips by correct_pose, translation affine, then row cycle
    [1,2,0]. ``matrix`` is the [3, 4] block.
    """
    m = matrix[:3, :]
    cp = jnp.asarray(correct_pose, dtype=m.dtype)
    m = m * jnp.concatenate([cp, jnp.ones((1,), m.dtype)])[None, :]
    m = m.at[:, 3].set(m[:, 3] * scale + jnp.asarray(offset, m.dtype))
    return m[jnp.array([1, 2, 0])]


def matrix_ngp2nerf(matrix: jnp.ndarray, scale, offset, correct_pose=(1, -1, -1)) -> jnp.ndarray:
    """Inverse of :func:`matrix_nerf2ngp`. Ref: dataset.py:322-327."""
    m = matrix[jnp.array([2, 0, 1])]
    cp = jnp.asarray(correct_pose, dtype=m.dtype)
    m = m * jnp.concatenate([cp, jnp.ones((1,), m.dtype)])[None, :]
    m = m.at[:, 3].set((m[:, 3] - jnp.asarray(offset, m.dtype)) / scale)
    return m
