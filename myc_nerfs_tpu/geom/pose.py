"""Camera-pose [R|t] algebra on [..., 3, 4] arrays.

TPU-native re-implementation of the reference pose helpers
(behavior: barf-myc/camera.py:11-59, 197-232, 279-318). Poses are
world->camera maps x_cam = R x_world + t, stored as [..., 3, 4].
Pure jnp; everything vmaps/jits.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_pose",
    "invert_pose",
    "compose_pair",
    "compose",
    "to_hom",
    "world2cam",
    "cam2world",
    "cam2img",
    "img2cam",
    "rotation_distance",
    "angle_to_rotation_matrix",
    "get_novel_view_poses",
]


def make_pose(R: Optional[jnp.ndarray] = None, t: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Assemble a [..., 3, 4] pose from R [..., 3, 3] and/or t [..., 3].

    Missing R -> identity; missing t -> zeros. Ref: camera.py:17-34.
    """
    if R is None and t is None:
        raise ValueError("make_pose needs R and/or t")
    if R is None:
        t = jnp.asarray(t, dtype=jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=t.dtype), t.shape[:-1] + (3, 3))
    elif t is None:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.zeros(R.shape[:-1], dtype=R.dtype)
    else:
        R = jnp.asarray(R, dtype=jnp.float32)
        t = jnp.asarray(t, dtype=jnp.float32)
    return jnp.concatenate([R, t[..., None]], axis=-1)


def invert_pose(pose: jnp.ndarray) -> jnp.ndarray:
    """Invert [R|t]: (R^T | -R^T t). Ref: camera.py:36-42."""
    R, t = pose[..., :3], pose[..., 3:]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = (-R_inv @ t)[..., 0]
    return make_pose(R=R_inv, t=t_inv)


def compose_pair(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """pose_new(x) = pose_b(pose_a(x)). Ref: camera.py:52-59."""
    R_a, t_a = pose_a[..., :3], pose_a[..., 3:]
    R_b, t_b = pose_b[..., :3], pose_b[..., 3:]
    R_new = R_b @ R_a
    t_new = (R_b @ t_a + t_b)[..., 0]
    return make_pose(R=R_new, t=t_new)


def compose(pose_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """pose_new(x) = poseN(... pose2(pose1(x))). Ref: camera.py:44-50."""
    pose_new = pose_list[0]
    for p in pose_list[1:]:
        pose_new = compose_pair(pose_new, p)
    return pose_new


def to_hom(X: jnp.ndarray) -> jnp.ndarray:
    """Append homogeneous 1. Ref: camera.py:197-200."""
    return jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)


def world2cam(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] world points -> camera frame. Ref: camera.py:203-205."""
    return to_hom(X) @ jnp.swapaxes(pose, -1, -2)


def cam2world(X: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 3] camera points -> world frame. Ref: camera.py:210-221."""
    pose_inv = invert_pose(pose)
    return to_hom(X) @ jnp.swapaxes(pose_inv, -1, -2)


def cam2img(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Camera points -> image plane via K. Ref: camera.py:206-207."""
    return X @ jnp.swapaxes(intr, -1, -2)


def img2cam(X: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous pixels -> camera rays via K^-1. Ref: camera.py:208-209."""
    return X @ jnp.swapaxes(jnp.linalg.inv(intr), -1, -2)


def rotation_distance(R1: jnp.ndarray, R2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Geodesic angle between rotations. Ref: camera.py:279-284."""
    R_diff = R1 @ jnp.swapaxes(R2, -1, -2)
    trace = R_diff[..., 0, 0] + R_diff[..., 1, 1] + R_diff[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))


def angle_to_rotation_matrix(a: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Rotation about X/Y/Z by angle(s) a. Ref: camera.py:223-232."""
    roll = dict(X=1, Y=2, Z=0)[axis]
    O = jnp.zeros_like(a)
    I = jnp.ones_like(a)
    M = jnp.stack(
        [
            jnp.stack([jnp.cos(a), -jnp.sin(a), O], axis=-1),
            jnp.stack([jnp.sin(a), jnp.cos(a), O], axis=-1),
            jnp.stack([O, O, I], axis=-1),
        ],
        axis=-2,
    )
    return jnp.roll(M, shift=(roll, roll), axis=(-2, -1))


def get_novel_view_poses(pose_anchor: jnp.ndarray, N: int = 60, scale: float = 1.0) -> jnp.ndarray:
    """Circular small-oscillation novel-view path. Ref: camera.py:308-318."""
    theta = jnp.arange(N, dtype=jnp.float32) / N * 2.0 * np.pi
    R_x = angle_to_rotation_matrix(jnp.arcsin(jnp.sin(theta) * 0.05), "X")
    R_y = angle_to_rotation_matrix(jnp.arcsin(jnp.cos(theta) * 0.05), "Y")
    pose_rot = make_pose(R=R_y @ R_x)
    pose_shift = make_pose(t=jnp.array([0.0, 0.0, -4.0 * scale]))
    pose_shift2 = make_pose(t=jnp.array([0.0, 0.0, 3.8 * scale]))
    pose_oscil = compose([jnp.broadcast_to(pose_shift, (N, 3, 4)), pose_rot,
                          jnp.broadcast_to(pose_shift2, (N, 3, 4))])
    return compose([pose_oscil, pose_anchor[None]])
