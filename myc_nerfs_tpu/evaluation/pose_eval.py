"""Camera-pose alignment evaluation for BARF/GARF.

TPU-native re-implementation of barf-myc/model/barf.py + garf.py pose
evaluation (prealign_cameras garf.py:136-148, evaluate_camera_alignment
garf.py:150-158).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..geom import pose as pose_lib
from ..geom.procrustes import Sim3, apply_sim3, procrustes_analysis


class PoseError(NamedTuple):
    R: jnp.ndarray  # [N] rotation geodesic errors (radians)
    t: jnp.ndarray  # [N] translation errors


def camera_centers(poses: jnp.ndarray) -> jnp.ndarray:
    """World-frame camera centers of world->cam poses [N, 3, 4] -> [N, 3]."""
    R_c2w = jnp.swapaxes(poses[..., :3], -1, -2)
    return (-R_c2w @ poses[..., 3:])[..., 0]


def prealign_cameras(pose: jnp.ndarray, pose_GT: jnp.ndarray) -> Tuple[jnp.ndarray, Sim3]:
    """Procrustes-align predicted cameras onto GT. Ref: garf.py:136-148."""
    center_pred = camera_centers(pose)
    center_GT = camera_centers(pose_GT)
    sim3 = procrustes_analysis(center_GT, center_pred)
    center_aligned = apply_sim3(sim3, center_pred)
    R_aligned = pose[..., :3] @ sim3.R.T
    t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
    return pose_lib.make_pose(R=R_aligned, t=t_aligned), sim3


def evaluate_camera_alignment(pose_aligned: jnp.ndarray, pose_GT: jnp.ndarray) -> PoseError:
    """Rotation/translation errors between aligned and GT poses.

    Ref: garf.py:150-158.
    """
    R_err = pose_lib.rotation_distance(pose_aligned[..., :3], pose_GT[..., :3])
    t_err = jnp.linalg.norm(pose_aligned[..., 3] - pose_GT[..., 3], axis=-1)
    return PoseError(R=R_err, t=t_err)
