"""Procrustes sim(3) alignment between camera-center point sets.

TPU-native re-implementation of barf-myc/camera.py:286-306 (used for BARF/GARF
pose evaluation and test-pose transfer). Functional, jit-safe: the reflection
fix is a `where` on det sign rather than in-place mutation.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Sim3", "procrustes_analysis", "apply_sim3", "align_poses_sim3"]


class Sim3(NamedTuple):
    t0: jnp.ndarray  # [3] centroid of X0
    t1: jnp.ndarray  # [3] centroid of X1
    s0: jnp.ndarray  # scalar scale of X0
    s1: jnp.ndarray  # scalar scale of X1
    R: jnp.ndarray   # [3, 3] rotation aligning X0-frame to X1-frame


def procrustes_analysis(X0: jnp.ndarray, X1: jnp.ndarray) -> Sim3:
    """Similarity transform aligning point set X1 [N,3] onto X0 [N,3].

    X1to0 = (X1 - t1)/s1 @ R^T * s0 + t0. Ref: camera.py:286-306.
    """
    t0 = X0.mean(axis=0)
    t1 = X1.mean(axis=0)
    X0c = X0 - t0
    X1c = X1 - t1
    s0 = jnp.sqrt((X0c**2).sum(axis=-1).mean())
    s1 = jnp.sqrt((X1c**2).sum(axis=-1).mean())
    M = (X0c / s0).T @ (X1c / s1)
    U, S, Vh = jnp.linalg.svd(M.astype(jnp.float64) if M.dtype == jnp.float64 else M)
    R = U @ Vh
    # reflection fix: flip last row of R if det < 0 (branch-free)
    det = jnp.linalg.det(R)
    flip = jnp.where(det < 0, -1.0, 1.0).astype(R.dtype)
    R = R.at[2].multiply(flip)
    return Sim3(t0=t0, t1=t1, s0=s0, s1=s1, R=R)


def apply_sim3(sim3: Sim3, X1: jnp.ndarray) -> jnp.ndarray:
    """Map points from X1's frame into X0's frame: [N,3]->[N,3]."""
    return (X1 - sim3.t1) / sim3.s1 @ sim3.R.T * sim3.s0 + sim3.t0


def align_poses_sim3(sim3: Sim3, poses: jnp.ndarray) -> jnp.ndarray:
    """Align world->cam poses [N,3,4] by the sim3 found on camera centers.

    Mirrors the BARF eval alignment (barf-myc/model/barf.py:130-142): camera
    centers are sim3-mapped and rotations composed with R.
    """
    from .pose import invert_pose, make_pose

    R_c2w = jnp.swapaxes(poses[..., :3], -1, -2)
    centers = (-R_c2w @ poses[..., 3:])[..., 0]
    centers_aligned = apply_sim3(sim3, centers)
    R_aligned = poses[..., :3] @ sim3.R.T[None]
    t_aligned = (-R_aligned @ centers_aligned[..., None])[..., 0]
    return make_pose(R=R_aligned, t=t_aligned)
