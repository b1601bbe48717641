"""Quaternion <-> rotation-matrix utilities (barf-myc/camera.py:142-191).

Branch-free (the reference's NaN-recovery eigen fallback at camera.py:166-176
is replaced by Shepperd's stable 4-way max-trace selection, which is jit-safe
and never NaNs).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["q_to_R", "R_to_q", "q_invert", "q_product"]


def q_to_R(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> rotation [..., 3, 3]."""
    qa, qb, qc, qd = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (qc**2 + qd**2), 2 * (qb * qc - qa * qd), 2 * (qa * qc + qb * qd)], -1),
            jnp.stack([2 * (qb * qc + qa * qd), 1 - 2 * (qb**2 + qd**2), 2 * (qc * qd - qa * qb)], -1),
            jnp.stack([2 * (qb * qd - qa * qc), 2 * (qa * qb + qc * qd), 1 - 2 * (qb**2 + qc**2)], -1),
        ],
        axis=-2,
    )


def R_to_q(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Shepperd's method: pick the numerically largest of the four candidate
    denominators per element (replaces camera.py:152-176's NaN fallback).
    """
    R00, R01, R02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    R10, R11, R12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    R20, R21, R22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = R00 + R11 + R22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, eps))

    # candidate 0: trace-dominant
    r0 = safe_sqrt(1.0 + tr)
    q0 = jnp.stack([0.5 * r0, (R21 - R12) / (2 * r0), (R02 - R20) / (2 * r0), (R10 - R01) / (2 * r0)], -1)
    r1 = safe_sqrt(1.0 + R00 - R11 - R22)
    q1 = jnp.stack([(R21 - R12) / (2 * r1), 0.5 * r1, (R01 + R10) / (2 * r1), (R02 + R20) / (2 * r1)], -1)
    r2 = safe_sqrt(1.0 - R00 + R11 - R22)
    q2 = jnp.stack([(R02 - R20) / (2 * r2), (R01 + R10) / (2 * r2), 0.5 * r2, (R12 + R21) / (2 * r2)], -1)
    r3 = safe_sqrt(1.0 - R00 - R11 + R22)
    q3 = jnp.stack([(R10 - R01) / (2 * r3), (R02 + R20) / (2 * r3), (R12 + R21) / (2 * r3), 0.5 * r3], -1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)  # [..., 4, 4]
    scores = jnp.stack([tr, R00, R11, R22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def q_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion inverse. Ref: camera.py:178-182."""
    conj = q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / (q**2).sum(-1, keepdims=True)


def q_product(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product. Ref: camera.py:184-191."""
    a1, b1, c1, d1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    a2, b2, c2, d2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            a1 * a2 - b1 * b2 - c1 * c2 - d1 * d2,
            a1 * b2 + b1 * a2 + c1 * d2 - d1 * c2,
            a1 * c2 - b1 * d2 + c1 * a2 + d1 * b2,
            a1 * d2 + b1 * c2 - c1 * b2 + d1 * a2,
        ],
        axis=-1,
    )
