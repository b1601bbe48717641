"""SO(3)/SE(3) Lie-group exp/log maps, Taylor-stabilised near theta=0.

TPU-native re-implementation of the BARF camera algebra
(reference behavior: barf-myc/camera.py:61-140). All functions are pure
jax.numpy over batched inputs ``[..., 3]`` / ``[..., 3, 3]`` / ``[..., 3, 4]``
and are safe under jit/vmap/grad (branch-free Taylor series instead of
data-dependent control flow, so gradients at theta=0 are exact).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "skew",
    "taylor_A",
    "taylor_B",
    "taylor_C",
    "so3_to_SO3",
    "SO3_to_so3",
    "se3_to_SE3",
    "SE3_to_se3",
]


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x of w [..., 3] -> [..., 3, 3]."""
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    O = jnp.zeros_like(w0)
    return jnp.stack(
        [
            jnp.stack([O, -w2, w1], axis=-1),
            jnp.stack([w2, O, -w0], axis=-1),
            jnp.stack([-w1, w0, O], axis=-1),
        ],
        axis=-2,
    )


def _taylor_series_sq(x2: jnp.ndarray, denom_step, nth: int) -> jnp.ndarray:
    """Alternating even-power Taylor series sum_i (-1)^i (x^2)^i / denom(i).

    Takes theta^2 directly so callers never need a sqrt — this keeps gradients
    exact (not NaN) at theta=0, unlike norm-then-series.
    """
    ans = jnp.zeros_like(x2)
    denom = 1.0
    xp = jnp.ones_like(x2)
    for i in range(nth + 1):
        denom = denom_step(denom, i)
        ans = ans + ((-1.0) ** i) * xp / denom
        xp = xp * x2
    return ans


def _A_sq(x2, nth=10):
    return _taylor_series_sq(x2, lambda d, i: d * (2 * i) * (2 * i + 1) if i > 0 else d, nth)


def _B_sq(x2, nth=10):
    return _taylor_series_sq(x2, lambda d, i: d * (2 * i + 1) * (2 * i + 2), nth)


def _C_sq(x2, nth=10):
    return _taylor_series_sq(x2, lambda d, i: d * (2 * i + 2) * (2 * i + 3), nth)


def taylor_A(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """sin(x)/x via Taylor series (stable at 0). Ref: camera.py:117-124."""
    return _A_sq(x * x, nth)


def taylor_B(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(1-cos(x))/x^2 via Taylor series. Ref: camera.py:125-132."""
    return _B_sq(x * x, nth)


def taylor_C(x: jnp.ndarray, nth: int = 10) -> jnp.ndarray:
    """(x-sin(x))/x^3 via Taylor series. Ref: camera.py:133-140."""
    return _C_sq(x * x, nth)


def so3_to_SO3(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3)->SO(3): w [..., 3] -> R [..., 3, 3].

    R = I + A [w]_x + B [w]_x^2 (Rodrigues). Ref: camera.py:66-73.
    """
    wx = skew(w)
    theta2 = (w * w).sum(-1)[..., None, None]
    I = jnp.eye(3, dtype=w.dtype)
    A = _A_sq(theta2)
    B = _B_sq(theta2)
    return I + A * wx + B * (wx @ wx)


def SO3_to_so3(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Log map SO(3)->so(3): R [..., 3, 3] -> w [..., 3]. Ref: camera.py:75-81."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0 + eps, 1.0 - eps))
    theta = jnp.mod(theta, np.pi)[..., None, None]
    lnR = 1.0 / (2.0 * taylor_A(theta) + 1e-8) * (R - jnp.swapaxes(R, -1, -2))
    return jnp.stack([lnR[..., 2, 1], lnR[..., 0, 2], lnR[..., 1, 0]], axis=-1)


def se3_to_SE3(wu: jnp.ndarray) -> jnp.ndarray:
    """Exp map se(3)->SE(3): wu [..., 6] (rot w | trans u) -> [..., 3, 4].

    R = exp([w]_x), t = V u with V = I + B [w]_x + C [w]_x^2.
    Ref: camera.py:83-94.
    """
    w, u = wu[..., :3], wu[..., 3:]
    wx = skew(w)
    theta2 = (w * w).sum(-1)[..., None, None]
    I = jnp.eye(3, dtype=wu.dtype)
    A = _A_sq(theta2)
    B = _B_sq(theta2)
    C = _C_sq(theta2)
    R = I + A * wx + B * (wx @ wx)
    V = I + B * wx + C * (wx @ wx)
    t = (V @ u[..., None])
    return jnp.concatenate([R, t], axis=-1)


def SE3_to_se3(Rt: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Log map SE(3)->se(3): [..., 3, 4] -> [..., 6]. Ref: camera.py:96-107."""
    R, t = Rt[..., :3], Rt[..., 3:]
    w = SO3_to_so3(R)
    wx = skew(w)
    theta2 = (w * w).sum(-1)[..., None, None]
    I = jnp.eye(3, dtype=Rt.dtype)
    A = _A_sq(theta2)
    B = _B_sq(theta2)
    invV = I - 0.5 * wx + (1.0 - A / (2.0 * B)) / (theta2 + eps) * (wx @ wx)
    u = (invV @ t)[..., 0]
    return jnp.concatenate([w, u], axis=-1)
