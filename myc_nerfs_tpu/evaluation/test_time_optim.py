"""Test-time photometric pose optimization (jitted inner loop).

TPU-native re-implementation of barf-myc/model/garf.py
evaluate_test_time_photometric_optim (garf.py:232-269): a fresh se(3)
correction per eval image is optimized against the photometric loss with
Adam, with the reference's early-stop heuristics:

- hard stop when loss < ``stop_loss`` (7e-4 in garf, none in barf)
- plateau stop when it > ``plateau_after`` (1500) and no improvement by more
  than ``improve_eps`` (1e-4) for ``patience`` (200) iterations
- cap at ``max_iter`` (10000)

The reference runs this as a Python loop with one optimizer step per launch;
here it is a single ``lax.while_loop`` compiled once — no host round-trips.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class TTOptResult(NamedTuple):
    se3: jnp.ndarray
    loss: jnp.ndarray
    n_iters: jnp.ndarray


def test_time_pose_optim(
    loss_fn: Callable[[jnp.ndarray, jax.Array], jnp.ndarray],
    key: jax.Array,
    lr: float,
    max_iter: int = 10000,
    stop_loss: float = 7e-4,
    plateau_after: int = 1500,
    patience: int = 200,
    improve_eps: float = 1e-4,
    se3_init: jnp.ndarray | None = None,
) -> TTOptResult:
    """Optimize a [1, 6] se3 correction by Adam with GARF early stopping.

    ``loss_fn(se3, key)`` renders with the corrected pose and returns a
    scalar photometric loss. Entirely jit-compatible.
    """
    se3 = jnp.zeros((1, 6)) if se3_init is None else se3_init
    tx = optax.adam(lr)
    opt_state = tx.init(se3)
    grad_fn = jax.value_and_grad(loss_fn)

    def cond(carry):
        se3, opt_state, it, min_l, min_one, loss, key = carry
        not_done = it < max_iter
        not_converged = loss >= stop_loss
        not_plateau = jnp.logical_or(it <= plateau_after, it <= min_one + patience)
        first = it == 0
        return jnp.logical_or(first, not_done & not_converged & not_plateau)

    def body(carry):
        se3, opt_state, it, min_l, min_one, loss, key = carry
        key, k = jax.random.split(key)
        loss, g = grad_fn(se3, k)
        updates, opt_state = tx.update(g, opt_state, se3)
        se3 = optax.apply_updates(se3, updates)
        improved = loss < min_l - improve_eps
        min_one = jnp.where(improved, it, min_one)
        min_l = jnp.where(improved, loss, min_l)
        return (se3, opt_state, it + 1, min_l, min_one, loss, key)

    init = (se3, opt_state, jnp.zeros((), jnp.int32), jnp.float32(100.0),
            jnp.zeros((), jnp.int32), jnp.float32(100.0), key)
    se3, _, it, _, _, loss, _ = jax.lax.while_loop(cond, body, init)
    return TTOptResult(se3=se3, loss=loss, n_iters=it)
