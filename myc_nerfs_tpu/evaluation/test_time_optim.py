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
        se3, best, best_l, opt_state, it, min_l, min_one, loss, key = carry
        not_done = it < max_iter
        not_converged = loss >= stop_loss
        not_plateau = jnp.logical_or(it <= plateau_after, it <= min_one + patience)
        first = it == 0
        return jnp.logical_or(first, not_done & not_converged & not_plateau)

    def body(carry):
        se3, best, best_l, opt_state, it, min_l, min_one, loss, key = carry
        key, k = jax.random.split(key)
        loss, g = grad_fn(se3, k)
        # best-seen se3 is recorded BEFORE the update: if the start pose is
        # already converged (loss < stop_loss — e.g. a GT-pose sanity leg),
        # the returned correction must not carry the one Adam step the loop
        # takes before the stop condition is evaluated. The reference keeps
        # its final pose (garf.py:232-269) but never starts converged;
        # best-tracking is identical in that regime and strictly safer.
        # (strict compare here; the plateau tracker below keeps the
        # reference's improve_eps threshold)
        is_best = loss < best_l
        best = jnp.where(is_best, se3, best)
        best_l = jnp.where(is_best, loss, best_l)
        improved = loss < min_l - improve_eps
        min_one = jnp.where(improved, it, min_one)
        min_l = jnp.where(improved, loss, min_l)
        updates, opt_state = tx.update(g, opt_state, se3)
        se3 = optax.apply_updates(se3, updates)
        return (se3, best, best_l, opt_state, it + 1, min_l, min_one, loss,
                key)

    init = (se3, se3, jnp.float32(jnp.inf), opt_state,
            jnp.zeros((), jnp.int32), jnp.float32(100.0),
            jnp.zeros((), jnp.int32), jnp.float32(100.0), key)
    _, best, best_l, _, it, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    return TTOptResult(se3=best, loss=best_l, n_iters=it)


def make_ngp_pose_loss(occ_cfg, rcfg, model_apply, params, occ_state,
                       pose_w2c: jnp.ndarray, intr: jnp.ndarray,
                       image: jnp.ndarray, H: int, W: int,
                       n_rays: int = 2048,
                       world_scale: float = 1.0, world_offset: float = 0.0,
                       bg=None, density_apply=None):
    """Photometric pose loss against a trained NGP field, for use with
    :func:`test_time_pose_optim`.

    The reference applies its per-eval-image se(3) correction to MLP NeRF
    fields only (garf.py:232-269); the NGP analog lets the capability
    chain (GARF pose refinement -> NGP) evaluate eval views through the
    same protocol: correct each camera photometrically against the trained
    field before rendering, so residual per-camera pose error is removed
    the way the reference's eval does, not just the global gauge
    (prealign_cameras).

    ``pose_w2c`` [3, 4] world->cam; ``image`` [H, W, 3] the eval target;
    ``world_scale/offset`` map scene world coords into the field's unit
    AABB (the chain harness trains at x*SCALE+OFF). Returns
    ``loss_fn(se3, key)`` sampling ``n_rays`` random pixels per step.
    """
    from ..geom import lie, pose as pose_lib, rays as rays_lib
    from ..render.ngp_render import render_rays_ngp

    tgt_flat = image.reshape(-1, 3)
    grid_all = rays_lib.pixel_grid(H, W)
    if bg is None:
        bg = jnp.ones(3)
    bg = jnp.asarray(bg)

    def loss_fn(se3, key):
        corr = pose_lib.compose_pair(lie.se3_to_SE3(se3)[0], pose_w2c)
        idx = jax.random.randint(key, (n_rays,), 0, H * W)
        c, r = rays_lib.get_center_and_ray(corr[None], intr[None], H, W,
                                           xy_grid=grid_all[idx])
        d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        o = c * world_scale + world_offset
        out = render_rays_ngp(occ_cfg, rcfg, model_apply, params, occ_state,
                              o[0], d[0], bg, None,
                              density_apply=density_apply)
        return jnp.mean((out.rgb - tgt_flat[idx]) ** 2)

    return loss_fn
