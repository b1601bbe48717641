"""SPMD train/render helpers: place state + batches on a mesh and step.

With GSPMD, the single-chip jitted step functions are already multi-chip
programs: placing the ray batch with data-axis sharding and the params
replicated (or table-sharded) makes XLA partition the computation and insert
the gradient psum over ICI. These helpers do the placement and expose a
full multi-chip NGP training step for tests and the driver's dry run.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.ngp import HashGridConfig, NGPModel, NGPModelConfig
from ..render.ngp_render import NGPRenderConfig
from ..train import ngp_trainer
from . import mesh as mesh_lib


def place_ngp_state(mesh, state: ngp_trainer.NGPTrainState,
                    shard_table: bool = True) -> ngp_trainer.NGPTrainState:
    """Replicate the train state; optionally shard hash-table rows (TP)."""
    rep = mesh_lib.replicated(mesh)

    n_model = mesh.shape.get("model", 1)

    def place(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        # brick tables are per-level arrays; dense levels can have odd row
        # counts (e.g. 11^3) — shard only evenly divisible tables (the big
        # hashed levels are power-of-two), replicate the rest
        if shard_table and "table" in names and hasattr(leaf, "shape") \
                and leaf.ndim >= 2 and leaf.shape[0] % max(n_model, 1) == 0:
            return jax.device_put(leaf, mesh_lib.table_sharding(mesh))
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, state)


def multichip_ngp_train_step(mesh, n_rays: int = 256,
                             shard_table: bool = True,
                             model_cfg: Optional[NGPModelConfig] = None,
                             rcfg: Optional[NGPRenderConfig] = None,
                             tcfg: Optional[ngp_trainer.NGPTrainConfig] = None,
                             seed: int = 0):
    """Build + run ONE full multi-chip NGP training step on tiny shapes.

    Exercises dp (rays over "data"), tp (hash-table rows over "model"),
    replicated-MLP gradient psum, and the occupancy-gated marcher under
    GSPMD. Returns (state, metrics). Used by tests and __graft_entry__'s
    dryrun_multichip.
    """
    model_cfg = model_cfg or NGPModelConfig(
        grid=HashGridConfig(n_levels=4, desired_resolution=64.0))
    rcfg = rcfg or NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8)
    tcfg = tcfg or ngp_trainer.NGPTrainConfig(
        n_rays_per_batch=n_rays, target_batch_size=1 << 10,
        n_grid_uniform=1 << 10, n_grid_nonuniform=0)
    trainer = ngp_trainer.NGPTrainer(model_cfg, rcfg, tcfg,
                                     jax.random.PRNGKey(seed))
    # make some occupancy so the marcher/MLP actually run (density grid too:
    # the fused march probes it rather than the bitfield)
    occ_on = trainer.state.occ._replace(
        bitfield=jnp.ones_like(trainer.state.occ.bitfield),
        density_grid=jnp.full_like(trainer.state.occ.density_grid, 0.05),
        mean_density=jnp.asarray(0.05))
    state = place_ngp_state(mesh, trainer.state._replace(occ=occ_on),
                            shard_table=shard_table)

    key = jax.random.PRNGKey(seed + 1)
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n_rays,)) * 6.28318
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta), 0.5 + 1.4 * jnp.sin(theta),
                        jnp.full((n_rays,), 0.5)], -1)
    rays_d = (0.5 - rays_o)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = jax.random.uniform(k2, (n_rays, 3))
    bg = jnp.ones((3,))
    rays_o, rays_d, target = mesh_lib.shard_batch(mesh, rays_o, rays_d, target)

    with mesh:
        new_state, metrics = trainer._step_fn(state, rays_o, rays_d, target,
                                              bg, jax.random.PRNGKey(7))
        jax.block_until_ready(metrics["loss"])
    return new_state, metrics


def multichip_ngp_train_block(mesh, n_rays: int = 256, n_steps: int = 4,
                              shard_table: bool = True, seed: int = 0):
    """The production dispatch shape under GSPMD: an n_steps lax.scan train
    block (NGPTrainer._build_block) with rays dp-sharded and (optionally)
    brick tables tp-sharded. Returns (state, last-step metrics)."""
    model_cfg = NGPModelConfig(
        grid=HashGridConfig(n_levels=4, desired_resolution=64.0))
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8)
    tcfg = ngp_trainer.NGPTrainConfig(
        n_rays_per_batch=n_rays, target_batch_size=1 << 10,
        n_grid_uniform=1 << 10, n_grid_nonuniform=0)
    trainer = ngp_trainer.NGPTrainer(model_cfg, rcfg, tcfg,
                                     jax.random.PRNGKey(seed))
    occ_on = trainer.state.occ._replace(
        bitfield=jnp.ones_like(trainer.state.occ.bitfield),
        density_grid=jnp.full_like(trainer.state.occ.density_grid, 0.05),
        mean_density=jnp.asarray(0.05))
    state = place_ngp_state(mesh, trainer.state._replace(occ=occ_on),
                            shard_table=shard_table)

    key = jax.random.PRNGKey(seed + 1)
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n_steps * n_rays,)) * 6.28318
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta), 0.5 + 1.4 * jnp.sin(theta),
                        jnp.full((n_steps * n_rays,), 0.5)], -1)
    rays_d = (0.5 - rays_o)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    target = jax.random.uniform(k2, (n_steps * n_rays, 3))
    bg = jnp.ones((n_steps, n_rays, 3))
    ro, rd, tg = mesh_lib.shard_batch(
        mesh, rays_o.reshape(n_steps, n_rays, 3),
        rays_d.reshape(n_steps, n_rays, 3),
        target.reshape(n_steps, n_rays, 3), axis=1)

    block = trainer._build_block()
    with mesh:
        new_state, metrics, n_total = block(state, ro, rd, tg, bg,
                                            jax.random.PRNGKey(7))
        jax.block_until_ready(metrics["loss"])
    return new_state, metrics
