"""SPMD train/render helpers: place state + batches on a mesh and step.

With GSPMD, the single-chip jitted step functions are already multi-chip
programs: placing the ray batch with data-axis sharding and the params
replicated (or table-sharded) makes XLA partition the computation and insert
the gradient psum over ICI. These helpers do the placement and expose a
full multi-chip NGP training step for tests and the driver's dry run.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax>=0.4.35 top-level export
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..models.ngp import HashGridConfig, NGPModel, NGPModelConfig
from ..render.ngp_render import NGPRenderConfig
from ..train import ngp_trainer
from . import mesh as mesh_lib


def place_ngp_state(mesh, state: ngp_trainer.NGPTrainState,
                    shard_table: bool = True,
                    table_mode: Optional[str] = None) -> ngp_trainer.NGPTrainState:
    """Replicate the train state; optionally shard hash tables (TP).

    table_mode: 'rows' shards each table's rows over "model" (legacy —
    every gather becomes cross-chip); 'levels' shards a LevelTPModel's
    stacked hashed-level axis over "model" (each chip owns whole levels,
    gathers stay local — VERDICT r2 #4); 'replicated' replicates.
    Default keeps the old shard_table boolean semantics ('rows').
    """
    rep = mesh_lib.replicated(mesh)
    if table_mode is None:
        table_mode = "rows" if shard_table else "replicated"
    n_model = mesh.shape.get("model", 1)

    def place(path, leaf):
        names = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if table_mode == "levels" and "hashed" in names \
                and hasattr(leaf, "shape") and leaf.ndim == 3:
            return jax.device_put(
                leaf, NamedSharding(mesh, P("model", None, None)))
        # brick tables are per-level arrays; dense levels can have odd row
        # counts (e.g. 11^3) — shard only evenly divisible tables (the big
        # hashed levels are power-of-two), replicate the rest
        if table_mode == "rows" and "table" in names and hasattr(leaf, "shape") \
                and leaf.ndim >= 2 and leaf.shape[0] % max(n_model, 1) == 0:
            return jax.device_put(leaf, mesh_lib.table_sharding(mesh))
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(place, state)


class LevelTPModel(NGPModel):
    """NGP model whose hashed brick levels are sharded WHOLE-LEVEL over the
    mesh "model" axis (VERDICT r2 #4).

    Row-sharding the brick tables makes every per-sample gather a
    cross-chip access. Here each model-chip owns len(hashed)/n_model
    complete level tables (stacked [Lh, rows, width], sharded on axis 0),
    so gathers and the backward scatter-adds stay chip-local; the only
    collective in the encode is the feature block all-gather implied by
    ``out_specs=P("data", "model")`` — one [n_local, F*Lh_local] block per
    chip per apply. Dense (coarse) levels are small and replicated,
    encoded by the plain brick path.

    Matches SURVEY §2.5's TP row; the reference has no multi-GPU support
    at all (barf-myc/options.py:102).
    """

    def __init__(self, cfg: NGPModelConfig, mesh):
        # TP shards WHOLE levels, so the layout must be per-level tables
        # ('brick'). The level-tripled 'brick3' rows (PERF_NOTES §7) are a
        # single-chip HBM-scatter optimization whose triples straddle the
        # level shard boundary; under TP each chip's local levels use the
        # per-level layout instead.
        if cfg.grid_impl != "brick":
            cfg = dataclasses.replace(cfg, grid_impl="brick")
        super().__init__(cfg)
        from ..ops import brick_grid as bg

        self.mesh = mesh
        lv = self.levels
        self.dense_ids = [l for l in range(lv.n_levels) if lv.dense[l]]
        self.hashed_ids = [l for l in range(lv.n_levels) if not lv.dense[l]]
        nm = mesh.shape.get("model", 1)
        assert self.hashed_ids, "grid has no hashed levels to shard"
        assert len(self.hashed_ids) % nm == 0, \
            f"{len(self.hashed_ids)} hashed levels not divisible by model={nm}"
        assert self.dense_ids == list(range(len(self.dense_ids))), \
            "dense levels must be the contiguous coarse prefix"
        nd_ = len(self.dense_ids)
        self.dense_levels = bg.BrickLevels(
            scales=lv.scales[:nd_], resolutions=lv.resolutions[:nd_],
            brick_dims=lv.brick_dims[:nd_], dense=lv.dense[:nd_],
            n_bricks=lv.n_bricks[:nd_],
            bricks_per_level=lv.bricks_per_level, n_levels=nd_)
        self.dense_cfg = dataclasses.replace(cfg.grid, n_levels=nd_)
        self._enc_dtype = jnp.bfloat16 if cfg.use_bf16 else None
        self._encode = self._tp_encode  # type: ignore[assignment]

    def init(self, key: jax.Array):
        params = super().init(key)
        tabs = params["table"]
        return {"table": {"dense": [tabs[l] for l in self.dense_ids],
                          "hashed": jnp.stack([tabs[l]
                                               for l in self.hashed_ids])},
                "mlp": params["mlp"]}

    def _tp_encode(self, table, positions):
        from ..ops import brick_grid as bg

        shape = positions.shape[:-1]
        pos = jax.lax.stop_gradient(positions.reshape(-1, 3))
        dense_out = bg.brick_encode(
            table["dense"], pos, self.dense_cfg, self.dense_levels,
            compute_dtype=self._enc_dtype)
        hashed_out = self._hashed_tp(table["hashed"], pos)
        out = jnp.concatenate([dense_out,
                               hashed_out.astype(dense_out.dtype)], -1)
        return out.reshape(shape + (self.cfg.grid.out_dim,))

    def _hashed_tp(self, stacked: jnp.ndarray, pos: jnp.ndarray):
        from ..ops import brick_grid as bg

        lv = self.levels
        F = self.cfg.grid.n_features
        R = stacked.shape[1]
        assert R & (R - 1) == 0
        wdtype = self._enc_dtype or stacked.dtype
        scales = jnp.asarray([lv.scales[l] for l in self.hashed_ids],
                             pos.dtype)

        def local_enc(tabs, scales_l, p):
            # tabs [L_local, R, F*128] (this chip's whole levels),
            # scales_l [L_local], p [n_local, 3] — same brick layout math
            # as brick_encode, via the shared brick_grid helpers
            brick, u = bg.brick_coords(p, scales_l)
            idx = (bg.hash_bricks(brick)
                   & np.uint32(R - 1)).astype(jnp.int32)
            hat = bg.hat_tents(u, wdtype)
            outs = []
            for l in range(tabs.shape[0]):
                wl = bg.combine_tents(hat[:, l])
                rows = tabs[l].astype(wdtype)[idx[:, l]]
                for f in range(F):
                    outs.append((rows[:, f * bg.ROW_VERTS:
                                      (f + 1) * bg.ROW_VERTS] * wl).sum(-1))
            return jnp.stack(outs, -1)  # [n_local, L_local*F]

        f = shard_map(local_enc, mesh=self.mesh,
                      in_specs=(P("model", None, None), P("model"),
                                P("data", None)),
                      out_specs=P("data", "model"))
        return f(stacked, scales, pos)


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
                              shard_table: bool = True, seed: int = 0,
                              table_mode: Optional[str] = None):
    """The production dispatch shape under GSPMD: an n_steps lax.scan train
    block (NGPTrainer._build_block) with rays dp-sharded and brick tables
    tp-sharded. table_mode 'levels' uses LevelTPModel (whole-level
    sharding, chip-local gathers); 'rows'/'replicated' use the plain model.
    Returns (state, last-step metrics)."""
    if table_mode == "levels":
        # a grid with hashed levels (the sharded ones): 1 dense + 4 hashed
        model_cfg = NGPModelConfig(
            grid=HashGridConfig(n_levels=5, log2_hashmap_size=14,
                                desired_resolution=256.0))
    else:
        model_cfg = NGPModelConfig(
            grid=HashGridConfig(n_levels=4, desired_resolution=64.0))
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8)
    tcfg = ngp_trainer.NGPTrainConfig(
        n_rays_per_batch=n_rays, target_batch_size=1 << 10,
        n_grid_uniform=1 << 10, n_grid_nonuniform=0)
    model = (LevelTPModel(model_cfg, mesh) if table_mode == "levels"
             else None)
    trainer = ngp_trainer.NGPTrainer(model_cfg, rcfg, tcfg,
                                     jax.random.PRNGKey(seed), model=model)
    occ_on = trainer.state.occ._replace(
        bitfield=jnp.ones_like(trainer.state.occ.bitfield),
        density_grid=jnp.full_like(trainer.state.occ.density_grid, 0.05),
        mean_density=jnp.asarray(0.05))
    state = place_ngp_state(mesh, trainer.state._replace(occ=occ_on),
                            shard_table=shard_table, table_mode=table_mode)

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
