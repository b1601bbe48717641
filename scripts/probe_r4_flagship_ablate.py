"""Round-4 flagship train-step knockouts (VERDICT r4 #4).

profile_flagship decomposes to MLP fwd+bwd 12.3 ms + march 7.9 ms at the
34.8 ms step — ~14.6 ms unattributed. This probe measures the REAL
train_block with targeted knockouts:
  full        the shipped step (S-step scan, no grid update)
  mlp_stub    model.apply/density replaced by a 3->4 linear (same step
              graph, negligible MLP) -> everything-but-the-MLP
  coarse64    n_coarse 128 -> 64 (march bytes halved)
  S16         16-step scan (reference update cadence) incl. grid update,
              vs the bench's steps_per_block=4
Prints ms/step per variant.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

RAYS, K = 8192, 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def sync(x):
    return float(jnp.asarray(jax.tree_util.tree_leaves(x)[0],
                             jnp.float32).sum())


class StubModel(OriginNeRFModel):
    """Same interface; the field is a 3->4 linear read off one real kernel
    slice so grads still flow to params (the step graph is unchanged)."""

    def apply(self, params, positions, dirs):
        k = params["mlp"]["params"]["pts_0"]["kernel"][:3, :4]
        return (positions @ k.astype(jnp.float32)
                + 0.1 * dirs @ k.astype(jnp.float32))

    def density_raw(self, params, positions):
        k = params["mlp"]["params"]["pts_0"]["kernel"][:3, :1]
        return positions @ k.astype(jnp.float32)


def run(tag, model, n_coarse=128, S=4, with_update=False, n_compact=None):
    st = occ.init_occupancy(occ.OccupancyConfig())
    centers = occ.cell_centers(occ.OccupancyConfig(), 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    st = st._replace(bitfield=st.bitfield.at[0].set(ball),
                     density_grid=st.density_grid.at[0].set(grid),
                     mean_density=jnp.maximum(grid, 0.0).mean())
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=n_coarse, n_samples=K,
                           **({} if n_compact is None
                              else {"n_compact": n_compact}))
    if n_compact is not None:
        # only the pass-2 override path emits a _cfg provenance line, so
        # consumers that parse every 'variant' line still see ms_step on all
        # pass-1 rows (ADVICE r4)
        emit(variant=tag + "_cfg", n_compact=rcfg.n_compact)
    tcfg = NGPTrainConfig(n_rays_per_batch=RAYS, update_den_freq=S)
    trainer = NGPTrainer(None, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
    trainer.state = trainer.state._replace(occ=st)
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (S * RAYS,)) * 6.28
    o = jnp.stack([0.5 + 1.4 * jnp.cos(theta), 0.5 + 1.4 * jnp.sin(theta),
                   jnp.full((S * RAYS,), 0.5)], -1)
    d = 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.reshape(S, RAYS, 3)
    d = d.reshape(S, RAYS, 3)
    tgt = jax.random.uniform(jax.random.fold_in(key, 7), (S, RAYS, 3))

    def block(i):
        if with_update:
            newocc = trainer.grid_update(trainer.state.occ,
                                         trainer.state.params,
                                         jax.random.fold_in(key, 100 + i))
            trainer.state = trainer.state._replace(occ=st)
        trainer.train_block(o, d, tgt, jax.random.fold_in(key, i))

    block(0)
    sync(trainer.state.params)
    t0 = time.perf_counter()
    n = 3
    for i in range(1, 1 + n):
        block(i)
    sync(trainer.state.params)
    dt = (time.perf_counter() - t0) / n / S
    emit(variant=tag, ms_step=round(dt * 1e3, 2),
         krays_s=round(RAYS / dt / 1e3, 1), S=S, n_coarse=n_coarse,
         with_update=with_update)


def run_pass2():
    """Round-4l knockouts at the CURRENT bench shape (n_coarse=64, S=16,
    with update): isolate the remaining non-MLP, non-march cost buckets —
    freq-encode transcendentals, the composite cumsum, Adam+EMA."""
    from myc_nerfs_tpu.models import ori_nerf
    from myc_nerfs_tpu.render import ngp_render
    from myc_nerfs_tpu.train import ngp_trainer as nt

    def fresh():
        return OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))

    nc = 32 if "--ncompact32" in sys.argv else None
    kw = dict(n_coarse=64, S=16, with_update=True, n_compact=nc)
    run("full_nc64_S16", fresh(), **kw)

    # --- encode knockout: same widths, bandwidth-only (no sin/cos)
    real_encode = ori_nerf.freq_encode

    def fake_encode(x, multires, include_input=True):
        w = (3 if include_input else 0) + 3 * 2 * multires
        reps = -(-w // 3)
        return jnp.concatenate([x * (0.1 * i + 0.1) for i in range(reps)],
                               -1)[..., :w]

    ori_nerf.freq_encode = fake_encode
    try:
        run("encode_stub", fresh(), **kw)
    finally:
        ori_nerf.freq_encode = real_encode

    # --- composite knockout: uniform weights, no cumsum scan
    real_cw = ngp_render.composite_weights

    def fake_cw(sigma, dt, valid=None, early_stop_eps=1e-4):
        w = sigma * dt * 1e-3  # keep grads flowing to sigma
        if valid is not None:
            w = jnp.where(valid, w, 0.0)
        return w, jnp.clip(1.0 - w.sum(-1, keepdims=True), 0.0, 1.0)

    ngp_render.composite_weights = fake_cw
    try:
        run("composite_stub", fresh(), **kw)
    finally:
        ngp_render.composite_weights = real_cw

    # --- optimizer knockout: grads still computed, Adam+EMA replaced by a
    # step-count bump (isolates optax update + debiased EMA blend)
    real_apu = nt.apply_param_update

    def fake_apu(cfg, tx, state, grads):
        # 1e-30*g keeps the backward pass live (a *0 would be folded and
        # the whole bwd DCE'd); the add itself is ~0.6M elementwise ops
        new_params = jax.tree_util.tree_map(
            lambda p, g: p + (1e-30 * g).astype(p.dtype), state.params, grads)
        return state._replace(params=new_params, step=state.step + 1)

    nt.apply_param_update = fake_apu
    try:
        run("opt_stub", fresh(), **kw)
    finally:
        nt.apply_param_update = real_apu


if __name__ == "__main__":
    if "--pass2" in sys.argv:
        run_pass2()
        sys.exit(0)
    flagship = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
    stub = StubModel(OriginNeRFConfig(skips=(), use_bf16=True))
    run("full", flagship)
    run("mlp_stub", stub)
    run("coarse64", flagship, n_coarse=64)
    run("S16_with_update", flagship, S=16, with_update=True)
    run("S4_with_update", flagship, S=4, with_update=True)
