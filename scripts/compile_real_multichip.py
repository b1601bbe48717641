"""Round-4 gate (VERDICT r3 #7): compile + run the REAL-shape multichip
program once on the virtual 8-device CPU mesh.

The round-3 multichip evidence was all at toy grids (log2_hashmap 14,
64-256 rays); nothing ruled out a GSPMD-partitioning surprise at the real
shapes. This script builds the FULL L16F2 grid (2^19 params/level,
brick3 layout via GroupTPModel — 4 hashed triple-groups sharded over the
"model" axis) and runs ONE 16-step scan-block dispatch on a 4x2 dp x tp
mesh with the production render budget (n_coarse 128). Slow on CPU is
fine; the gate is compile + one finite step.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/compile_real_multichip.py
(sets those itself if unset)
"""
import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModelConfig
from myc_nerfs_tpu.parallel import mesh as mesh_lib, spmd
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train import ngp_trainer


def main():
    t0 = time.perf_counter()
    mesh = mesh_lib.make_mesh(jax.devices()[:8], data=4, model=2)
    # the real reference config: L16 F2 2^19/level, brick3 groups
    # (Easyship.py:85-95 budgets; tiny ray count keeps CPU runtime sane —
    # the grid/table shapes are what the gate is about)
    model_cfg = NGPModelConfig(grid=HashGridConfig(), grid_impl="brick3")
    model = spmd.GroupTPModel(model_cfg, mesh)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32)
    tcfg = ngp_trainer.NGPTrainConfig(
        n_rays_per_batch=64, target_batch_size=1 << 11,
        n_grid_uniform=1 << 12, n_grid_nonuniform=0, update_den_freq=16)
    trainer = ngp_trainer.NGPTrainer(model_cfg, rcfg, tcfg,
                                     jax.random.PRNGKey(0), model=model)
    occ_on = trainer.state.occ._replace(
        bitfield=jnp.ones_like(trainer.state.occ.bitfield),
        density_grid=jnp.full_like(trainer.state.occ.density_grid, 0.05),
        mean_density=jnp.asarray(0.05))
    state = spmd.place_ngp_state(mesh, trainer.state._replace(occ=occ_on),
                                 table_mode="groups")
    hashed = state.params["table"]["hashed"]
    print(json.dumps({"event": "placed",
                      "hashed_table_shape": list(hashed.shape),
                      "hashed_spec": str(hashed.sharding.spec),
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    S, n_rays = 16, tcfg.n_rays_per_batch
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (S * n_rays,)) * 6.28318
    ro = jnp.stack([0.5 + 1.4 * jnp.cos(theta), 0.5 + 1.4 * jnp.sin(theta),
                    jnp.full((S * n_rays,), 0.5)], -1)
    rd = 0.5 - ro
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tg = jax.random.uniform(jax.random.fold_in(key, 1), (S * n_rays, 3))
    bg = jnp.ones((S, n_rays, 3))
    ro, rd, tg = mesh_lib.shard_batch(
        mesh, ro.reshape(S, n_rays, 3), rd.reshape(S, n_rays, 3),
        tg.reshape(S, n_rays, 3), axis=1)

    block = trainer._build_block()
    t1 = time.perf_counter()
    with mesh:
        new_state, metrics, _ = block(state, ro, rd, tg, bg,
                                      jax.random.PRNGKey(7))
        loss = float(metrics["loss"])
    print(json.dumps({
        "event": "done", "mesh": dict(mesh.shape), "levels": 16,
        "log2_hashmap": 19, "grid_impl": "brick3(GroupTP)",
        "scan_steps": S, "loss": loss,
        "finite": bool(np.isfinite(loss)),
        "compile_plus_run_s": round(time.perf_counter() - t1, 1)}),
        flush=True)
    assert np.isfinite(loss)

    # second gate: the RENDER program at the same full shape, at the
    # SHIPPED render profile (K=18, eps=4.5e-3 — re-gated on the 40k ckpt,
    # PERF_NOTES par.26; supersedes the round-4 K=20/1e-2), rays DP
    # over "data" with the GroupTP tables still sharded over "model".
    # This is the program the >=2 Mrays/s multi-chip projection runs.
    rcfg_render = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=18,
                                  early_stop_eps=4.5e-3)
    t2 = time.perf_counter()
    out = spmd.multichip_ngp_render(
        mesh, trainer.occ_cfg, rcfg_render, trainer.model.apply,
        new_state.params, new_state.occ, ro[0], rd[0], jnp.ones((3,)),
        placed=True)
    rgb = np.asarray(out.rgb)
    print(json.dumps({
        "event": "render_done", "rays": int(rgb.shape[0]),
        "n_coarse": 128, "K": 18, "early_stop_eps": 4.5e-3,
        "rgb_finite": bool(np.isfinite(rgb).all()),
        "compile_plus_run_s": round(time.perf_counter() - t2, 1)}),
        flush=True)
    assert np.isfinite(rgb).all()

    # third gate: GARF at the reference's Easyship shape — 2048 rays/iter x
    # 128 samples/ray (barf-myc/options/Easyship.yaml:17,21), image-axis DP
    # over all 8 devices, pose refinement on from step 0 so the se(3)
    # correction gradients are in the compiled program.
    t3 = time.perf_counter()
    mesh_dp = mesh_lib.make_mesh(jax.devices()[:8], data=8, model=1)
    _, gmetrics = spmd.multichip_nerf_train_block(
        mesh_dp, n_images=8, size=64, n_steps=2,
        rand_rays=2048, sample_intvs=128)
    gloss = float(gmetrics["loss"])
    print(json.dumps({
        "event": "garf_done", "mesh": dict(mesh_dp.shape),
        "rand_rays": 2048, "sample_intvs": 128, "loss": gloss,
        "finite": bool(np.isfinite(gloss)),
        "compile_plus_run_s": round(time.perf_counter() - t3, 1)}),
        flush=True)
    assert np.isfinite(gloss)

    # fourth gate: TensoRF at the real Coffee end-stage shape — 300^3
    # TensorVMSplit (N_voxel_final=27e6, configs/tensorf/Coffee.txt), comps
    # 16/48, step_ratio 0.5 -> ~1033 samples/ray, ray-axis DP. Per-chip ray
    # count is a free DP parameter, so batch 1024 keeps the CPU gate sane;
    # the grid/sample/component shapes are what GSPMD partitions.
    from myc_nerfs_tpu.models import tensorf as tf_m
    from myc_nerfs_tpu.train import tensorf_trainer as tt

    t4 = time.perf_counter()
    tf_mcfg = tf_m.TensoRFConfig(
        density_n_comp=(16, 16, 16), app_n_comp=(48, 48, 48),
        near_far=(0.5, 6.0), step_ratio=0.5, shading_mode="MLP_Fea",
        view_pe=2, fea_pe=2)
    tf_tcfg = tt.TensoRFTrainConfig(
        n_iters=2, batch_size=1024, n_voxel_init=27_000_000,
        n_voxel_final=27_000_000, upsamp_list=(), update_alphamask_list=())
    tmetrics, _ = spmd.multichip_tensorf_train_block(
        mesh_dp, n_rays=1024, n_steps=2, mcfg=tf_mcfg, tcfg=tf_tcfg)
    tmse = float(tmetrics["mse"])
    print(json.dumps({
        "event": "tensorf_done", "mesh": dict(mesh_dp.shape),
        "grid": "300^3", "comps": [16, 48], "batch": 1024,
        "mse": tmse, "finite": bool(np.isfinite(tmse)),
        "compile_plus_run_s": round(time.perf_counter() - t4, 1)}),
        flush=True)
    assert np.isfinite(tmse)


if __name__ == "__main__":
    main()
