"""Benchmark: Instant-NGP render throughput (rays/sec/chip) on real hardware.

Run by the driver on the TPU chip at the end of every round. Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's derived train-side throughput on an RTX 3090 —
133 iters/s x 4096 rays = 0.54 Mrays/s (jnerf-myc/README.md:96 +
projects/ngp/configs/Easyship.py:92; BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_RAYS_PER_S = 0.54e6


def main():
    from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, NGPModelConfig
    from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp
    from myc_nerfs_tpu.render import occupancy as occ

    # TPU-tuned NGP config: 8 levels x 4 features (same 32-dim encoding,
    # half the gather rows; measured PSNR-neutral-or-better — PERF_NOTES.md)
    model_cfg = NGPModelConfig(grid=HashGridConfig(n_levels=8, n_features=4))
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32)
    occ_cfg = occ.OccupancyConfig()
    model = NGPModel(model_cfg)
    params = model.init(jax.random.PRNGKey(0))
    occ_state = occ.init_occupancy(occ_cfg)
    centers = occ.cell_centers(occ_cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3  # ~7% occupancy
    occ_state = occ_state._replace(bitfield=occ_state.bitfield.at[0].set(ball))

    n_rays = 16384
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (n_rays,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n_rays,)) * 3.14159
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.cos(phi)], -1)
    rays_d = 0.5 - rays_o
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    bg = jnp.ones((3,))

    @jax.jit
    def render(params, rays_o, rays_d):
        return render_rays_ngp(occ_cfg, rcfg, model.apply, params, occ_state,
                               rays_o, rays_d, bg, None).rgb

    # warmup/compile; force a host read — block_until_ready does not reliably
    # block on the axon TPU tunnel
    out = render(params, rays_o, rays_d)
    _ = float(out.sum())

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(params, rays_o, rays_d)
    _ = float(out.sum())  # drains the sequential device queue
    dt = time.perf_counter() - t0
    rays_per_s = n_rays * iters / dt

    print(json.dumps({
        "metric": "ngp_render_throughput",
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
