"""Benchmark: flagship render throughput (rays/sec/chip) on real hardware.

Run by the driver on the TPU chip at the end of every round. Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline"}.

The flagship TPU pipeline is the MXU radiance field (OriginNeRF bf16 — zero
gathers) behind the occupancy-gated static-shape marcher; the hash-grid NGP
pipeline is measured alongside and reported inside the "detail" field (it is
XLA-gather-bound on this toolchain — full roofline in PERF_NOTES.md).

Baseline: the reference's derived throughput on an RTX 3090 — 133 iters/s x
4096 rays = 0.54 Mrays/s (jnerf-myc/README.md:96 +
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
N_RAYS = 16384
ITERS = 30


def make_rays(n):
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.cos(phi)], -1)
    rays_d = 0.5 - rays_o
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def occupancy_ball():
    from myc_nerfs_tpu.render import occupancy as occ

    occ_cfg = occ.OccupancyConfig()
    state = occ.init_occupancy(occ_cfg)
    centers = occ.cell_centers(occ_cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3  # ~7% occupancy
    return occ_cfg, state._replace(bitfield=state.bitfield.at[0].set(ball))


def measure(render_fn, params, rays_o, rays_d):
    out = render_fn(params, rays_o, rays_d)
    _ = float(out.sum())  # block_until_ready is unreliable on axon; host-read
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = render_fn(params, rays_o, rays_d)
    _ = float(out.sum())
    return N_RAYS * ITERS / (time.perf_counter() - t0)


def main():
    from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, NGPModelConfig
    from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
    from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp

    occ_cfg, occ_state = occupancy_ball()
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32)
    rays_o, rays_d = make_rays(N_RAYS)
    bg = jnp.ones((3,))

    # flagship: MXU field (zero gathers) + occupancy marcher
    flagship = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
    fparams = flagship.init(jax.random.PRNGKey(0))
    frender = jax.jit(lambda p, o, d: render_rays_ngp(
        occ_cfg, rcfg, flagship.apply, p, occ_state, o, d, bg).rgb)
    flagship_rate = measure(frender, fparams, rays_o, rays_d)

    # NGP hash pipeline (TPU-tuned L8F4 grid)
    ngp = NGPModel(NGPModelConfig(grid=HashGridConfig(n_levels=8, n_features=4)))
    nparams = ngp.init(jax.random.PRNGKey(0))
    nrender = jax.jit(lambda p, o, d: render_rays_ngp(
        occ_cfg, rcfg, ngp.apply, p, occ_state, o, d, bg).rgb)
    ngp_rate = measure(nrender, nparams, rays_o, rays_d)

    print(json.dumps({
        "metric": "flagship_render_throughput",
        "value": round(flagship_rate, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(flagship_rate / BASELINE_RAYS_PER_S, 3),
        "detail": {
            "flagship": "ori-nerf MXU field (bf16) + occupancy marcher",
            "ngp_hash_render_rays_per_s": round(ngp_rate, 1),
            "ngp_hash_vs_baseline": round(ngp_rate / BASELINE_RAYS_PER_S, 3),
            "baseline": "0.54 Mrays/s train-side, instant-ngp on RTX 3090",
        },
    }))


if __name__ == "__main__":
    main()
