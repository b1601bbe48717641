"""Quality parity: brick-packed + fused march vs exact reference hash layout.

Trains the same synthetic scene at the FULL reference grid config (L16F2,
2^19 params/level) under (a) the TPU-fast pipeline as shipped (brick tables,
fused march, grid-sourced truncation) and (b) the reference-shaped pipeline
(vertex-level hash tables, bitfield march, detached-network compaction).
Prints one JSON line per variant with train/val PSNR. Run on the TPU chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.geom import rays as rays_lib
from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer
from myc_nerfs_tpu.utils.metrics import psnr

SCALE, OFF = 0.33, 0.5
STEPS = 768
BATCH = 2048


def run(tag, grid_impl, fused):
    scene = make_scene(n_views=10, H=64, W=64)
    idx = jnp.array([i for i in range(10) if i != 5])
    c, r = rays_lib.get_center_and_ray(scene.poses[idx], scene.intr[idx],
                                       64, 64)
    d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    tr_o = (c * SCALE + OFF).reshape(-1, 3)
    tr_d = d.reshape(-1, 3)
    tr_rgb = scene.images[idx].reshape(-1, 3)

    mcfg = ngp.NGPModelConfig(grid=ngp.HashGridConfig(), use_bf16=True,
                              grid_impl=grid_impl)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=64,
                           n_compact=32, near_distance=0.05,
                           fused_march=fused,
                           compact_source="grid" if fused else "network")
    tcfg = NGPTrainConfig(lr=2e-2, n_rays_per_batch=BATCH,
                          target_batch_size=1 << 16,
                          n_grid_uniform=1 << 14, n_grid_nonuniform=1 << 14,
                          decay_start=10 ** 6, update_den_freq=16)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    S = tcfg.update_den_freq
    for blk in range(STEPS // S):
        # occupancy update at the reference cadence, then a 16-step block
        key, k1, k2 = jax.random.split(key, 3)
        trainer.state = trainer.state._replace(occ=trainer.grid_update(
            trainer.state.occ, trainer.state.params, k1))
        ids = rng.integers(0, tr_o.shape[0], (S, BATCH))
        m = trainer.train_block(tr_o[ids], tr_d[ids], tr_rgb[ids], k2)
    train_time = time.perf_counter() - t0

    pose = scene.poses[5]
    R, t = pose[:, :3], pose[:, 3]
    c2w = jnp.concatenate([R.T, (-R.T @ t[:, None]) * SCALE + OFF], axis=1)
    img, _ = trainer.render_image(c2w, scene.intr[5], 64, 64, chunk=4096)
    val = float(psnr(img, scene.images[5]))
    print(json.dumps({"variant": tag, "train_psnr": round(float(m["psnr"]), 2),
                      "val_psnr": round(val, 2),
                      "train_s": round(train_time, 1),
                      "steps": STEPS}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "brick"):
        run("brick_fused (shipped)", "brick", True)
    if which in ("both", "brick2"):
        run("brick2_paired_fused", "brick2", True)
    if which in ("both", "brick3"):
        run("brick3_tripled_fused", "brick3", True)
    if which in ("both", "hash"):
        run("hash_reference_shape", "hash", False)
