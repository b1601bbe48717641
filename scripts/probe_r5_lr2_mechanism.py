"""Round-5: name the OriginNeRF lr 1e-2 mechanism (VERDICT r4 next#6).

Round-4/5 falsified, one per probe: GradScaler step-skip (par.19b), fp16
backward-range emulation (+ skip), global-norm clip 0.5, f32 params, —
all saturate at train PSNR 1.15 with identical values, which smells like
a deterministic ATTRACTOR rather than step-size noise. Candidate: density
collapse — at lr 1e-2 the density head overshoots negative early, the
occupancy grid (EMA of network density) prunes every cell, the marcher
finds no samples, and gradients die with rgb pinned at the background.

This probe logs the live sample count and occupancy statistics through
the first blocks at lr {1e-2, 1e-3} for the flagship freq-PE MLP. If
n_samples -> 0 and mean_density -> 0 at 1e-2 while both stay healthy at
1e-3, the mechanism is named; the remaining reference delta (it trains
lego at 1e-2, README:103) is then scene/data-dependent dynamics, not a
missing framework behavior — unverifiable here (no lego images in this
environment), stated as such.

Usage: python scripts/probe_r5_lr2_mechanism.py [--steps 320]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.data.synthetic import make_detail_scene, SyntheticScene
from myc_nerfs_tpu.geom import rays as rays_lib
from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

SCALE, OFF = 0.33, 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cache = "/tmp/detail_scene_detail_36_256.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        scene = SyntheticScene(images=jnp.asarray(z["images"]),
                               poses=jnp.asarray(z["poses"]),
                               intr=jnp.asarray(z["intr"]), H=256, W=256,
                               depth_range=tuple(z["depth_range"]))
    else:
        scene = make_detail_scene(n_views=36, H=256, W=256)
    c, r = rays_lib.get_center_and_ray(scene.poses, scene.intr, 256, 256)
    d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    o = np.asarray((c * SCALE + OFF).reshape(-1, 3))
    dd = np.asarray(d.reshape(-1, 3))
    rgb = np.asarray(scene.images.reshape(-1, 3))

    for lr in (1e-2, 1e-3):
        model = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=64, n_samples=32,
                               n_compact=32, near_distance=0.05,
                               fused_march=True, compact_source="grid")
        tcfg = NGPTrainConfig(lr=lr, n_rays_per_batch=args.batch,
                              target_batch_size=1 << 18,
                              n_grid_uniform=1 << 16,
                              n_grid_nonuniform=1 << 16,
                              update_den_freq=16)
        trainer = NGPTrainer(None, rcfg, tcfg, jax.random.PRNGKey(0),
                             model=model)
        rng = np.random.default_rng(0)
        key = jax.random.PRNGKey(1)
        S = 16
        it = 0
        while it < args.steps:
            key, k1, k2 = jax.random.split(key, 3)
            trainer.state = trainer.state._replace(occ=trainer.grid_update(
                trainer.state.occ, trainer.state.params, k1))
            ids = rng.integers(0, o.shape[0], (S, args.batch))
            m = trainer.train_block(o[ids], dd[ids], rgb[ids], k2)
            it += S
            occ = trainer.state.occ
            bits = float(occ.bitfield[0].mean())
            print(json.dumps({
                "lr": lr, "step": it,
                "psnr": round(float(m["psnr"]), 2),
                "n_samples_last": int(m["n_samples"]),
                "mean_density": round(float(occ.mean_density), 6),
                "bitfield_frac_on": round(bits, 4),
                "param_finite": bool(all(
                    np.isfinite(np.asarray(l, np.float32)).all()
                    for l in jax.tree_util.tree_leaves(
                        trainer.state.params)))}), flush=True)


if __name__ == "__main__":
    main()
