"""Round-3 quality runs at reference scale (VERDICT r2 #3).

Trains the full L16F2 (2^19 params/level) NGP pipeline on the detail-rich
procedural scene (256^2, 36 views, three elevation rings, high-frequency
texture — data/synthetic.make_detail_scene) and reports val PSNR on three
held-out views. Variants:

  --variant brick    shipped brick tables + fused march
  --variant brick2   paired-level brick tables + fused march (round-3)
  --variant brick3   triple-level brick tables + fused march (round-3)
  --variant hash     reference-shaped vertex hash + bitfield march +
                     detached-network compaction (slow; the parity anchor)

  --scene outer --aabb_scale 4   cascaded occupancy run: content outside
                                 the unit AABB (the torus), 5 cascades like
                                 Car/Easyship (configs/Easyship.py:39-41)

Prints one JSON line: {variant, steps, train_psnr, val_psnr, wall_s}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.data.synthetic import make_detail_scene
from myc_nerfs_tpu.geom import rays as rays_lib
from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer
from myc_nerfs_tpu.utils.metrics import psnr

SCALE, OFF = 0.33, 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="brick2",
                    choices=["brick", "brick2", "brick3", "hash",
                             "flagship"])
    ap.add_argument("--lr", type=float, default=1e-2,
                    help="1e-2 = the reference value for both NGP "
                         "(Easyship.py:84) and OriginNeRF (nerf_base.py); "
                         "the flagship freq-PE MLP saturates at 1e-2 under "
                         "plain Adam (the reference escapes via its fp16 "
                         "GradScaler's skip-step) — use ~1e-3 for flagship "
                         "quality runs")
    ap.add_argument("--n_coarse", type=int, default=128,
                    help="coarse march probes per ray (train-time sample "
                         "placement; 64 is the candidate fast setting from "
                         "PERF_NOTES par.9c, gated on this script's val "
                         "PSNR matching the 128 run)")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--scene", default="detail",
                    choices=["detail", "outer", "cascade"])
    ap.add_argument("--aabb_scale", type=int, default=1)
    ap.add_argument("--views", type=int, default=36)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--n_compact", type=int, default=20,
                    help="live samples per ray (20 = shipped quality-gated "
                         "default; larger for aabb_scale>1 evidence runs)")
    ap.add_argument("--fp16_forward", action="store_true",
                    help="fp16 FORWARD overflow parity for the flagship "
                         "(raw density > 11.09 poisons the step to nan; "
                         "with --fp16_grads' skip the step is rejected — "
                         "the reference's amp-level-5 mechanism)")
    ap.add_argument("--f32", action="store_true",
                    help="f32 params/activations for the flagship (probe: "
                         "is bf16's 7-bit mantissa the lr 1e-2 mechanism?)")
    ap.add_argument("--fp16_grads", action="store_true",
                    help="emulate the reference's fp16 backward numerics "
                         "(grads scaled, cast through float16, unscaled) + "
                         "GradScaler step-skip — the lr 1e-2 mechanism "
                         "probe (VERDICT r4 weak#4)")
    ap.add_argument("--clip_gn", type=float, default=0.0,
                    help="global-norm grad clip (0 = off; diagnostic)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear lr warmup steps (0 = off; diagnostic)")
    ap.add_argument("--nc_schedule", default="",
                    help="staged march budget, e.g. '0:20,20000:32' — "
                         "n_compact switches at each from_step boundary "
                         "(NGPTrainConfig.n_compact_schedule; staged re-jit)")
    ap.add_argument("--val_every", type=int, default=0,
                    help="if >0, log val PSNR of view 0 at this cadence")
    ap.add_argument("--dump", default="",
                    help="dir for val PNG dumps (optional)")
    ap.add_argument("--ckpt", default="",
                    help="checkpoint path for kill-and-resume runs")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--render_video", default="",
                    help="after training, render a spherical-path video to "
                         "this path (Runner.render parity)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (smoke tests; overrides the axon pin)")
    ap.add_argument("--no_scan", action="store_true",
                    help="single-step dispatches instead of the 16-step "
                         "lax.scan block (16x smaller program — fallback "
                         "when the remote compiler chokes on the big "
                         "vertex-hash scan body)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    t_scene = time.perf_counter()
    cache = f"/tmp/detail_scene_{args.scene}_{args.views}_{args.size}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        from myc_nerfs_tpu.data.synthetic import SyntheticScene

        scene = SyntheticScene(images=jnp.asarray(z["images"]),
                               poses=jnp.asarray(z["poses"]),
                               intr=jnp.asarray(z["intr"]),
                               H=args.size, W=args.size,
                               depth_range=tuple(z["depth_range"]))
    else:
        if args.scene == "cascade":
            from myc_nerfs_tpu.data.synthetic import make_cascade_scene

            scene = make_cascade_scene(n_views=args.views, H=args.size,
                                       W=args.size)
        else:
            scene = make_detail_scene(n_views=args.views, H=args.size,
                                      W=args.size,
                                      outer=(args.scene == "outer"))
        np.savez(cache, images=np.asarray(scene.images),
                 poses=np.asarray(scene.poses),
                 intr=np.asarray(scene.intr),
                 depth_range=np.asarray(scene.depth_range))
    H = W = args.size
    if args.scene == "cascade":
        # one held-out view per ring (4 rings x views/4 each,
        # make_cascade_scene); offset 1 keeps ring phase-0 views in train
        per = args.views // 4
        val_ids = [1, per + 1, 2 * per + 1, 3 * per + 1]
    else:
        val_ids = [0, args.views // 3, 2 * args.views // 3]
    train_ids = [i for i in range(args.views) if i not in val_ids]
    idx = jnp.asarray(train_ids)
    c, r = rays_lib.get_center_and_ray(scene.poses[idx], scene.intr[idx],
                                       H, W)
    d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    tr_o = np.asarray((c * SCALE + OFF).reshape(-1, 3))
    tr_d = np.asarray(d.reshape(-1, 3))
    tr_rgb = np.asarray(scene.images[idx].reshape(-1, 3))
    print(json.dumps({"event": "scene_ready",
                      "wall_s": round(time.perf_counter() - t_scene, 1),
                      "train_rays": int(tr_o.shape[0])}), flush=True)

    grid_impl = {"hash": "hash", "flagship": "brick3"}.get(
        args.variant, args.variant)
    fused = args.variant != "hash"
    # reference level derivation: desired resolution scales with aabb_scale
    # (grid_encode.py:18-35 via configs' aabb_scale)
    mcfg = ngp.NGPModelConfig(
        grid=ngp.HashGridConfig(aabb_scale=args.aabb_scale),
        use_bf16=True, grid_impl=grid_impl)
    rcfg = NGPRenderConfig(
        aabb_scale=args.aabb_scale, n_coarse=args.n_coarse, n_samples=64,
        n_compact=args.n_compact,
        near_distance=0.05, fused_march=fused,
        compact_source="grid" if fused else "network")
    nc_sched = None
    if args.nc_schedule:
        nc_sched = tuple(
            (int(p.split(":")[0]), int(p.split(":")[1]))
            for p in args.nc_schedule.split(","))
    tcfg = NGPTrainConfig(lr=args.lr, n_rays_per_batch=args.batch,
                          target_batch_size=1 << 18,
                          n_grid_uniform=1 << 16, n_grid_nonuniform=1 << 16,
                          decay_start=20000, update_den_freq=16,
                          tot_train_steps=args.steps,
                          n_compact_schedule=nc_sched,
                          fp16_grads=args.fp16_grads,
                          skip_nonfinite=args.fp16_grads or args.fp16_forward,
                          clip_grad_norm=args.clip_gn,
                          warmup_steps=args.warmup)
    model = None
    if args.variant == "flagship":
        # the zero-gather MXU field behind the same marcher (bench flagship)
        from myc_nerfs_tpu.models.ori_nerf import (OriginNeRFConfig,
                                                   OriginNeRFModel)

        model = OriginNeRFModel(OriginNeRFConfig(
            skips=(), use_bf16=not args.f32,
            fp16_overflow_parity=args.fp16_forward))
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0),
                         model=model)

    start_step = 0
    if args.resume and args.ckpt and os.path.exists(args.ckpt):
        from myc_nerfs_tpu.core.checkpoint import restore_checkpoint

        trainer.state, meta = restore_checkpoint(args.ckpt, trainer.state)
        start_step = int(meta.get("step", 0))
        trainer.set_host_step(start_step)
        print(json.dumps({"event": "resumed", "step": start_step}),
              flush=True)

    def val_psnr(n_views_val=None):
        n_views_val = n_views_val or len(val_ids)
        ps = []
        for vi in val_ids[:n_views_val]:
            pose = scene.poses[vi]
            R, t = pose[:, :3], pose[:, 3]
            c2w = jnp.concatenate([R.T, (-R.T @ t[:, None]) * SCALE + OFF], 1)
            img, _ = trainer.render_image(c2w, scene.intr[vi], H, W,
                                          chunk=8192)
            ps.append(float(psnr(jnp.clip(img, 0, 1), scene.images[vi])))
            if args.dump:
                from PIL import Image

                os.makedirs(args.dump, exist_ok=True)
                arr = np.asarray(jnp.clip(img, 0, 1))
                Image.fromarray((arr * 255).astype(np.uint8)).save(
                    os.path.join(args.dump,
                                 f"{args.variant}_v{vi}.png"))
        return ps

    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(0)
    S = tcfg.update_den_freq
    t0 = time.perf_counter()
    it = start_step
    m = {"psnr": jnp.asarray(0.0)}
    while it < args.steps:
        key, k1, k2 = jax.random.split(key, 3)
        trainer.state = trainer.state._replace(occ=trainer.grid_update(
            trainer.state.occ, trainer.state.params, k1))
        ids = rng.integers(0, tr_o.shape[0], (S, args.batch))
        if args.no_scan:
            for s_i in range(S):
                k2, ks = jax.random.split(k2)
                trainer.state, m = trainer._step_fn(
                    trainer.state, jnp.asarray(tr_o[ids[s_i]]),
                    jnp.asarray(tr_d[ids[s_i]]),
                    jnp.asarray(tr_rgb[ids[s_i]]),
                    jnp.asarray(tcfg.background_color), ks)
        else:
            m = trainer.train_block(tr_o[ids], tr_d[ids], tr_rgb[ids], k2)
        it += S
        if args.val_every and it % args.val_every < S:
            p0 = val_psnr(1)[0]
            print(json.dumps({"event": "val", "step": it,
                              "train_psnr": round(float(m["psnr"]), 2),
                              "val_psnr": round(p0, 2),
                              "wall_s": round(time.perf_counter() - t0, 1)}),
                  flush=True)
        if args.ckpt and it % 2048 < S:
            from myc_nerfs_tpu.core.checkpoint import save_checkpoint

            save_checkpoint(args.ckpt, trainer.state, step=it)
    wall = time.perf_counter() - t0

    ps = val_psnr()
    if args.ckpt:
        from myc_nerfs_tpu.core.checkpoint import save_checkpoint

        save_checkpoint(args.ckpt, trainer.state, step=it)
    print(json.dumps({
        "variant": args.variant, "scene": args.scene,
        "aabb_scale": args.aabb_scale, "n_compact": args.n_compact,
        "n_coarse": args.n_coarse, "steps": it,
        "train_psnr": round(float(m["psnr"]), 2),
        "val_psnr": round(float(np.mean(ps)), 2),
        "val_psnrs": [round(p, 2) for p in ps],
        "wall_s": round(wall, 1),
        "krays_s": round(args.batch * (it - start_step) / max(wall, 1e-9)
                         / 1e3, 1)}), flush=True)

    if args.render_video:
        # render task after training (Runner.render parity: spherical path,
        # runner.py:105-125) — part of the reference-budget gate (r4 #3a)
        from myc_nerfs_tpu.evaluation.visualization import write_video
        from myc_nerfs_tpu.geom.camera_path import path_spherical

        frames = []
        for c2w in path_spherical(8):
            rgb, _ = trainer.render_image(jnp.asarray(c2w), scene.intr[0],
                                          H, W, chunk=8192)
            frames.append(np.asarray(jnp.clip(rgb, 0, 1)))
        out = write_video(args.render_video, frames, fps=8)
        print(json.dumps({"event": "render_video",
                          "out": out or args.render_video,
                          "frames": len(frames),
                          "finite": bool(np.isfinite(frames[-1]).all())}),
              flush=True)


if __name__ == "__main__":
    main()
