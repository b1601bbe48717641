"""Round-4 probe: the GARF 8-vs-12-view 2x throughput anomaly (VERDICT r4 #2).

PERF_NOTES 8c: identical work (2048 rays x 128 samples) runs 22.5 it/s with
8 training views vs 46.5 with 12. The batch is [B, rand_rays//B, 128] so the
candidate mechanisms are (a) the view dim B, (b) rays_per_image being a
power of two, (c) the flattened total hitting exactly 2^18. This probe
sweeps (B, rays_per_image) on-chip and, with --hlo, dumps optimized HLO for
the fast/slow pair to /tmp for diffing.

Usage: python scripts/probe_r4_garf_views.py [--hlo]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.train import nerf_trainer as nt


def emit(**kw):
    print(json.dumps(kw), flush=True)


def build(n_views, rays_per_image, steps_per_block=16):
    scene = make_scene(n_views=n_views, H=64, W=64)
    cfg = nt.NeRFTrainConfig(model="garf", refine_pose=True,
                             rand_rays=n_views * rays_per_image,
                             sample_intvs=128, max_iter=200000)
    model, state = nt.init_state(cfg, jax.random.PRNGKey(0),
                                 n_images=scene.images.shape[0])
    block = nt.make_train_block(cfg, model, scene.images, scene.poses,
                                scene.intr, steps_per_block=steps_per_block)
    return cfg, state, block


def measure(n_views, rays_per_image, nblk=4):
    cfg, state, block = build(n_views, rays_per_image)
    key = jax.random.PRNGKey(3)
    state, m = block(state, key)
    _ = float(m["psnr"])  # host read: the only reliable sync on axon
    t0 = time.perf_counter()
    for i in range(nblk):
        state, m = block(state, jax.random.fold_in(key, i))
    _ = float(m["psnr"])
    dt = time.perf_counter() - t0
    steps = nblk * 16
    emit(n_views=n_views, rays_per_image=rays_per_image,
         total_rays=n_views * rays_per_image,
         total_samples=n_views * rays_per_image * 128,
         it_s=round(steps / dt, 1),
         rays_per_s=round(steps * cfg.rand_rays / dt, 1))


def dump_hlo(n_views, rays_per_image, path):
    cfg, state, block = build(n_views, rays_per_image)
    key = jax.random.PRNGKey(3)
    lowered = jax.jit(block.__wrapped__).lower(state, key)
    compiled = lowered.compile()
    with open(path, "w") as f:
        f.write(compiled.as_text())
    emit(hlo=path, n_views=n_views, rays_per_image=rays_per_image,
         bytes=os.path.getsize(path))


if __name__ == "__main__":
    if "--hlo" in sys.argv:
        dump_hlo(8, 256, "/tmp/garf_hlo_8x256.txt")
        dump_hlo(12, 170, "/tmp/garf_hlo_12x170.txt")
        sys.exit(0)
    # the original pair first, then the hypothesis grid
    for b, r in [(8, 256), (12, 170),
                 (8, 255), (8, 257),   # pow2 rays_per_image?
                 (16, 128), (4, 512),  # B even-pow2 sweeps, total 2^18
                 (12, 171), (10, 204), # non-pow2 everything
                 (8, 170), (12, 256)]: # cross: does B alone matter?
        measure(b, r)
