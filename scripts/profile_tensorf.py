"""TensoRF train throughput on the TPU chip (PERF_NOTES breadth entry).

Coffee-shaped config: TensorVMSplit, batch 4096, 300^3 final voxels.
Measures iters/s at the init (100^3) and final (300^3) stage resolutions.
The reference publishes no tensorf iters/s; numbers are absolute.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.models import tensorf as tf
from myc_nerfs_tpu.train import tensorf_trainer as tt


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.asarray(leaves[0], jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"stage": name, **kw}), flush=True)


def rays_batch(key, n):
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    o = jnp.stack([3.0 * jnp.cos(theta) * jnp.sin(phi),
                   3.0 * jnp.sin(theta) * jnp.sin(phi),
                   3.0 * jnp.cos(phi)], -1)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    return jnp.concatenate([o, d], -1)


def measure(n_voxels, label):
    mcfg = tf.TensoRFConfig(decomp="vm_split")
    cfg = tt.TensoRFTrainConfig(n_voxel_init=n_voxels, batch_size=4096)
    aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    S = 16
    rays = rays_batch(key, S * 4096).reshape(S, 4096, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2), (S, 4096, 3))
    # warm
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    trainer.params = p
    sync(p)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(16 * i))
    sync(p)
    dt = (time.perf_counter() - t0) / (reps * S)
    emit(label, ms_per_iter=round(dt * 1e3, 2),
         iters_per_s=round(1.0 / dt, 1),
         rays_per_s=round(4096 / dt, 1))


if __name__ == "__main__":
    measure(100 ** 3, "tensorf_vmsplit_100cube")
    measure(300 ** 3, "tensorf_vmsplit_300cube")
