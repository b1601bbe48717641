"""VERDICT r2 #6: where does the hash-render forward go?

Render is scatter-free, yet round-2 measured 209 krays/s (0.387x) while the
gather rates suggested ~2x more. Decompose the render the same way the
train ablation does: full render per grid impl, then a no-encode knockout
(march + MLPs + composite only). One dispatch renders 8 chunks of 4096
rays via lax.map (bench.py's measure_render shape).
Usage: python profile_render_gap.py [impl ...]  (default: brick brick3 none)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from myc_nerfs_tpu.models.ngp import (HashGridConfig, NGPModel,
                                      NGPModelConfig, NGPNetwork)
from myc_nerfs_tpu.ops.sh import sh_encode
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp

RAYS, CHUNKS = 4096, 8


def sync(x):
    return float(jnp.asarray(x, jnp.float32).sum())


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def ball_state():
    cfg = occ.OccupancyConfig()
    st = occ.init_occupancy(cfg)
    centers = occ.cell_centers(cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3
    grid = jnp.where(ball, 0.05, 0.0)
    return cfg, st._replace(bitfield=st.bitfield.at[0].set(ball),
                            density_grid=st.density_grid.at[0].set(grid),
                            mean_density=jnp.maximum(grid, 0.0).mean())


class NoEncodeModel(NGPModel):
    def apply(self, params, positions, dirs):
        reps = self.cfg.grid.out_dim // 3 + 1
        pos_enc = jnp.tile(positions, (1, reps))[:, :self.cfg.grid.out_dim]
        dir_enc = sh_encode(dirs * 2.0 - 1.0, degree=self.cfg.sh_degree,
                            pad_to=16)
        if self.cfg.use_bf16:
            pos_enc = pos_enc.astype(jnp.bfloat16)
            dir_enc = dir_enc.astype(jnp.bfloat16)
        return self.net.apply(params["mlp"], pos_enc,
                              dir_enc).astype(jnp.float32)


def run(tag, model):
    occ_cfg, st = ball_state()
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32)
    params = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    theta = jax.random.uniform(key, (CHUNKS * RAYS,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1),
                             (CHUNKS * RAYS,)) * 3.14159
    o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                   0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                   0.5 + 1.4 * jnp.cos(phi)], -1)
    d = 0.5 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = o.reshape(CHUNKS, RAYS, 3)
    d = d.reshape(CHUNKS, RAYS, 3)
    bg = jnp.ones((3,))

    @jax.jit
    def render_all(p, o3, d3):
        return jax.lax.map(lambda ch: render_rays_ngp(
            occ_cfg, rcfg, model.apply, p, st, ch[0], ch[1], bg).rgb,
            (o3, d3))

    sync(render_all(params, o, d))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = render_all(params, o, d)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    emit(tag, ms=round(dt * 1e3, 1),
         krays_s=round(CHUNKS * RAYS / dt / 1e3, 1))


if __name__ == "__main__":
    which = sys.argv[1:] or ["brick", "brick3", "none"]
    for w in which:
        if w == "none":
            mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                                  grid_impl="brick")
            run("render_no_encode", NoEncodeModel(mcfg))
        else:
            mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                                  grid_impl=w)
            run(f"render_{w}", NGPModel(mcfg))
