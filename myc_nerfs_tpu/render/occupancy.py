"""Cascaded occupancy grid: state + pure-XLA update rules.

TPU-native re-implementation of jnerf-myc's density-grid maintenance
(density_grid_sampler.py:200-260 and the five CUDA kernels, SURVEY.md J16):

- mark_untrained_density_grid (op_header/mark_untrained_density_grid.h):
  cells seen by no camera are pinned to -1
- generate_grid_samples_nerf_nonuniform: random candidate cell per sample
  (retrying up to 10 scrambled indices until density > thresh) + jittered
  position inside the cell
- splat_grid_samples_..._max_nearest_neighbor: scatter-max of
  exp(raw_density) * MIN_CONE_STEPSIZE into a tmp grid
- ema_grid_samples_nerf: grid = max(grid * decay, tmp), untrained cells stay -1
- update_bitfield: mean density over level 0, thresh = min(0.01, mean),
  bitfield = grid > thresh, plus per-mip max-pool of the previous cascade
  into the centre of the next

Layout: row-major [cascade, ix, iy, iz] float/bool arrays — the reference's
morton order + packed bytes are a GPU cache trick with no TPU benefit
(SURVEY.md §2 item 9). All functions are jit-safe and functional.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SQRT3 = 1.73205080757
NERF_GRIDSIZE = 128
NERF_MIN_OPTICAL_THICKNESS = 0.01


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    grid_size: int = NERF_GRIDSIZE
    n_cascades: int = 5
    max_cascade: int = 0            # from aabb_scale: 1<<max_cascade >= aabb_scale
    decay: float = 0.95
    max_steps: int = 1024           # NERF_STEPS
    n_training_steps: int = 16      # grid update cadence

    @property
    def min_cone_stepsize(self) -> float:
        return SQRT3 / self.max_steps


class OccupancyState(NamedTuple):
    density_grid: jnp.ndarray   # [C, G, G, G] float32 (-1 marks untrained)
    bitfield: jnp.ndarray       # [C, G, G, G] bool
    mean_density: jnp.ndarray   # scalar
    ema_step: jnp.ndarray       # scalar int32


def init_occupancy(cfg: OccupancyConfig) -> OccupancyState:
    G, C = cfg.grid_size, cfg.n_cascades
    return OccupancyState(
        density_grid=jnp.zeros((C, G, G, G)),
        bitfield=jnp.zeros((C, G, G, G), bool),
        mean_density=jnp.zeros(()),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cell_centers(cfg: OccupancyConfig, level: int) -> jnp.ndarray:
    """World positions of all cell centres at one cascade [G, G, G, 3].

    pos = ((i + 0.5)/G - 0.5) * 2^level + 0.5 (mark_untrained_density_grid.h).
    """
    G = cfg.grid_size
    idx = (jnp.arange(G, dtype=jnp.float32) + 0.5) / G - 0.5
    x, y, z = jnp.meshgrid(idx, idx, idx, indexing="ij")
    return jnp.stack([x, y, z], -1) * (2.0 ** level) + 0.5


def mark_untrained(cfg: OccupancyConfig, c2w: jnp.ndarray,
                   focal: jnp.ndarray, W: int, H: int) -> jnp.ndarray:
    """Initial density grid with -1 in cells seen by no camera.

    c2w: [n_img, 3, 4] NGP-convention camera-to-world; focal: [n_img, 2].
    Ref: mark_untrained_density_grid.h (voxel-radius slack, z>0 frustum test).
    """
    G, C = cfg.grid_size, cfg.n_cascades
    half_res = jnp.array([W * 0.5, H * 0.5])

    def level_grid(level):
        pos = cell_centers(cfg, level).reshape(-1, 3)            # [M, 3]
        radius = 0.5 * SQRT3 * (2.0 ** level) / G
        ploc = pos[:, None, :] - c2w[None, :, :, 3]              # [M, n, 3]
        xyz = jnp.einsum("mnd,ndc->mnc", ploc, c2w[..., :3])     # dot with cols
        x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
        vis = (z > 0) & \
            (jnp.abs(x) - radius < z / focal[None, :, 0] * half_res[0]) & \
            (jnp.abs(y) - radius < z / focal[None, :, 1] * half_res[1])
        seen = vis.any(-1)
        return jnp.where(seen, 0.0, -1.0).reshape(G, G, G)

    return jnp.stack([level_grid(l) for l in range(C)])


def generate_grid_samples(cfg: OccupancyConfig, state: OccupancyState,
                          key: jax.Array, n_samples: int, thresh: float
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random (position, flat cell index) pairs biased to occupied cells.

    Ref: generate_grid_samples_nerf_nonuniform.h — per sample pick a random
    cascade <= max_cascade, then probe up to 10 scrambled cell indices until
    grid > thresh. Returns (positions [n, 3] world, indices [n] flat into
    [C, G^3]).
    """
    G = cfg.grid_size
    n_cells = G * G * G
    k_level, k_probe, k_jitter = jax.random.split(key, 3)
    n_casc = cfg.max_cascade + 1
    level = jax.random.randint(k_level, (n_samples,), 0, n_casc)
    base = jax.random.randint(k_probe, (n_samples,), 0, n_cells, dtype=jnp.int32)
    grid_flat = state.density_grid.reshape(cfg.n_cascades, -1)

    # 10 scrambled probes (the reference's linear re-hash), take first hit
    probes = (base[:, None]
              + jnp.arange(10, dtype=jnp.int32)[None, :] * np.int32(19349663)
              + np.int32(96925573)) % n_cells
    vals = grid_flat[level[:, None], probes]
    hit = vals > thresh
    first = jnp.argmax(hit, axis=1)
    any_hit = hit.any(axis=1)
    pos_idx = jnp.where(any_hit, jnp.take_along_axis(probes, first[:, None], 1)[:, 0],
                        probes[:, -1])

    ix = pos_idx // (G * G)
    iy = (pos_idx // G) % G
    iz = pos_idx % G
    cell = jnp.stack([ix, iy, iz], -1).astype(jnp.float32)
    jitter = jax.random.uniform(k_jitter, (n_samples, 3))
    mip_scale = jnp.exp2(level.astype(jnp.float32))[:, None]
    pos = ((cell + jitter) / G - 0.5) * mip_scale + 0.5
    flat_idx = level * n_cells + pos_idx
    return pos, flat_idx


def splat_max(cfg: OccupancyConfig, tmp_grid: jnp.ndarray,
              flat_idx: jnp.ndarray, raw_density: jnp.ndarray) -> jnp.ndarray:
    """Scatter-max exp(raw) * MIN_CONE_STEPSIZE into tmp (splat kernel)."""
    # min(raw, 30) guards the same overflow as density_activation (an inf
    # would ride the EMA and poison mean_density); exp(30) >> any threshold
    optical = jnp.exp(jnp.minimum(raw_density, 30.0)) * cfg.min_cone_stepsize
    flat = tmp_grid.reshape(-1)
    flat = flat.at[flat_idx].max(optical)
    return flat.reshape(tmp_grid.shape)


def ema_update(cfg: OccupancyConfig, grid: jnp.ndarray, tmp: jnp.ndarray
               ) -> jnp.ndarray:
    """grid = max(grid * decay, tmp); untrained (-1) cells stay. Ref:
    ema_grid_samples_nerf.h."""
    return jnp.where(grid < 0.0, grid, jnp.maximum(grid * cfg.decay, tmp))


def update_bitfield(cfg: OccupancyConfig, grid: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(bitfield, mean) from the density grid (update_bitfield.h).

    mean over level 0 only (reference reduce_sum n_elements = G^3); thresh =
    min(0.01, mean); per-mip max-pool of cascade l-1 ORed into the centre
    octant of cascade l.
    """
    G = cfg.grid_size
    mean = jnp.maximum(grid[0], 0.0).mean()
    thresh = jnp.minimum(NERF_MIN_OPTICAL_THICKNESS, mean)
    bits = grid > thresh
    half = G // 4

    def pool2(b):
        return b.reshape(G // 2, 2, G // 2, 2, G // 2, 2).any((1, 3, 5))

    out = [bits[0]]
    for lv in range(1, cfg.n_cascades):
        pooled = pool2(out[lv - 1])
        placed = jnp.zeros((G, G, G), bool).at[half:half + G // 2,
                                               half:half + G // 2,
                                               half:half + G // 2].set(pooled)
        out.append(jnp.logical_or(bits[lv], placed))
    return jnp.stack(out), mean


def make_density_grid_update(cfg: OccupancyConfig, density_raw_fn: Callable,
                             n_uniform: int, n_nonuniform: int,
                             aabb: Tuple[float, float] = (0.0, 1.0)):
    """Build the jitted grid-update step (update_density_grid_nerf,
    density_grid_sampler.py:200-246).

    ``density_raw_fn(params, positions [n,3]) -> raw density [n]``. The
    network consumes AABB-warped coordinates (the reference warps the
    generated world positions before model.density:
    generate_grid_samples_nerf_nonuniform.h:34 ``warp_position(pos, aabb)``,
    no clip — ray_sampler_header.h:790-796), so ``aabb`` must be the SAME
    (lo, hi) the renderer warps with (NGPRenderConfig.aabb). At
    aabb_scale=1 the warp is the identity; for cascaded scenes the grid
    update would otherwise splat densities read from wrapped hash indices.
    """
    if density_raw_fn is None:
        raise ValueError("make_density_grid_update requires a density fn")
    lo, hi = aabb

    @jax.jit
    def update(state: OccupancyState, params, key: jax.Array) -> OccupancyState:
        k_u, k_n = jax.random.split(key)
        pos_u, idx_u = generate_grid_samples(cfg, state, k_u, n_uniform, -0.01)
        parts = [(pos_u, idx_u)]
        if n_nonuniform:
            pos_n, idx_n = generate_grid_samples(cfg, state, k_n, n_nonuniform,
                                                 NERF_MIN_OPTICAL_THICKNESS)
            parts.append((pos_n, idx_n))
        pos = jnp.concatenate([p for p, _ in parts])
        idx = jnp.concatenate([i for _, i in parts])
        # Clip like the render path (ngp_render.py:188): cascade-level
        # positions span 2^max_cascade, which exceeds the aabb for
        # non-power-of-two aabb_scale; unclipped negatives would feed
        # float->uint32 hash casts with backend-dependent results.
        warped = jnp.clip((pos - lo) / (hi - lo), 0.0, 1.0)
        raw = density_raw_fn(params, warped)[..., 0]
        tmp = jnp.zeros_like(state.density_grid)
        tmp = splat_max(cfg, tmp, idx, raw)
        grid = ema_update(cfg, state.density_grid, tmp)
        bitfield, mean = update_bitfield(cfg, grid)
        return OccupancyState(density_grid=grid, bitfield=bitfield,
                              mean_density=mean, ema_step=state.ema_step + 1)

    return update


def mip_from_pos(cfg: OccupancyConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """Smallest cascade containing pos (ray_sampler_header.h:60-66)."""
    maxval = jnp.abs(pos - 0.5).max(-1)
    # frexpf: maxval = m * 2^e with m in [0.5, 1) -> e = floor(log2) + 1
    exponent = jnp.floor(jnp.log2(jnp.maximum(maxval, 1e-10))) + 1
    return jnp.clip(exponent.astype(jnp.int32) + 1, 0, cfg.n_cascades - 1)


def grid_value_at(cfg: OccupancyConfig, volume: jnp.ndarray,
                  pos: jnp.ndarray, mip: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """Raw value of a cascaded [n_cascades, G, G, G] volume at world pos
    [..., 3] — ONE flattened narrow gather (the march is gather-bound on
    TPU, PERF_NOTES §1; flat 1-D indexing avoids the 4-D index path).

    This is the single clip-index-gather every cascaded lookup shares
    (cascaded_grid_idx_at, ray_sampler_header.h:755-776): bitfield probes,
    density reads, and the fused march's sigma probe all delegate here, so
    their occupancy decisions cannot drift apart. ``mip=None`` is the
    cascade-0 fast path (aabb_scale=1: no mip math at all).
    """
    G = cfg.grid_size
    if mip is None:
        i = jnp.clip((pos * G).astype(jnp.int32), 0, G - 1)
        flat = volume[0].reshape(-1)
        return flat[(i[..., 0] * G + i[..., 1]) * G + i[..., 2]]
    mip_scale = jnp.exp2(-mip.astype(jnp.float32))[..., None]
    p = (pos - 0.5) * mip_scale + 0.5
    i = jnp.clip((p * G).astype(jnp.int32), 0, G - 1)
    flat = volume.reshape(-1)
    g3 = G * G * G
    return flat[mip * g3 + (i[..., 0] * G + i[..., 1]) * G + i[..., 2]]


def occupied_at(cfg: OccupancyConfig, bitfield: jnp.ndarray,
                pos: jnp.ndarray, mip: jnp.ndarray) -> jnp.ndarray:
    """Bitfield lookup at world pos [..., 3] for cascade mip [...].

    Ref: cascaded_grid_idx_at + density_grid_occupied_at
    (ray_sampler_header.h:755-776).
    """
    return grid_value_at(cfg, bitfield, pos, mip)


def sigma_at(cfg: OccupancyConfig, density_grid: jnp.ndarray,
             pos: jnp.ndarray, mip: Optional[jnp.ndarray] = None
             ) -> jnp.ndarray:
    """Density estimate at world pos from the maintained grid.

    The grid stores max-splatted exp(raw) * MIN_CONE_STEPSIZE with EMA decay
    (splat_max/ema_update) — i.e. sigma * const. Dividing by the constant
    recovers sigma; untrained (-1) cells read as 0. Used as the transmittance
    source for training-time compaction: the reference recomputes density
    with a detached network pass (density_grid_sampler.py:150-154), but the
    grid is the EMA of exactly that quantity, and reading it is one narrow
    gather instead of a full encode+MLP forward.
    """
    v = grid_value_at(cfg, density_grid, pos, mip)
    return jnp.maximum(v, 0.0) / cfg.min_cone_stepsize


def occupied_at_mip0(cfg: OccupancyConfig, bitfield: jnp.ndarray,
                     pos: jnp.ndarray) -> jnp.ndarray:
    """Fast path for single-cascade scenes (aabb_scale=1): a flattened
    one-gather lookup with no mip math — the march is gather-bound on TPU
    (PERF_NOTES.md), so avoiding the 4D index + exp2 helps."""
    return grid_value_at(cfg, bitfield, pos)
