"""Instant-NGP: multiresolution hash-grid encoding + bias-free MLPs.

TPU-native re-implementation of jnerf-myc's NGP stack:
- hash-grid encode (HashEncoder/GridEncode, .../hash_encoder/{hash_encoder,
  grid_encode}.py + op_header/HashEncode.h): 16 levels x 2 features, base
  res 16, per-level scale from desired_resolution 2048*aabb_scale; per-level
  table size min(round8(res^3), 2^19); dense indexing when the level fits,
  else hash p0 ^ p1*19349663 ^ p2*83492791 (configs/Easyship.py:89); trilinear
  corner interpolation. The CUDA atomic scatter-add backward
  (kernel_grid_backward, grid_encode.py:132-191) is XLA's gather transpose —
  autodiff emits the scatter-add.
- NGPNetworks (networks/ngp_network.py:41-96): bias-free density MLP
  (32->64->16) and rgb MLP (16+16->64->64->3); raw outputs, activations
  (exp density / sigmoid rgb) applied in the compositor like the reference
  (ray_sampler_header.h:900-943). The FullyFusedMLP prebuilt binary maps to
  bf16 XLA dots here and to the Pallas fused kernel in
  ops/pallas/fused_mlp.py for the hot path.

This module is the pure-XLA reference implementation of the encode; the
TPU-fast path (brick-packed tables, wide-row gathers) lives in
ops/brick_grid.py and tests compare the two.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import sh_encode

HASH_PRIMES = (1, 19349663, 83492791)  # configs/Easyship.py:89


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    aabb_scale: int = 1
    desired_resolution: float = 2048.0

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(np.exp(np.log(self.desired_resolution * self.aabb_scale
                                   / self.base_resolution)
                            / (self.n_levels - 1)))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


@dataclasses.dataclass(frozen=True)
class HashGridLevels:
    """Host-side static per-level geometry (grid_encode.py:18-46)."""

    scales: Tuple[float, ...]
    resolutions: Tuple[int, ...]
    offsets: Tuple[int, ...]        # n_levels+1 entries, in feature vectors
    hashmap_sizes: Tuple[int, ...]
    dense: Tuple[bool, ...]
    n_params: int                   # total feature vectors


def compute_levels(cfg: HashGridConfig) -> HashGridLevels:
    scales, resos, sizes, dense = [], [], [], []
    offsets = [0]
    offset = 0
    cap = 1 << cfg.log2_hashmap_size
    for lv in range(cfg.n_levels):
        scale = 2.0 ** (lv * np.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
        res = int(np.ceil(scale)) + 1
        params = min(((res**3 + 7) // 8) * 8, cap)
        scales.append(float(scale))
        resos.append(res)
        sizes.append(params)
        dense.append(res**3 <= params)
        offset += params
        offsets.append(offset)
    return HashGridLevels(scales=tuple(scales), resolutions=tuple(resos),
                          offsets=tuple(offsets), hashmap_sizes=tuple(sizes),
                          dense=tuple(dense), n_params=offset)


def init_hash_table(key: jax.Array, cfg: HashGridConfig,
                    levels: Optional[HashGridLevels] = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Uniform(+-1e-4) like hash_encoder.py:22-23. Shape [n_params, F]."""
    levels = levels or compute_levels(cfg)
    return jax.random.uniform(key, (levels.n_params, cfg.n_features),
                              dtype=dtype, minval=-1e-4, maxval=1e-4)


def _level_index(levels: HashGridLevels, lv: int, corner: jnp.ndarray) -> jnp.ndarray:
    """Feature-vector index within the whole table for int corner [..., 3].

    grid_index (HashEncode.h:74-94): dense row-major (stride x->y->z) when the
    level fits, else the injected hash; always modulo the level size.
    """
    size = levels.hashmap_sizes[lv]
    res = levels.resolutions[lv]
    c = corner.astype(jnp.uint32)
    if levels.dense[lv]:
        idx = c[..., 0] + c[..., 1] * np.uint32(res) + c[..., 2] * np.uint32(res * res)
    else:
        idx = (c[..., 0] * np.uint32(HASH_PRIMES[0])
               ^ c[..., 1] * np.uint32(HASH_PRIMES[1])
               ^ c[..., 2] * np.uint32(HASH_PRIMES[2]))
    return (idx % np.uint32(size)).astype(jnp.int32) + levels.offsets[lv]


# the 8 corner offsets of a unit cube, ordered like the CUDA kernel's idx loop
_CORNERS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                    axis=-1).reshape(8, 3)[:, ::-1].copy()  # bit0->x, bit1->y, bit2->z


def hash_encode(table: jnp.ndarray, positions: jnp.ndarray,
                cfg: HashGridConfig, levels: Optional[HashGridLevels] = None
                ) -> jnp.ndarray:
    """Encode positions [..., 3] in [0, 1] -> [..., n_levels * F].

    Pure-XLA gathers + trilinear lerp (kernel_grid, HashEncode.h:117-200).
    """
    levels = levels or compute_levels(cfg)
    shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    outs: List[jnp.ndarray] = []
    corners = jnp.asarray(_CORNERS, jnp.int32)  # [8, 3]
    for lv in range(cfg.n_levels):
        scale = levels.scales[lv]
        p = pos * scale + 0.5                      # pos_fract (HashEncode.h:107-115)
        p0 = jnp.floor(p)
        frac = p - p0
        base = p0.astype(jnp.int32)                # [N, 3]
        corner_pos = base[:, None, :] + corners[None, :, :]  # [N, 8, 3]
        idx = _level_index(levels, lv, corner_pos)            # [N, 8]
        vals = table[idx]                                     # [N, 8, F]
        w = jnp.where(corners[None, :, :] == 0, 1.0 - frac[:, None, :],
                      frac[:, None, :]).prod(-1)              # [N, 8]
        outs.append((vals * w[..., None]).sum(1))             # [N, F]
    return jnp.concatenate(outs, axis=-1).reshape(shape + (cfg.out_dim,))


class NGPNetwork(nn.Module):
    """Bias-free density+rgb MLPs (ngp_network.py:41-96).

    __call__(pos_enc [N, 32], dir_enc [N, 16]) -> raw [N, 4] (rgb, density).
    """

    density_n_neurons: int = 64
    rgb_n_neurons: int = 64
    geo_feat_dim: int = 16
    param_dtype: Any = jnp.float32

    def setup(self):
        dense = lambda w, name: nn.Dense(w, use_bias=False,  # noqa: E731
                                         param_dtype=self.param_dtype, name=name)
        self.density0 = dense(self.density_n_neurons, "density0")
        self.density1 = dense(self.geo_feat_dim, "density1")
        self.rgb0 = dense(self.rgb_n_neurons, "rgb0")
        self.rgb1 = dense(self.rgb_n_neurons, "rgb1")
        self.rgb2 = dense(3, "rgb2")

    def __call__(self, pos_enc: jnp.ndarray, dir_enc: jnp.ndarray) -> jnp.ndarray:
        h = self.density_forward(pos_enc)
        x = jnp.concatenate([h, dir_enc], axis=-1)
        x = nn.relu(self.rgb0(x))
        x = nn.relu(self.rgb1(x))
        rgb = self.rgb2(x)
        return jnp.concatenate([rgb, h[..., :1]], axis=-1)

    def density_forward(self, pos_enc: jnp.ndarray) -> jnp.ndarray:
        return self.density1(nn.relu(self.density0(pos_enc)))

    def density(self, pos_enc: jnp.ndarray) -> jnp.ndarray:
        """Raw density channel only (ngp_network.py:87-90)."""
        return self.density_forward(pos_enc)[..., :1]


@dataclasses.dataclass(frozen=True)
class NGPModelConfig:
    """Bundle: hash grid + SH dirs + MLPs (config parity: configs/*.py).

    ``grid_impl``: 'brick3' (default) packs up to three adjacent hashed
    levels into one 768-float row — the measured scatter/gather bandwidth
    knee (PERF_NOTES §7) — quality-verified against per-level bricks and
    the vertex hash at 256^2 reference scale (§8); 'brick2' pairs levels;
    'brick' is the round-2 per-level brick layout; 'hash' is the exact
    vertex-level reference layout (pure-XLA gathers, kept for parity tests
    and cross-checks).
    """

    grid: HashGridConfig = HashGridConfig()
    sh_degree: int = 4
    density_n_neurons: int = 64
    rgb_n_neurons: int = 64
    use_bf16: bool = False
    grid_impl: str = "brick3"


class NGPModel:
    """Convenience wrapper pairing the grid table with the flax MLPs."""

    def __init__(self, cfg: NGPModelConfig):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        if cfg.grid_impl == "brick":
            from ..ops import brick_grid as bg

            self._bg = bg
            self.levels = bg.compute_brick_levels(cfg.grid)
            enc_dtype = jnp.bfloat16 if cfg.use_bf16 else None
            self._encode = lambda table, pos: bg.brick_encode(
                table, pos, cfg.grid, self.levels, compute_dtype=enc_dtype)
            self._init_table = lambda key: bg.init_brick_table(
                key, cfg.grid, self.levels)
        elif cfg.grid_impl in ("brick2", "brick3"):
            from ..ops import brick_grid as bg

            self._bg = bg
            self.levels = bg.compute_brick_levels(cfg.grid)
            self.groups = bg.compute_level_groups(
                self.levels, group_size=3 if cfg.grid_impl == "brick3" else 2)
            enc_dtype = jnp.bfloat16 if cfg.use_bf16 else None
            self._encode = lambda table, pos: bg.paired_encode(
                table, pos, cfg.grid, self.levels, self.groups,
                compute_dtype=enc_dtype)
            self._init_table = lambda key: bg.init_paired_table(
                key, cfg.grid, self.levels, self.groups)
        else:
            self.levels = compute_levels(cfg.grid)
            self._encode = lambda table, pos: hash_encode(
                table, pos, cfg.grid, self.levels)
            self._init_table = lambda key: init_hash_table(
                key, cfg.grid, self.levels)
        self.net = NGPNetwork(density_n_neurons=cfg.density_n_neurons,
                              rgb_n_neurons=cfg.rgb_n_neurons,
                              param_dtype=dtype)

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        table = self._init_table(k1)
        mlp = self.net.init(k2, jnp.zeros((1, self.cfg.grid.out_dim)),
                            jnp.zeros((1, 16)))
        return {"table": table, "mlp": mlp}

    def apply(self, params, positions: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        """positions [N,3] in [0,1], dirs [N,3] warped to [0,1] (reference
        warp_direction). Returns raw [N, 4]."""
        pos_enc = self._encode(params["table"], positions)
        dir_enc = sh_encode(dirs * 2.0 - 1.0, degree=self.cfg.sh_degree, pad_to=16)
        if self.cfg.use_bf16:
            pos_enc = pos_enc.astype(jnp.bfloat16)
            dir_enc = dir_enc.astype(jnp.bfloat16)
        out = self.net.apply(params["mlp"], pos_enc, dir_enc)
        return out.astype(jnp.float32)

    def density_raw(self, params, positions: jnp.ndarray) -> jnp.ndarray:
        pos_enc = self._encode(params["table"], positions)
        if self.cfg.use_bf16:
            pos_enc = pos_enc.astype(jnp.bfloat16)
        out = self.net.apply(params["mlp"], pos_enc,
                             method=NGPNetwork.density)
        return out.astype(jnp.float32)


@jax.custom_jvp
def density_activation(raw: jnp.ndarray) -> jnp.ndarray:
    """Exponential (ENerfActivation::Exponential, ray_sampler_header.h:926-943).

    The forward guards overflow with min(raw, 30): exp(30)=1.1e13 already
    composites to alpha=1 at any dt, while an unguarded inf would turn the
    dt=0 padding lanes of the static-shape marcher into inf*0=NaN (the
    reference never sees this case only because its dynamic compaction
    drops dead samples before CalcRgb). The gradient clamps the exp
    argument to +-15 exactly like the reference's
    network_to_density_derivative (ray_sampler_header.h:1050-1056) — the
    guard that keeps its fp16 training finite when a wide-MLP field
    saturates (observed: the OriginNeRF flagship at lr 1e-2 NaNs within 3
    steps without it)."""
    return jnp.exp(jnp.minimum(raw, 30.0))


@density_activation.defjvp
def _density_activation_jvp(primals, tangents):
    (raw,), (draw,) = primals, tangents
    out = jnp.exp(jnp.minimum(raw, 30.0))
    return out, jnp.exp(jnp.clip(raw, -15.0, 15.0)) * draw


def rgb_activation(raw: jnp.ndarray) -> jnp.ndarray:
    """Logistic with the reference's clamp (ray_sampler_header.h:900-916)."""
    return jax.nn.sigmoid(raw)
