"""OriginNeRF: classic 8x256 NeRF MLP for the NGP sampling pipeline.

Re-implements jnerf-myc's OriginNeRFNetworks + FrequencyEncoder
(networks/ori_nerf_network.py:10-77, freq_encoder/freq_encoder.py:10-50):
the projects/nerf configuration that shares the DensityGridSampler pipeline
(projects/nerf/configs/nerf_base.py). Output contract matches NGPNetwork:
raw [N, 4] = (rgb raw, density raw), activations at composite time.

TPU note (PERF_NOTES.md): this zero-gather, pure-MXU field is also the
TPU-flagship alternative to the gather-bound hash grid — pair it with the
occupancy-gated marcher for speed.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def freq_encode(x: jnp.ndarray, multires: int, include_input: bool = True
                ) -> jnp.ndarray:
    """[x, sin(2^0 x), cos(2^0 x), ..., sin(2^{L-1} x), cos(2^{L-1} x)].

    Ref: freq_encoder.py:10-50 (log-sampled bands, include_input).
    """
    out = [x] if include_input else []
    for i in range(multires):
        f = 2.0 ** i
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)


class OriginNeRFNetwork(nn.Module):
    """8x256 MLP with skip at 4, separate alpha/feature/rgb heads
    (ori_nerf_network.py:22-57)."""

    D: int = 8
    W: int = 256
    skips: Tuple[int, ...] = (4,)
    multires_pos: int = 10
    multires_dir: int = 4
    param_dtype: Any = jnp.float32

    def setup(self):
        dense = lambda w, n: nn.Dense(w, param_dtype=self.param_dtype, name=n)  # noqa: E731
        self.pts_linears = [dense(self.W, f"pts_{i}") for i in range(self.D)]
        self.views_linear = dense(self.W // 2, "views_0")
        self.feature_linear = dense(self.W, "feature")
        self.alpha_linear = dense(1, "alpha")
        self.rgb_linear = dense(3, "rgb")

    def _backbone(self, pos_enc):
        h = pos_enc
        for i, layer in enumerate(self.pts_linears):
            h = nn.relu(layer(h))
            if i in self.skips:
                h = jnp.concatenate([pos_enc, h], -1)
        return h

    def __call__(self, positions: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        pos_enc = freq_encode(positions, self.multires_pos)
        dir_enc = freq_encode(dirs, self.multires_dir)
        h = self._backbone(pos_enc)
        alpha = self.alpha_linear(h)
        feature = self.feature_linear(h)
        h = nn.relu(self.views_linear(jnp.concatenate([feature, dir_enc], -1)))
        rgb = self.rgb_linear(h)
        return jnp.concatenate([rgb, alpha], -1)

    def density(self, positions: jnp.ndarray) -> jnp.ndarray:
        """Raw density only (ori_nerf_network.py:59-69)."""
        h = self._backbone(freq_encode(positions, self.multires_pos))
        return self.alpha_linear(h)


@dataclasses.dataclass(frozen=True)
class OriginNeRFConfig:
    D: int = 8
    W: int = 256
    skips: Tuple[int, ...] = (4,)
    multires_pos: int = 10
    multires_dir: int = 4
    use_bf16: bool = False


class OriginNeRFModel:
    """Same interface as NGPModel so trainers/renderers are interchangeable."""

    def __init__(self, cfg: OriginNeRFConfig = OriginNeRFConfig()):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.use_bf16 else jnp.float32
        self.net = OriginNeRFNetwork(D=cfg.D, W=cfg.W, skips=cfg.skips,
                                     multires_pos=cfg.multires_pos,
                                     multires_dir=cfg.multires_dir,
                                     param_dtype=dtype)

    def init(self, key: jax.Array):
        return {"mlp": self.net.init(key, jnp.zeros((1, 3)), jnp.zeros((1, 3)))}

    def apply(self, params, positions: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        return self.net.apply(params["mlp"], positions,
                              dirs * 2.0 - 1.0).astype(jnp.float32)

    def density_raw(self, params, positions: jnp.ndarray) -> jnp.ndarray:
        return self.net.apply(params["mlp"], positions,
                              method=OriginNeRFNetwork.density).astype(jnp.float32)
