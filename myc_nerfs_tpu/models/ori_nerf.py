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
        # dtype= forces the COMPUTE dtype: without it flax promotes the
        # bf16 params back to the f32 inputs' dtype and every matmul runs
        # f32 (measured ~15 TF/s vs ~50+ bf16 on v5e)
        dense = lambda w, n: nn.Dense(w, param_dtype=self.param_dtype,  # noqa: E731
                                      dtype=self.param_dtype, name=n)
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
    use_fused: bool = False  # route the backbone through the Pallas fused MLP
    # rematerialize the backbone in the backward (jax.checkpoint): trades
    # one extra forward for not storing 8x256 activations per sample —
    # lifts the K=64 HBM OOM on the flagship train path (VERDICT r2 #5)
    remat: bool = False
    # fp16 FORWARD overflow parity: the reference runs this network at amp
    # level 5 (ori_nerf_network.py:33), where exp(raw density) overflows to
    # inf for raw > log(65504) ~ 11.09, poisoning the loss to nan — and its
    # GradScaler REJECTS that step. The round-4 overflow clamp
    # (density_activation: exp(min(raw, 30))) keeps such steps finite here,
    # which lets lr 1e-2's early violent steps LAND and drive the field
    # into the opaque-wall attractor (mean_density -> ~7e9,
    # quality_r5_log lr2_mechanism). With this flag, raw density above the
    # fp16 overflow threshold becomes nan so skip_nonfinite rejects the
    # step exactly where the reference's fp16 pipeline would.
    fp16_overflow_parity: bool = False


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

    # Leading-dim split for the MLP batch. XLA:TPU runs one giant 2-D dot
    # [262144, 256] x [256, 256] at ~21 TF/s but the same samples as a 3-D
    # batch [32, 8192, 256] at ~64 TF/s fwd (23.1 -> 12.4 ms fwd+bwd at the
    # train shape) — measured scripts/probe_r4_flagship_shape.py, v5e bf16;
    # split size is insensitive across 8/32/128.
    MLP_TILE = 32

    def apply(self, params, positions: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
        fused = self.cfg.use_fused and not self.cfg.skips

        def run(p, x, d):
            if fused:
                return self._apply_fused(p, x, d)
            return self.net.apply(p["mlp"], x, d * 2.0 - 1.0).astype(jnp.float32)

        if self.cfg.remat:
            run = jax.checkpoint(run)
        if fused:
            # the Pallas kernel does its own row tiling and wants [M, C]
            out = run(params, positions, dirs)
        else:
            out = self._tiled(lambda x, d: run(params, x, d), positions,
                              dirs, 4)
        return self._fp16_overflow(out)

    def _fp16_overflow(self, out: jnp.ndarray) -> jnp.ndarray:
        """cfg.fp16_overflow_parity: raw density past the fp16 exp-overflow
        threshold poisons the output to nan (the reference's fp16 forward
        would produce inf there -> nan loss -> GradScaler step skip)."""
        if not self.cfg.fp16_overflow_parity:
            return out
        bad = out[..., -1:] > 11.09  # exp(x) > 65504 (fp16 max)
        return jnp.where(bad, jnp.nan, out)

    def _tiled(self, fn, positions, dirs, out_width: int) -> jnp.ndarray:
        """Run fn on a [MLP_TILE, m, 3] reshape of the flattened samples."""
        shape = positions.shape[:-1]
        x = positions.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        M = x.shape[0]
        b = self.MLP_TILE
        m = -(-M // b)
        pad = b * m - M
        if pad:
            x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, 3))])
            d = jnp.concatenate([d, jnp.broadcast_to(d[:1], (pad, 3))])
        out = fn(x.reshape(b, m, 3), d.reshape(b, m, 3))
        return out.reshape(-1, out_width)[:M].reshape(shape + (out_width,))

    def _apply_fused(self, params, positions, dirs) -> jnp.ndarray:
        """Backbone via the Pallas fused kernel (ops/pallas/fused_mlp.py) —
        the FullyFusedMLP-style fast path, for skip-free configs (the kernel
        is a pure layer chain). Head layers stay in XLA.

        The kernel is bias-free, so each layer's bias is folded in with the
        augmented-ones trick: x@W + b == [x, 1] @ [[W, 0], [b, 1]]. The unit
        column carries the 1 through every layer (relu(1) == 1).
        """
        from ..ops.pallas.fused_mlp import fused_mlp

        p = params["mlp"]["params"]
        dtype = jnp.bfloat16 if self.cfg.use_bf16 else jnp.float32
        pos_enc = freq_encode(positions, self.cfg.multires_pos)
        dir_enc = freq_encode(dirs * 2.0 - 1.0, self.cfg.multires_dir)

        ws = []
        for i in range(self.cfg.D):
            k = p[f"pts_{i}"]["kernel"].astype(dtype)
            b = p[f"pts_{i}"]["bias"].astype(dtype)
            W_aug = jnp.concatenate([k, b[None, :]], axis=0)          # [in+1, out]
            unit = jnp.zeros((W_aug.shape[0], 1), dtype).at[-1, 0].set(1.0)
            ws.append(jnp.concatenate([W_aug, unit], axis=1))          # [in+1, out+1]
        x = jnp.concatenate([pos_enc, jnp.ones(pos_enc.shape[:-1] + (1,))],
                            -1).astype(dtype)
        # the backbone applies relu after EVERY layer; fused_mlp skips the
        # final relu, so reapply it (the ones column is dropped regardless)
        h = jax.nn.relu(fused_mlp(x, tuple(ws))[..., :-1].astype(jnp.float32))

        def lin(name, v):
            return v @ p[name]["kernel"] + p[name]["bias"]

        alpha = lin("alpha", h)
        feature = lin("feature", h)
        hh = jax.nn.relu(lin("views_0", jnp.concatenate([feature, dir_enc], -1)))
        rgb = lin("rgb", hh)
        return jnp.concatenate([rgb, alpha], -1).astype(jnp.float32)

    def density_raw(self, params, positions: jnp.ndarray) -> jnp.ndarray:
        def run(x, _):
            return self.net.apply(params["mlp"], x,
                                  method=OriginNeRFNetwork.density
                                  ).astype(jnp.float32)

        return self._tiled(run, positions, positions, 1)
