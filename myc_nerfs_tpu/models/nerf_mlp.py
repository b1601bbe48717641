"""NeRF MLP radiance field with BARF c2f annealing and GARF gaussian variant.

TPU-native re-implementation of the barf-myc model family:
- architecture/init: barf-myc/model/nerf.py:325-361 (skip connections,
  density head folded into the last feature layer's first unit, TF-style
  Xavier init with relu gain for hidden layers)
- forward: nerf.py:363-403
- BARF coarse-to-fine PE masking: barf-myc/model/barf.py:344-357 (driven by a
  ``progress`` scalar passed per call — functional, no module mutation)
- GARF: gaussian activations, no positional encoding
  (barf-myc/model/nerf_garf.py diff @ nerf.py:326,380,390-401)

Design note (TPU): the MLP evaluates [rays*samples, width] batches; widths of
128/256 map directly onto MXU tiles, so stock XLA dots in bf16/f32 are the
compute path — fusion across layers is handled by XLA here and by the Pallas
fused-MLP kernel for the NGP stack (ops/pallas/fused_mlp.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encoding import apply_c2f_mask, barf_c2f_weights, positional_encoding

__all__ = ["NeRFMLP", "gaussian"]


def gaussian(x: jnp.ndarray, c: float = 0.0, sigma: float = 0.1) -> jnp.ndarray:
    """GARF activation exp(-(x-c)^2 / 2 sigma^2). Ref: nerf_garf.py:19-22."""
    return jnp.exp(-((x - c) ** 2) / (2.0 * sigma**2))


def _xavier_uniform(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def _density_head_init(key, shape, dtype=jnp.float32):
    """Init for the last feat layer: column 0 (density) plain Xavier with the
    slice's own fan-out (=1), remaining columns Xavier with relu gain sqrt(2).

    Mirrors tensorflow_init_weights(out='first') (nerf.py:351-361; torch
    xavier on weight[:1] uses the slice shape).
    """
    fan_in, fan_out = shape
    k1, k2 = jax.random.split(key)
    b0 = np.sqrt(6.0 / (fan_in + 1))
    col0 = jax.random.uniform(k1, (fan_in, 1), dtype, -b0, b0)
    br = np.sqrt(2.0) * np.sqrt(6.0 / (fan_in + fan_out - 1))
    rest = jax.random.uniform(k2, (fan_in, fan_out - 1), dtype, -br, br)
    return jnp.concatenate([col0, rest], axis=1)


class NeRFMLP(nn.Module):
    """Radiance field MLP: density(x) + view-dependent rgb(x, d).

    ``widths_feat`` lists the output width of every feature layer (the last
    one implicitly gains +1 density unit); ``skip`` are layer indices whose
    input is concatenated with the encoded points. Config parity with
    barf-myc options/nerf_blender.yaml (arch.*).
    """

    widths_feat: Sequence[int] = (256, 256, 256, 256, 256, 256, 256, 256)
    widths_rgb: Sequence[int] = (128, 3)
    skip: Sequence[int] = (4,)
    posenc_L3D: Optional[int] = 10   # None -> raw xyz only (GARF)
    posenc_Lview: Optional[int] = 4
    view_dep: bool = True
    activation: str = "relu"         # "relu" | "gaussian"
    gaussian_sigma: float = 0.1
    density_activ: str = "softplus"  # "softplus" | "relu" | "abs" | "exp" | "sigmoid"
    tf_init: bool = True
    # compute in bf16 on the MXU (params stay f32; outputs cast back) —
    # the round-3 GARF throughput lever (VERDICT r2 #5). The heads stay
    # numerically safe: sigmoid/softplus run after the f32 cast.
    use_bf16: bool = False

    def _act(self, x):
        if self.activation == "gaussian":
            # exp(-x^2/2s^2) with s=0.1 amplifies input error 100x — keep
            # the activation itself in f32 even when matmuls run bf16 (the
            # next Dense casts back down)
            return gaussian(x.astype(jnp.float32), sigma=self.gaussian_sigma)
        return nn.relu(x)

    def _density_act(self, x):
        return {
            "softplus": jax.nn.softplus,
            "relu": nn.relu,
            "abs": jnp.abs,
            "exp": jnp.exp,
            "sigmoid": jax.nn.sigmoid,
        }[self.density_activ](x)

    def _dense(self, width: int, out: Optional[str] = None) -> nn.Dense:
        dtype = jnp.bfloat16 if self.use_bf16 else None
        if not self.tf_init:
            return nn.Dense(width, dtype=dtype)
        if out == "first":
            kinit = _density_head_init
        elif out == "all":
            kinit = _xavier_uniform(1.0)
        else:
            kinit = _xavier_uniform(np.sqrt(2.0))
        return nn.Dense(width, kernel_init=kinit,
                        bias_init=nn.initializers.zeros, dtype=dtype)

    def encode_points(self, points: jnp.ndarray, progress=None,
                      c2f: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
        """[xyz | PE(xyz)] with optional BARF c2f mask on the PE part."""
        if self.posenc_L3D is None:
            return points
        enc = positional_encoding(points, self.posenc_L3D)
        if c2f is not None and progress is not None:
            w = barf_c2f_weights(progress, self.posenc_L3D, c2f)
            enc = apply_c2f_mask(enc, w, n_dims=points.shape[-1])
        return jnp.concatenate([points, enc], axis=-1)

    def encode_view(self, ray_unit: jnp.ndarray, progress=None,
                    c2f: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
        if self.posenc_Lview is None:
            return ray_unit
        enc = positional_encoding(ray_unit, self.posenc_Lview)
        if c2f is not None and progress is not None:
            w = barf_c2f_weights(progress, self.posenc_Lview, c2f)
            enc = apply_c2f_mask(enc, w, n_dims=ray_unit.shape[-1])
        return jnp.concatenate([ray_unit, enc], axis=-1)

    @nn.compact
    def __call__(
        self,
        points: jnp.ndarray,
        ray_unit: Optional[jnp.ndarray] = None,
        progress: Optional[jnp.ndarray] = None,
        c2f: Optional[Tuple[float, float]] = None,
        density_noise: float = 0.0,
        noise_key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """points [..., 3] (+ ray_unit [..., 3]) -> (rgb [..., 3], density [...])."""
        points_enc = self.encode_points(points, progress, c2f)
        feat = points_enc
        n_layers = len(self.widths_feat)
        for li, width in enumerate(self.widths_feat):
            if li in self.skip:
                feat = jnp.concatenate([feat, points_enc], axis=-1)
            last = li == n_layers - 1
            feat = self._dense(width + 1 if last else width,
                               out="first" if last else None)(feat)
            if last:
                density = feat[..., 0].astype(jnp.float32)
                if density_noise and noise_key is not None:
                    density = density + jax.random.normal(noise_key, density.shape) * density_noise
                density = self._density_act(density)
                feat = feat[..., 1:]
            feat = self._act(feat)
        if self.view_dep:
            if ray_unit is None:
                raise ValueError("view_dep model needs ray_unit")
            feat = jnp.concatenate([feat, self.encode_view(ray_unit, progress, c2f)], axis=-1)
        n_rgb = len(self.widths_rgb)
        for li, width in enumerate(self.widths_rgb):
            last = li == n_rgb - 1
            feat = self._dense(width, out="all" if last else None)(feat)
            if not last:
                feat = self._act(feat)
        rgb = jax.nn.sigmoid(feat.astype(jnp.float32))
        return rgb, density

    def density_only(self, params, points: jnp.ndarray) -> jnp.ndarray:
        """Density query for mesh extraction / occupancy (no view branch)."""
        dummy = jnp.zeros_like(points) if self.view_dep else None
        _, density = self.apply(params, points, ray_unit=dummy)
        return density


def garf_mlp(**overrides) -> NeRFMLP:
    """GARF preset: gaussian activations, no PE (Easyship.yaml arch)."""
    kw = dict(
        widths_feat=(256,) * 6, widths_rgb=(128, 3), skip=(3,),
        posenc_L3D=None, posenc_Lview=None, activation="gaussian",
        density_activ="relu",
    )
    kw.update(overrides)
    return NeRFMLP(**kw)
