"""Frequency positional encoding + BARF coarse-to-fine annealing mask.

TPU-native re-implementation of:
- barf-myc/model/nerf.py:423-430 (sin/cos PE, layout [..., 2*N*L] with
  sin/cos interleaved as stack([sin, cos], -2))
- barf-myc/model/barf.py:344-357 (cosine-ramped per-frequency c2f mask)
- jnerf-myc .../freq_encoder/freq_encoder.py:10-50 (NGP-project variant)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["positional_encoding", "barf_c2f_weights", "apply_c2f_mask"]


def positional_encoding(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """[..., N] -> [..., 2*N*L]: stack of sin/cos at freqs 2^k * pi.

    Ref: nerf.py:423-430 (layout: per input dim, [sin(f0..fL), cos(f0..fL)]
    flattened via stack on axis -2).
    """
    shape = x.shape
    freq = (2.0 ** jnp.arange(L, dtype=x.dtype)) * np.pi
    spectrum = x[..., None] * freq  # [..., N, L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # [..., N, 2, L]
    return enc.reshape(shape[:-1] + (-1,))


def barf_c2f_weights(progress: jnp.ndarray, L: int, c2f: Tuple[float, float]) -> jnp.ndarray:
    """Per-frequency coarse-to-fine weights in [0, 1], shape [L].

    alpha = (progress - start) / (end - start) * L; weight_k =
    (1 - cos(clip(alpha - k, 0, 1) * pi)) / 2. Ref: barf.py:344-357.
    """
    start, end = c2f
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * np.pi)) / 2.0


def apply_c2f_mask(enc: jnp.ndarray, weights: jnp.ndarray, n_dims: int) -> jnp.ndarray:
    """Apply per-frequency weights to a PE produced by positional_encoding.

    enc: [..., 2*n_dims*L]; weights: [L]. The encoding layout is
    [..., n_dims, 2, L] flattened, so weights broadcast over the last axis.
    Ref: barf.py:352-356 (weight.repeat over input dims).
    """
    L = weights.shape[0]
    shaped = enc.reshape(enc.shape[:-1] + (n_dims, 2, L))
    return (shaped * weights).reshape(enc.shape)
