"""Color-space converters (sRGB <-> linear).

Re-implements jnerf-myc/python/jnerf/dataset/dataset.py:37-51.
"""
from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(img: jnp.ndarray) -> jnp.ndarray:
    """Ref: dataset.py srgb_to_linear (piecewise IEC 61966-2-1)."""
    return jnp.where(img <= 0.04045, img / 12.92,
                     ((img + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(img: jnp.ndarray) -> jnp.ndarray:
    """Ref: dataset.py linear_to_srgb."""
    img = jnp.clip(img, 0.0, 1.0)
    return jnp.where(img <= 0.0031308, img * 12.92,
                     1.055 * img ** (1.0 / 2.4) - 0.055)
