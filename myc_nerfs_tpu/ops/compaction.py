"""Static-shape first-K compaction (the shared cumsum-rank idiom).

TPU resolution of the reference's dynamic boolean indexing / atomic
compaction (CompactedCoord op_header/compacted_coord.h:62-77, TensoRF
app_mask indexing tensorBase.py:505-518): XLA needs static shapes, so the
first K True positions per row are selected with a cumsum rank trick —
no sort, one narrow gather for the caller.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

__all__ = ["compact_first_k"]


def compact_first_k(mask: jnp.ndarray, k: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the first ``k`` True entries per row of mask [..., S].

    Returns (idx [..., k] int32 clamped into [0, S-1], valid [..., k] bool).
    Slot j holds the j-th True position when it exists (valid), else a
    clamped placeholder (invalid). Complexity O(S*k) compares — fine for
    the S<=1024, k<=128 shapes used here.
    """
    S = mask.shape[-1]
    c = jnp.cumsum(mask.astype(jnp.int32), axis=-1)            # [..., S]
    j = jnp.arange(k, dtype=jnp.int32)
    # first index i with c[i] > j  ==  count of i with c[i] <= j
    idx = (c[..., None, :] <= j[..., :, None]).sum(-1)         # [..., k]
    idx = jnp.minimum(idx, S - 1).astype(jnp.int32)
    valid = j < c[..., -1:]
    return idx, valid
