"""Device mesh + named-sharding layer (the distributed backend).

The reference has no multi-device support of any kind (SURVEY.md §2.5:
barf-myc/options.py:102 asserts a single GPU). This module is the TPU-native
distributed-communication backend that replaces it:

- a Mesh over ("data", "model") axes; rays shard over "data" (pure DP —
  rays are embarrassingly parallel), large parameter tables optionally shard
  over "model" (TP for hash tables / factor grids beyond single-chip HBM)
- everything runs through jit + NamedSharding (GSPMD): XLA inserts the psum
  for gradient reduction and the collectives for sharded-table gathers over
  ICI; no hand-written NCCL/MPI analog is needed
- loss/metric reduction is an implicit psum under pjit; multi-host input
  pipelines shard per-process on the "data" axis

Sequence-parallel analog: the per-ray sample axis stays on-chip as masked
scans (SURVEY.md §5.7); no cross-chip sequence exchange is required.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "table_sharding",
           "shard_ngp_params", "shard_batch"]


def make_mesh(devices: Optional[Sequence] = None,
              data: Optional[int] = None, model: int = 1) -> Mesh:
    """Mesh over ("data", "model"). Defaults: all devices on "data"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard the ray/batch axis (``axis``) over the data axis."""
    spec = (None,) * axis + ("data",)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a [rows, features] table's rows over the model axis (TP)."""
    return NamedSharding(mesh, P("model", None))


def shard_ngp_params(mesh: Mesh, params):
    """Sharding pytree for NGP params: hash table rows over "model",
    MLP weights replicated. With model=1 this degenerates to replication."""
    n_model = mesh.shape.get("model", 1)

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        # per-level brick tables: shard only rows divisible by the model
        # axis (hashed levels are power-of-two; small dense levels replicate)
        if "table" in names and hasattr(leaf, "shape") and leaf.ndim >= 2 \
                and leaf.shape[0] % max(n_model, 1) == 0:
            return table_sharding(mesh)
        return replicated(mesh)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_batch(mesh: Mesh, *arrays, axis: int = 0):
    """Place ray-batch arrays with data sharding on ``axis`` (default the
    leading axis; scan blocks shard axis 1, the per-step ray axis)."""
    s = data_sharding(mesh, axis=axis)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
