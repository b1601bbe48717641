"""Checkpoint/resume: single-file pytree checkpoints with latest + snapshots.

Covers the three reference schemes (SURVEY.md §5.4) with one mechanism:
- barf: {epoch, iter, graph, optim, sched} latest + per-iteration copies
  (barf-myc/util.py:140-187)
- tensorf: model kwargs + state + alpha mask + lr + global_step
  (tensorf-myc/train.py:147-164, models/tensorBase.py:253-272)
- jnerf: {global_step, model, sampler grids, optimizer m/v, EMA shadow}
  (jnerf-myc/python/jnerf/runner/runner.py:127-155)

Implementation: flax.serialization msgpack of an arbitrary pytree plus a
JSON sidecar of static metadata. LR-schedule continuity comes free because
optax schedules derive from the restored step counter.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    meta: Optional[Dict] = None, keep_snapshot: bool = False) -> str:
    """Write ``state`` (any pytree) to path; optionally keep a per-step copy.

    Mirrors util.py:167-187 (latest 'model.ckpt' + 'model/<iter>.ckpt').
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_state = jax.tree_util.tree_map(np.asarray, state)
    blob = serialization.to_bytes(host_state)
    with open(path, "wb") as f:
        f.write(blob)
    if meta is not None or step is not None:
        with open(path + ".json", "w") as f:
            json.dump({"step": step, **(meta or {})}, f)
    if keep_snapshot and step is not None:
        snap_dir = os.path.splitext(path)[0]
        os.makedirs(snap_dir, exist_ok=True)
        snap = os.path.join(snap_dir, f"{step}.ckpt")
        with open(snap, "wb") as f:
            f.write(blob)
    return path


def restore_checkpoint(path: str, target: Any) -> Tuple[Any, Dict]:
    """Restore into the structure of ``target``; returns (state, meta).

    Partial restores (reference's per-child tolerant loading,
    tensorBase.py:274-326) are achieved by passing the matching sub-pytree.
    """
    with open(path, "rb") as f:
        blob = f.read()
    try:
        state = serialization.from_bytes(target, blob)
    except (ValueError, KeyError):
        # Legacy tolerance: older checkpoints may carry state fields the
        # current structure dropped (e.g. the redundant ema_params /
        # ema_steps NGPTrainState fields removed in round 4 — the EMA
        # shadow always equaled the live params). Drop dict keys the
        # target no longer has; a key the target NEEDS but the blob lacks
        # still raises (that is a genuine mismatch, not drift).
        raw = serialization.msgpack_restore(blob)
        ref = serialization.to_state_dict(target)
        state = serialization.from_state_dict(target, _filter_keys(ref, raw))
    meta: Dict = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return state, meta


def _filter_keys(ref: Any, raw: Any) -> Any:
    """Recursively drop dict keys in ``raw`` that ``ref`` doesn't have."""
    if isinstance(ref, dict) and isinstance(raw, dict):
        return {k: _filter_keys(ref[k], raw[k]) for k in ref}
    return raw


def latest_checkpoint(directory: str, name: str = "model.ckpt") -> Optional[str]:
    """Resolve --resume: the latest checkpoint file if present
    (model/base.py:46-57 semantics)."""
    path = os.path.join(directory, name)
    return path if os.path.exists(path) else None
