"""Refined-pose export and test-pose transfer (the data_refine pipeline).

TPU-native re-implementation of:
- pose export to transforms JSON: barf-myc/model/garf.py get_pose_transfrom
  (garf.py:173-207) — world->cam poses back to Blender c2w 4x4 frames
- per-frame world transform: garf.py get_transform (garf.py:160-171)
- test-pose transfer: barf-myc/compare_pose.py:9-85 — per-frame deltas
  between original and refined val poses, propagated to test poses either by
  the mean rigid transform ('trans', default) or Procrustes sim3 ('sim3')

Produces/consumes the same JSON schema as data_refine/Easyship/*.json
(4x4 transform_matrix rows, camera_angle_x).
"""
from __future__ import annotations

import json
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..geom import pose as pose_lib
from ..geom.conventions import unparse_camera_barf
from ..geom.procrustes import procrustes_analysis

__all__ = ["poses_to_frames", "write_transforms_json", "compare_pose",
           "load_transforms_json"]


def _to_4x4(m34: np.ndarray) -> List[List[float]]:
    return np.concatenate([m34, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0).tolist()


def poses_to_frames(poses: jnp.ndarray, file_pattern: str = "./train/r_{}") -> List[dict]:
    """World->cam poses [N, 3, 4] -> Blender frame dicts (c2w 4x4).

    Ref: garf.py:186-201 (invert, flip, append homogeneous row).
    """
    c2w = np.asarray(unparse_camera_barf(poses))
    return [
        {"file_path": file_pattern.format(i), "transform_matrix": _to_4x4(c2w[i])}
        for i in range(c2w.shape[0])
    ]


def write_transforms_json(path: str, poses: jnp.ndarray,
                          camera_angle_x: float = 1.0471975511965976,
                          file_pattern: str = "./train/r_{}") -> None:
    """Write a transforms_*.json like garf.py:202-207."""
    payload = {"camera_angle_x": camera_angle_x,
               "frames": poses_to_frames(poses, file_pattern)}
    with open(path, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=4, separators=(",", ": "))


def load_transforms_json(path: str):
    """Read a transforms json -> (frames c2w [N, 4, 4], camera_angle_x, raw)."""
    with open(path) as f:
        data = json.load(f)
    mats = np.stack([np.asarray(fr["transform_matrix"], np.float32)[:4]
                     for fr in data["frames"]])
    if mats.shape[1] == 3:
        bottom = np.broadcast_to(np.array([[[0, 0, 0, 1.0]]], np.float32),
                                 (mats.shape[0], 1, 4))
        mats = np.concatenate([mats, bottom], axis=1)
    return jnp.asarray(mats), data.get("camera_angle_x"), data


def compare_pose(val_old_path: str, val_new_path: str, test_old_path: str,
                 test_new_path: str, method: str = "trans") -> None:
    """Propagate val-pose refinement deltas to the (unseen) test poses.

    'trans' (default): mean of the inverted per-frame world deltas
    new_c2w @ inv(old_c2w), applied to each test c2w. 'sim3': Procrustes over
    camera centers. Ref: compare_pose.py:9-85.
    """
    old_c2w, _, _ = load_transforms_json(val_old_path)
    new_c2w, _, _ = load_transforms_json(val_new_path)
    _, _, test_raw = load_transforms_json(test_old_path)

    # per-frame world transform, stored inverted like the reference
    deltas = jnp.einsum("nij,njk->nik", new_c2w, jnp.linalg.inv(old_c2w))
    all_trans = pose_lib.invert_pose(deltas[:, :3, :])  # [N, 3, 4]

    if method == "sim3":
        pose_old = pose_lib.invert_pose(old_c2w[:, :3, :])
        pose_new = pose_lib.invert_pose(new_c2w[:, :3, :])
        center_pred = _centers(pose_new)
        center_GT = _centers(pose_old)
        sim3 = procrustes_analysis(center_GT, center_pred)
        new_frames = []
        for fr in test_raw["frames"]:
            a34 = jnp.asarray(fr["transform_matrix"], jnp.float32)[:3, :]
            a = pose_lib.invert_pose(a34)[None]
            center = _centers(a)
            # map GT-frame centers into the refined frame (inverse direction
            # of prealign: compare_pose.py:60-67)
            center_aligned = (center - sim3.t0) / sim3.s0 @ sim3.R * sim3.s1 + sim3.t1
            R_aligned = a[..., :3] @ sim3.R
            t_aligned = (-R_aligned @ center_aligned[..., None])[..., 0]
            p = pose_lib.make_pose(R=R_aligned, t=t_aligned)
            c2w = np.asarray(pose_lib.invert_pose(p)[0])
            fr = dict(fr)
            fr["transform_matrix"] = _to_4x4(c2w)
            new_frames.append(fr)
    else:
        trans_mean = np.asarray(all_trans).mean(axis=0)  # [3, 4]
        trans44 = np.concatenate([trans_mean, np.array([[0, 0, 0, 1.0]])], axis=0)
        new_frames = []
        for fr in test_raw["frames"]:
            a = np.asarray(fr["transform_matrix"], np.float32)
            if a.shape[0] == 3:
                a = np.concatenate([a, np.array([[0, 0, 0, 1.0]], np.float32)], 0)
            fr = dict(fr)
            fr["transform_matrix"] = (trans44 @ a).tolist()
            new_frames.append(fr)

    out = dict(test_raw)
    out["frames"] = new_frames
    with open(test_new_path, "w") as f:
        json.dump(out, f, sort_keys=True, indent=4, separators=(",", ": "))


def _centers(poses: jnp.ndarray) -> jnp.ndarray:
    R_c2w = jnp.swapaxes(poses[..., :3], -1, -2)
    return (-R_c2w @ poses[..., 3:])[..., 0]
