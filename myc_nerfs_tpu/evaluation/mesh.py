"""Mesh extraction: dense density query -> isosurface -> OBJ/PLY.

Re-implements barf-myc/extract_mesh.py:18-46 (dense grid query over
trimesh.range, marching cubes at density threshold, OBJ export) and
tensorf-myc/utils.py:146-207 (convert_sdf_samples_to_ply) using the native
marching-tetrahedra extractor (csrc/marching_tets.cpp) and hand-rolled
OBJ/PLY writers (trimesh/plyfile are not available in this environment).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.native import marching_tets


def query_density_grid(density_fn: Callable[[jnp.ndarray], jnp.ndarray],
                       res: int, vrange: Tuple[float, float],
                       chunk: int = 16384) -> np.ndarray:
    """Evaluate density on a (res+1)^3 lattice (extract_mesh.py:26-35)."""
    t = jnp.linspace(vrange[0], vrange[1], res + 1)
    X, Y, Z = jnp.meshgrid(t, t, t, indexing="ij")
    pts = jnp.stack([X, Y, Z], -1).reshape(-1, 3)
    n = pts.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    out = jax.lax.map(lambda p: density_fn(p), pts.reshape(-1, chunk, 3))
    return np.asarray(out.reshape(-1)[:n]).reshape(res + 1, res + 1, res + 1)


def extract_mesh(density_fn, res: int = 128, vrange=(-1.2, 1.2),
                 thresh: float = 25.0, chunk: int = 16384):
    """-> (verts [V, 3] world coords, tris [T, 3]). Ref: extract_mesh.py:37-41
    (vertices/res - 0.5 centering is generalised to the query range)."""
    grid = query_density_grid(density_fn, res, vrange, chunk)
    verts, tris = marching_tets(grid, thresh)
    lo, hi = vrange
    verts_world = verts / res * (hi - lo) + lo
    return verts_world, tris


def save_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Minimal OBJ writer (replaces trimesh.export, extract_mesh.py:43-45)."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def save_ply(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    """Binary-less ascii PLY writer (replaces plyfile, utils.py:186-207)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(tris)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")


def convert_density_samples_to_ply(density_grid: np.ndarray, path: str,
                                   bbox: np.ndarray, level: float = 0.5) -> None:
    """tensorf's convert_sdf_samples_to_ply semantics (utils.py:146-207):
    grid in [nx, ny, nz], verts scaled by the bbox voxel size + origin."""
    verts, tris = marching_tets(np.asarray(density_grid, np.float32), level)
    bbox = np.asarray(bbox, np.float32)
    voxel = (bbox[1] - bbox[0]) / (np.asarray(density_grid.shape) - 1)
    verts_world = bbox[0] + verts * voxel
    tris = tris[:, ::-1]  # inverse face orientation like the reference
    save_ply(path, verts_world, tris)
