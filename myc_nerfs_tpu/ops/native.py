"""ctypes bindings to the native C++ runtime components (csrc/).

Builds csrc/libmyc_native.so on demand with make (g++ is baked into the
image; pybind11 is not, so the ABI is plain C + ctypes). Currently exposes:

- marching_tets: isosurface extraction (the native replacement for the
  reference's mcubes/skimage marching cubes — extract_mesh.py:18-46,
  tensorf utils.py:146-207)

A pure-numpy fallback is provided for environments without a compiler and as
the golden reference in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmyc_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mt_run.restype = ctypes.c_void_p
    lib.mt_run.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                           ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
    lib.mt_num_verts.restype = ctypes.c_int64
    lib.mt_num_verts.argtypes = [ctypes.c_void_p]
    lib.mt_num_tris.restype = ctypes.c_int64
    lib.mt_num_tris.argtypes = [ctypes.c_void_p]
    lib.mt_get.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_int32)]
    lib.mt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def marching_tets(grid: np.ndarray, iso: float) -> Tuple[np.ndarray, np.ndarray]:
    """Isosurface of grid [nx, ny, nz] at level ``iso``.

    Returns (verts [V, 3] in grid-index coords, tris [T, 3] int32).
    Uses the C++ extension when available, else the numpy fallback.
    """
    lib = _load()
    grid = np.ascontiguousarray(grid, np.float32)
    if lib is None:
        return marching_tets_numpy(grid, iso)
    h = lib.mt_run(grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   grid.shape[0], grid.shape[1], grid.shape[2],
                   ctypes.c_float(iso))
    nv = lib.mt_num_verts(h)
    nt = lib.mt_num_tris(h)
    verts = np.empty((nv, 3), np.float32)
    tris = np.empty((nt, 3), np.int32)
    lib.mt_get(h, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    lib.mt_free(h)
    return verts, tris


# ---------------------------------------------------------------------------
# numpy fallback (same tetrahedral decomposition; reference for tests)
# ---------------------------------------------------------------------------

_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]])
_CUBE_OFF = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]])
_SINGLE = {0x1: (0, (1, 2, 3), False), 0x2: (1, (0, 3, 2), False),
           0x4: (2, (0, 1, 3), False), 0x8: (3, (0, 2, 1), False),
           0xE: (0, (1, 3, 2), False), 0xD: (1, (0, 2, 3), False),
           0xB: (2, (0, 3, 1), False), 0x7: (3, (0, 1, 2), False)}
_DOUBLE = {0x3: ((0, 2), (0, 3), (1, 3), (1, 2), False),
           0xC: ((0, 2), (0, 3), (1, 3), (1, 2), True),
           0x5: ((0, 1), (2, 1), (2, 3), (0, 3), False),
           0xA: ((0, 1), (2, 1), (2, 3), (0, 3), True),
           0x6: ((1, 0), (2, 0), (2, 3), (1, 3), True),
           0x9: ((1, 0), (2, 0), (2, 3), (1, 3), False)}


def marching_tets_numpy(grid: np.ndarray, iso: float) -> Tuple[np.ndarray, np.ndarray]:
    nx, ny, nz = grid.shape
    coords = {}
    verts = []
    tris = []

    def gid(p):
        return (p[0] * ny + p[1]) * nz + p[2]

    def edge_vert(pa, pb):
        ga, gb = gid(pa), gid(pb)
        if ga > gb:
            pa, pb = pb, pa
            ga, gb = gb, ga
        key = (ga, gb)
        if key in coords:
            return coords[key]
        fa, fb = grid[tuple(pa)], grid[tuple(pb)]
        t = np.clip((iso - fa) / (fb - fa), 0.0, 1.0)
        coords[key] = len(verts)
        verts.append(np.asarray(pa, np.float32) + t * (np.asarray(pb) - np.asarray(pa)))
        return coords[key]

    def emit(a, b, c):
        if a != b and b != c and a != c:
            tris.append((a, b, c))

    it = np.argwhere(np.ones((nx - 1, ny - 1, nz - 1), bool))
    for x, y, z in it:
        corners = np.array([x, y, z]) + _CUBE_OFF
        f = grid[corners[:, 0], corners[:, 1], corners[:, 2]]
        if (f > iso).all() or (f <= iso).all():
            continue
        for tet in _TETS:
            p = corners[tet]
            ft = f[tet]
            mask = int(((ft > iso) * [1, 2, 4, 8]).sum())
            if mask in (0x0, 0xF):
                continue
            if mask in _SINGLE:
                i, rest, _ = _SINGLE[mask]
                vs = [edge_vert(p[i], p[j]) for j in rest]
                emit(*vs)
            else:
                e0, e1, e2, e3, flip = _DOUBLE[mask]
                a = edge_vert(p[e0[0]], p[e0[1]])
                b = edge_vert(p[e1[0]], p[e1[1]])
                c = edge_vert(p[e2[0]], p[e2[1]])
                d = edge_vert(p[e3[0]], p[e3[1]])
                if flip:
                    emit(a, c, b)
                    emit(a, d, c)
                else:
                    emit(a, b, c)
                    emit(a, c, d)
    v = np.stack(verts) if verts else np.zeros((0, 3), np.float32)
    t = np.asarray(tris, np.int32).reshape(-1, 3)
    return v, t


def build_ray_store_native(c2w: np.ndarray, H: int, W: int, fx: float,
                           fy: float, cx: Optional[float] = None,
                           cy: Optional[float] = None,
                           n_threads: int = 0) -> Optional[np.ndarray]:
    """Multithreaded flat [N*H*W, 6] ray store (csrc/ray_store.cpp).

    The native data-loader replacement for the tensorf host precompute
    (dataLoader/blender.py:63-129). Returns None when the native lib is
    unavailable (callers fall back to the jnp path).
    """
    lib = _load()
    if lib is None:
        return None
    if not hasattr(lib, "rs_build"):
        return None
    lib.rs_build.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
                             ctypes.c_float, ctypes.c_float, ctypes.c_float,
                             ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    c2w = np.ascontiguousarray(c2w, np.float32)
    assert c2w.ndim == 3 and c2w.shape[1:] == (3, 4), c2w.shape
    n = c2w.shape[0]
    out = np.empty((n * H * W, 6), np.float32)
    cx = W / 2.0 if cx is None else cx
    cy = H / 2.0 if cy is None else cy
    lib.rs_build(c2w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                 n, H, W, fx, fy, cx, cy,
                 out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                 n_threads)
    return out
