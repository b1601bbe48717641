"""Bilinear/trilinear grid sampling with align_corners=True semantics.

TPU-native equivalent of torch/Jittor ``F.grid_sample`` as used by TensoRF
factor grids (tensorf-myc/models/tensoRF.py:209-244) and the alpha mask
(tensorBase.py:39-59). Coordinates are in [-1, 1] per grid_sample
convention; out-of-range coordinates clamp to the border (matching the
reference's usage where coords are pre-normalised in-bounds).

TPU design: random access on this chip is issue-rate bound PER GATHERED
ROW and nearly insensitive to row width (PERF_NOTES.md). A naive bilinear
does 4 independent C-wide gathers per sample (8 for trilinear), and its
autodiff transpose becomes 4 (8) NARROW scatter-adds — the slowest access
pattern measured (~11 Mrows/s). Here the grid is first re-packed so that
row (y, x) holds ALL 2x2(x2) corner values — a handful of dense shifted
copies, trivial next to the sample count — and each sample then needs ONE
wide-row gather; the backward becomes ONE wide-row scatter-add per sample
plus a dense shift-sum. Numerics are identical to the 4-corner
formulation. (A windowed ``lax.gather`` with slice_sizes=(2,2,C) expresses
the same thing directly but its scatter transpose crashes this platform's
TPU runtime inside lax.scan, so the packing is done with plain ops.)
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["grid_sample_2d", "grid_sample_3d", "cell_base_index"]

# volumes whose 8x corner-packed copy would exceed this many elements use
# per-corner gathers instead (the pack is rebuilt per call)
PACK_MAX_ELEMS = 1 << 24


def _unnormalize(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1,1] -> [0, size-1] continuous index (align_corners=True)."""
    return (coord + 1.0) * 0.5 * (size - 1)


def _base_and_weight(coord: jnp.ndarray, size: int):
    """Cell start index (clamped so start+1 <= size-1) + lerp weight.

    At the top border the start shifts down one cell and the weight becomes
    1, selecting the same corner value — identical to the clamped 4-corner
    math for any in-range coordinate.
    """
    c = _unnormalize(coord, size)
    if size == 1:
        return jnp.zeros_like(c, jnp.int32), jnp.zeros_like(c)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, size - 2)
    w = jnp.clip(c - i0, 0.0, 1.0)
    return i0, w


def cell_base_index(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Start index of the trilinear cell a [-1,1] coordinate falls in.

    The same clamped floor `_base_and_weight` uses, exported so occupancy
    lookups (one nearest gather on a corner-dilated binary volume) index
    the exact cell the trilinear path would interpolate.
    """
    return _base_and_weight(coord, size)[0]


def _shift(arr: jnp.ndarray, axis: int) -> jnp.ndarray:
    """arr advanced one step along axis, border row repeated."""
    n = arr.shape[axis]
    if n == 1:
        return arr
    head = jnp.take(arr, jnp.arange(1, n), axis=axis)
    tail = jnp.take(arr, jnp.array([n - 1]), axis=axis)
    return jnp.concatenate([head, tail], axis=axis)


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [C, H, W] at coords [..., 2] ((x, y) in [-1, 1]).

    Returns [..., C]. Bilinear, align_corners=True, border clamp.
    """
    C, H, W = grid.shape
    shape = coords.shape[:-1]
    x0, wx = _base_and_weight(coords[..., 0].reshape(-1), W)
    y0, wy = _base_and_weight(coords[..., 1].reshape(-1), H)

    g = jnp.moveaxis(grid, 0, -1)          # [H, W, C]
    gx = _shift(g, 1)                      # g[y, x+1]
    gy = _shift(g, 0)                      # g[y+1, x]
    gxy = _shift(gx, 0)                    # g[y+1, x+1]
    packed = jnp.concatenate([g, gx, gy, gxy], axis=-1).reshape(H * W, 4 * C)
    rows = packed[y0 * W + x0]             # [N, 4C] — ONE row per sample
    v00, v01, v10, v11 = (rows[:, i * C:(i + 1) * C] for i in range(4))

    wx = wx[:, None]
    wy = wy[:, None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out.reshape(shape + (C,))


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample grid [C, D, H, W] at coords [..., 3] ((x, y, z) in [-1, 1]).

    grid_sample convention: x indexes W, y indexes H, z indexes D.
    Returns [..., C]. Trilinear, align_corners=True, border clamp.
    """
    C, D, H, W = grid.shape
    shape = coords.shape[:-1]
    x0, wx = _base_and_weight(coords[..., 0].reshape(-1), W)
    y0, wy = _base_and_weight(coords[..., 1].reshape(-1), H)
    z0, wz = _base_and_weight(coords[..., 2].reshape(-1), D)

    g = jnp.moveaxis(grid, 0, -1)          # [D, H, W, C]
    if D * H * W * 8 * C <= PACK_MAX_ELEMS:
        corners = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    c = g
                    if dx:
                        c = _shift(c, 2)
                    if dy:
                        c = _shift(c, 1)
                    if dz:
                        c = _shift(c, 0)
                    corners.append(c)
        packed = jnp.concatenate(corners, axis=-1).reshape(D * H * W, 8 * C)
        rows = packed[(z0 * H + y0) * W + x0]  # [N, 8C]
        v = [rows[:, i * C:(i + 1) * C] for i in range(8)]
    else:
        # packing a big volume (e.g. the 256^3 alpha mask) would materialize
        # an 8x copy per call; fall back to 8 per-corner gathers
        gf = g.reshape(D * H * W, C)
        jx1 = jnp.minimum(x0 + (1 if W > 1 else 0), W - 1)
        jy1 = jnp.minimum(y0 + (1 if H > 1 else 0), H - 1)
        jz1 = jnp.minimum(z0 + (1 if D > 1 else 0), D - 1)
        v = [gf[(zz * H + yy) * W + xx]
             for zz in (z0, jz1) for yy in (y0, jy1) for xx in (x0, jx1)]

    wx = wx[:, None]
    wy = wy[:, None]
    wz = wz[:, None]
    # corner order: index = dz*4 + dy*2 + dx
    c00 = v[0] * (1 - wx) + v[1] * wx
    c01 = v[2] * (1 - wx) + v[3] * wx
    c10 = v[4] * (1 - wx) + v[5] * wx
    c11 = v[6] * (1 - wx) + v[7] * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    out = c0 * (1 - wz) + c1 * wz
    return out.reshape(shape + (C,))
