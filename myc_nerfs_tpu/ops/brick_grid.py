"""Brick-packed multiresolution grid encoding — the TPU-fast hash grid.

Re-designs the reference's hash-grid encode (jnerf-myc/.../hash_encoder/
grid_encode.py + op_header/HashEncode.h:37-200) for TPU memory behavior
instead of translating its CUDA gather:

The CUDA kernel gathers 8 corner feature vectors per sample per level —
8 x n_levels tiny random reads, which GPUs do well. On this TPU, random
access is *issue-rate bound per gathered row* (~200 Mrows/s) and nearly
insensitive to row width (measured: 60 Mrows/s at 8 B rows vs 39 Mrows/s at
1 KiB rows, single op; ~200 Mrows/s marginal inside a program). So the
table is re-laid-out into *bricks*: each table row stores all 5^3 vertices
of a 4^3-cell spatial brick (padded to 128 lanes, feature-major), and a
sample needs exactly ONE wide row per level — 16 gathered rows/sample for
L16F2 instead of 128. The backward pass becomes one wide-row scatter-add
per level (~175 Mrows/s) instead of the 8x-slower narrow atomic scatter the
reference uses (kernel_grid_backward, grid_encode.py:132-191).

Semantics vs the reference:
- Same per-level scales/resolutions (grid_encode.py:18-35) and the same
  sample->cell->trilinear math; within a brick the interpolation is exactly
  the classic shared-vertex trilinear (tested against models/ngp.hash_encode
  on dense levels).
- Coarse levels whose brick grid fits the per-level budget are dense
  (identity indexing, exact). Finer levels hash the *brick* coordinate with
  the reference's primes (p0 ^ p1*19349663 ^ p2*83492791, configs/
  Easyship.py:89) modulo the brick count. Hash collisions therefore happen
  at brick granularity, and vertices on faces shared by two bricks are
  stored twice (trained independently) — the same kind of sloppiness the
  reference's vertex-level hash collisions already inject, traded for a 15x
  cheaper memory access pattern. Parameter budget per level is identical:
  2^log2_hashmap_size feature vectors = bricks_per_level * 128.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ngp import HashGridConfig, HASH_PRIMES

BRICK_CELLS = 4          # cells per axis per brick
BRICK_VERTS = 5          # vertices per axis (4 cells)
ROW_VERTS = 128          # 5^3 = 125 padded to one lane group
ONEHOT_MAX_ROWS = 384    # levels this small go through the MXU, not gathers


@dataclasses.dataclass(frozen=True)
class BrickLevels:
    """Host-side static per-level geometry of the brick layout."""

    scales: Tuple[float, ...]
    resolutions: Tuple[int, ...]      # vertices per axis (reference semantics)
    brick_dims: Tuple[Tuple[int, int, int], ...]  # dense brick-grid dims
    dense: Tuple[bool, ...]
    n_bricks: Tuple[int, ...]         # rows per level (dense: exact count)
    bricks_per_level: int             # hashed-level row budget
    n_levels: int


def compute_brick_levels(cfg: HashGridConfig) -> BrickLevels:
    """Same scale/res derivation as models/ngp.compute_levels
    (grid_encode.py:18-35); brick budget = 2^log2_hashmap_size / 128 rows."""
    bricks_per_level = max(1, (1 << cfg.log2_hashmap_size) // ROW_VERTS)
    scales, resos, dims, dense, counts = [], [], [], [], []
    for lv in range(cfg.n_levels):
        scale = 2.0 ** (lv * np.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
        res = int(np.ceil(scale)) + 1
        bx = (res + BRICK_CELLS - 1) // BRICK_CELLS
        is_dense = bx ** 3 <= bricks_per_level
        scales.append(float(scale))
        resos.append(res)
        dims.append((bx, bx, bx))
        dense.append(is_dense)
        counts.append(bx ** 3 if is_dense else bricks_per_level)
    return BrickLevels(scales=tuple(scales), resolutions=tuple(resos),
                       brick_dims=tuple(dims), dense=tuple(dense),
                       n_bricks=tuple(counts),
                       bricks_per_level=bricks_per_level,
                       n_levels=cfg.n_levels)


def init_brick_table(key: jax.Array, cfg: HashGridConfig,
                     levels: Optional[BrickLevels] = None,
                     dtype=jnp.float32) -> List[jnp.ndarray]:
    """Uniform(+-1e-4) like the reference (hash_encoder.py:22-23).

    One array per level, shape [n_bricks, 128 * F], feature-major lanes:
    row = [f0 at verts 0..127 | f1 at verts 0..127 | ...]. Per-level arrays
    (rather than one stacked table) keep the 16 backward scatter-adds
    independent so XLA can overlap them instead of chaining accumulations
    into a single gradient buffer.
    """
    levels = levels or compute_brick_levels(cfg)
    keys = jax.random.split(key, levels.n_levels)
    return [jax.random.uniform(keys[lv],
                               (levels.n_bricks[lv], ROW_VERTS * cfg.n_features),
                               dtype=dtype, minval=-1e-4, maxval=1e-4)
            for lv in range(levels.n_levels)]


def _vert_selectors(dtype=np.float32):
    """Static 5x128 0/1 selectors: lane v holds vertex (ix, iy, iz) with
    v = ix*25 + iy*5 + iz (lanes 125..127 zero). wx @ Sx broadcasts the
    per-axis hat weights into the 128-lane layout with two MXU-friendly
    matmuls instead of an outer-product + pad + reshape relayout."""
    Sx = np.zeros((BRICK_VERTS, ROW_VERTS), dtype)
    Sy = np.zeros((BRICK_VERTS, ROW_VERTS), dtype)
    Sz = np.zeros((BRICK_VERTS, ROW_VERTS), dtype)
    for v in range(BRICK_VERTS ** 3):
        Sx[v // 25, v] = 1.0
        Sy[(v // 5) % 5, v] = 1.0
        Sz[v % 5, v] = 1.0
    return Sx, Sy, Sz


_SELECTORS = _vert_selectors()


def brick_coords(pos: jnp.ndarray, scales: jnp.ndarray):
    """Shared coordinate split: pos [N, 3] x scales [L] ->
    (brick [N, L, 3] float integer-valued, u [N, L, 3] in [0, 4)).

    Matches the reference's per-level cell derivation (HashEncode.h:37-66:
    pos*scale + 0.5, floor to cells) regrouped to 4^3-cell bricks. Used by
    brick_encode, paired_encode, and the level-TP local encoder so the
    layout math exists in exactly one place.
    """
    p = pos[:, None, :] * scales[None, :, None] + 0.5
    brick = jnp.floor(jnp.floor(p) * (1.0 / BRICK_CELLS))
    return brick, p - brick * BRICK_CELLS


def hash_bricks(brick: jnp.ndarray) -> jnp.ndarray:
    """Unmasked uint32 prime-XOR hash of brick coords [..., 3] — the
    reference's injected hash function (configs/Easyship.py:89) applied at
    brick granularity. Callers mask by their power-of-two row count."""
    b = brick if brick.dtype == jnp.uint32 else brick.astype(jnp.uint32)
    return (b[..., 0] * np.uint32(HASH_PRIMES[0])
            ^ b[..., 1] * np.uint32(HASH_PRIMES[1])
            ^ b[..., 2] * np.uint32(HASH_PRIMES[2]))


def hat_tents(u: jnp.ndarray, wdtype=None) -> jnp.ndarray:
    """Per-axis tent weights: u [..., 3] in [0, 4) -> [..., 3, 5].
    hat(u - i) is nonzero only at i = floor(u), +1."""
    iota = jnp.arange(BRICK_VERTS, dtype=u.dtype)
    h = jnp.maximum(0.0, 1.0 - jnp.abs(u[..., None] - iota))
    return h.astype(wdtype) if wdtype is not None else h


def combine_tents(h: jnp.ndarray) -> jnp.ndarray:
    """Tent weights [..., 3, 5] -> row weights [..., 128] via the 5x128
    selector matmuls (MXU-friendly; the per-axis product of broadcast hats
    reproduces the cell's trilinear weights exactly, slots 125..127 zero).
    """
    Sx, Sy, Sz = (jnp.asarray(s, h.dtype) for s in _SELECTORS)
    return (h[..., 0, :] @ Sx) * (h[..., 1, :] @ Sy) * (h[..., 2, :] @ Sz)


def _hat_weights(u: jnp.ndarray) -> jnp.ndarray:
    """Per-sample trilinear weights over the brick's 5^3 vertices:
    u [N, 3] in [0, 4) -> [N, 128]."""
    return combine_tents(hat_tents(u))


def _brick_ids(levels: BrickLevels, lv: int, brick: jnp.ndarray) -> jnp.ndarray:
    """Row index for float brick coords [N, 3] (integer-valued).

    Dense: row-major, computed in f32 (exact: counts < 2^24) with a clip
    instead of a mod — TPU integer div/mod is emulated and slow. Hashed: the
    reference's prime XOR hash (configs/Easyship.py:89) on the brick
    coordinate, masked by the power-of-two brick budget.
    """
    if levels.dense[lv]:
        bx, by, bz = levels.brick_dims[lv]
        b = jnp.clip(brick, 0.0, jnp.asarray([bx - 1, by - 1, bz - 1],
                                             brick.dtype))
        idx = b[:, 0] + b[:, 1] * bx + b[:, 2] * (bx * by)
        return idx.astype(jnp.int32)
    n = levels.n_bricks[lv]
    assert n & (n - 1) == 0, "hashed brick count must be a power of two"
    return (hash_bricks(brick) & np.uint32(n - 1)).astype(jnp.int32)


@dataclasses.dataclass(frozen=True)
class LevelGroups:
    """Static grouping of levels into shared-row tables (paired bricks).

    Round-3 measurement (scripts/probe_r3a/r3b): the encode-backward
    scatter-add is bandwidth/issue bound per ISSUED row — duplication of
    target rows is irrelevant, and any sort/permute pre-accumulation pays
    the same per-row cost it saves. The remaining lever is issuing fewer,
    fatter rows: PAIR adjacent hashed levels into one table whose row is
    keyed by the finer level's 4^3 brick and stores both the finer level's
    5^3 verts and the coarser level's 5^3 verts covering the same spatial
    extent (valid whenever the level scale ratio r >= 4/3: the coarse
    window spans 4/r + 1 < 4 cells -> 5 verts per axis). Halves both the
    gathered rows (forward) and the scattered rows (backward) for the
    hashed levels at identical parameter budget: rows = 2^log2_hashmap/128,
    width = 2*F*128.

    Semantics change vs per-level bricks (quality-gated, see
    scripts/quality_parity.py): the coarser member's verts are stored per
    fine-brick row, so each coarse vert has ~r^3 independent copies and the
    coarse level is hashed at the finer level's granularity. The finer
    member's collision structure is IDENTICAL to the shipped brick layout.

    groups: tuples of member level ids, coarse->fine; the last member is
    the KEY level whose brick grid indexes the row. Dense levels stay
    single so their exact (collision-free) semantics are untouched.
    """

    groups: Tuple[Tuple[int, ...], ...]


def compute_level_groups(levels: BrickLevels,
                         min_ratio: float = 4.0 / 3.0,
                         group_size: int = 2) -> LevelGroups:
    """Group up to ``group_size`` consecutive hashed levels from the fine
    end; dense levels and any ratio-violating hashed level stay single.

    Every member's window fits 5 verts/axis as long as each ADJACENT scale
    ratio is >= min_ratio (a farther member has a larger key/member ratio,
    which only shrinks its window). probe_r3b measured the scatter/gather
    bandwidth sweet spot at 768-float rows -> group_size=3 ('brick3').
    """
    hashed = [lv for lv in range(levels.n_levels) if not levels.dense[lv]]
    groups = [(lv,) for lv in range(levels.n_levels) if levels.dense[lv]]
    i = len(hashed) - 1
    while i >= 0:
        members = [hashed[i]]
        j = i - 1
        while (j >= 0 and len(members) < group_size
               and hashed[j] == members[-1] - 1
               and (levels.scales[members[-1]] / levels.scales[hashed[j]])
               >= min_ratio):
            members.append(hashed[j])
            j -= 1
        groups.append(tuple(reversed(members)))
        i = j
    groups.sort()
    return LevelGroups(groups=tuple(groups))


def init_paired_table(key: jax.Array, cfg: HashGridConfig,
                      levels: Optional[BrickLevels] = None,
                      groups: Optional[LevelGroups] = None,
                      dtype=jnp.float32) -> List[jnp.ndarray]:
    """One array per GROUP: [rows, len(group) * F * 128], uniform(+-1e-4)
    (hash_encoder.py:22-23). Single groups match init_brick_table exactly;
    paired groups hold two levels' budget in double-width rows."""
    levels = levels or compute_brick_levels(cfg)
    groups = groups or compute_level_groups(levels)
    keys = jax.random.split(key, len(groups.groups))
    out = []
    for g, members in enumerate(groups.groups):
        rows = levels.n_bricks[members[-1]]
        width = len(members) * cfg.n_features * ROW_VERTS
        out.append(jax.random.uniform(keys[g], (rows, width), dtype=dtype,
                                      minval=-1e-4, maxval=1e-4))
    return out


def paired_encode(tables: List[jnp.ndarray], positions: jnp.ndarray,
                  cfg: HashGridConfig,
                  levels: Optional[BrickLevels] = None,
                  groups: Optional[LevelGroups] = None,
                  stop_pos_grad: bool = True,
                  compute_dtype=None) -> jnp.ndarray:
    """Grouped-table variant of brick_encode: one wide-row gather (and one
    scatter-add in the backward) per GROUP instead of per level. Output is
    assembled in level order, identical shape/semantics contract to
    brick_encode ([..., n_levels * F]).
    """
    levels = levels or compute_brick_levels(cfg)
    groups = groups or compute_level_groups(levels)
    F = cfg.n_features
    shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    if stop_pos_grad:
        pos = jax.lax.stop_gradient(pos)
    N = pos.shape[0]
    wdtype = compute_dtype or tables[0].dtype

    def hat128(u):
        return combine_tents(hat_tents(u, wdtype))

    # key-level (finest member) cell math, batched over groups like
    # brick_encode's fused all-level chain
    key_lvls = [m[-1] for m in groups.groups]
    key_scales = jnp.asarray([levels.scales[k] for k in key_lvls], pos.dtype)
    brick, u_key = brick_coords(pos, key_scales)               # [N, G, 3]

    per_level_feats: List[Optional[jnp.ndarray]] = [None] * levels.n_levels
    for g, members in enumerate(groups.groups):
        table = tables[g]
        if compute_dtype is not None and table.dtype != compute_dtype:
            table = table.astype(compute_dtype)
        key_lv = members[-1]
        bids = _brick_ids(levels, key_lv, brick[:, g])
        n_rows = table.shape[0]
        if len(members) == 1 and n_rows <= ONEHOT_MAX_ROWS:
            onehot = (bids[:, None]
                      == jnp.arange(n_rows, dtype=jnp.int32)[None, :])
            rows = onehot.astype(wdtype) @ table
        else:
            rows = table[bids]
        # per-member hat weights: the key member uses its own brick-local
        # coords; a coarser member's window base is a function of the KEY
        # brick only, so every sample in the row agrees on the stored verts
        for j, lv in enumerate(members):
            if lv == key_lv:
                wl = hat128(u_key[:, g])
            else:
                r = levels.scales[key_lv] / levels.scales[lv]
                x_c = pos * jnp.asarray(levels.scales[lv], pos.dtype) + 0.5
                base_c = jnp.floor((BRICK_CELLS * brick[:, g] - 0.5)
                                   * (1.0 / r) + 0.5)
                wl = hat128(x_c - base_c)
            off = j * F * ROW_VERTS
            feats = [(rows[:, off + f * ROW_VERTS:off + (f + 1) * ROW_VERTS]
                      * wl).sum(-1) for f in range(F)]
            per_level_feats[lv] = jnp.stack(feats, axis=-1)
    out = jnp.concatenate(per_level_feats, axis=-1)
    return out.reshape(shape + (cfg.out_dim,))


def brick_encode(tables: List[jnp.ndarray], positions: jnp.ndarray,
                 cfg: HashGridConfig,
                 levels: Optional[BrickLevels] = None,
                 stop_pos_grad: bool = True,
                 compute_dtype=None) -> jnp.ndarray:
    """Encode positions [..., 3] in [0, 1] -> [..., n_levels * F].

    One wide-row gather + hat-weight lane reduction per level. The backward
    w.r.t. the table is XLA's gather transpose — ONE wide-row scatter-add
    per level (replacing kernel_grid_backward's atomic narrow scatter).

    ``compute_dtype=jnp.bfloat16`` gathers and interpolates in bf16 (halves
    the HBM round-trip of the materialized gather outputs — the residual
    forward cost); the reference likewise keeps its grid + grid grads in
    fp16. Table params stay f32 (Adam moments in f32).
    """
    levels = levels or compute_brick_levels(cfg)
    F = cfg.n_features
    L = cfg.n_levels
    shape = positions.shape[:-1]
    pos = positions.reshape(-1, 3)
    if stop_pos_grad:
        # the reference never backprops into sample positions
        # (grid_encode.py grad returns grid gradients only)
        pos = jax.lax.stop_gradient(pos)
    N = pos.shape[0]

    # --- all-level index + weight math in ONE fused chain (per-level loops
    # fragment into 16 small elementwise graphs that each round-trip HBM)
    scales = jnp.asarray(levels.scales, pos.dtype)              # [L]
    brick, u = brick_coords(pos, scales)                        # [N, L, 3]

    dims = np.asarray(levels.brick_dims, np.float32)            # [L, 3]
    dense = np.asarray(levels.dense)
    # dense: row-major in f32 (exact below 2^24), clip instead of mod
    bc = jnp.clip(brick, 0.0, jnp.asarray(dims - 1.0, pos.dtype))
    dense_idx = (bc[..., 0] + bc[..., 1] * jnp.asarray(dims[:, 0], pos.dtype)
                 + bc[..., 2] * jnp.asarray(dims[:, 0] * dims[:, 1], pos.dtype))
    # hashed: reference prime XOR on the brick coordinate, pow2 mask
    masks = np.asarray([n - 1 for n in levels.n_bricks], np.uint32)
    hash_idx = hash_bricks(brick) & jnp.asarray(masks)[None, :]
    bids = jnp.where(jnp.asarray(dense)[None, :],
                     dense_idx.astype(jnp.int32),
                     hash_idx.astype(jnp.int32))                # [N, L]

    wdtype = compute_dtype or tables[0].dtype
    hat = hat_tents(u, wdtype)                                  # [N, L, 3, 5]

    outs: List[jnp.ndarray] = []
    for lv in range(L):
        table = tables[lv]
        if compute_dtype is not None and table.dtype != compute_dtype:
            table = table.astype(compute_dtype)
        wl = combine_tents(hat[:, lv])
        n_rows = table.shape[0]
        if n_rows <= ONEHOT_MAX_ROWS:
            # tiny dense level: route the row selection through the MXU.
            # gather/scatter on this chip is issue-rate bound per row
            # (~150-200 Mrows/s fwd, ~70-100 Mrows/s scatter transpose —
            # PERF_NOTES §5b); a one-hot matmul moves the same rows as
            # dense FLOPs and autodiffs to a dense matmul backward,
            # removing both the gather and its scatter-add transpose.
            onehot = (bids[:, lv:lv + 1]
                      == jnp.arange(n_rows, dtype=jnp.int32)[None, :])
            rows = onehot.astype(wdtype) @ table    # [N, 128*F] via MXU
        else:
            rows = table[bids[:, lv]]               # [N, 128*F] one wide row
        # per-level weight expansion (an all-level [N, L, 128] tensor would
        # materialize GBs at render batch sizes)
        feats = [(rows[:, f * ROW_VERTS:(f + 1) * ROW_VERTS] * wl).sum(-1)
                 for f in range(F)]
        outs.append(jnp.stack(feats, axis=-1))      # [N, F]
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(shape + (cfg.out_dim,))
