"""TensoRF factor-grid radiance fields (VM-split + CP), TPU-native.

Re-implements tensorf-myc/models/{tensorBase,tensoRF}.py as a functional
JAX program:

- params are an explicit pytree (factor grids + basis matrix + shading MLP);
  progressive upsampling/AABB shrink are host-side *functional* transforms
  between jitted training stages (the reference mutates modules in place,
  tensoRF.py:248-314 — SURVEY.md §7.3)
- grid_sample calls become gather+lerp (ops/grid_sample.py), lines are 1D lerps
- the reference's data-dependent boolean-mask two-phase evaluation
  (tensorBase.py:476-536) becomes static-shape masked compute: density and
  appearance are evaluated under `where` masks so gradients match, with
  bounded rather than skipped work
- alpha-mask grid and its update (tensorBase.py:366-409) are pure functions

Key references: TensorVMSplit (tensoRF.py:140-314), TensorCP
(tensoRF.py:317-447), TensorBase.execute (tensorBase.py:476-536),
AlphaGridMask (tensorBase.py:39-59), shading MLPs (tensorBase.py:62-136).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compaction import compact_first_k
from ..ops.grid_sample import cell_base_index, grid_sample_2d, grid_sample_3d
from ..ops.sh import eval_sh_bases
from ..render.composite import raw2alpha

MAT_MODE = ((0, 1), (0, 2), (1, 2))  # tensorBase.py:168
VEC_MODE = (2, 1, 0)                 # tensorBase.py:169


@dataclasses.dataclass(frozen=True)
class TensoRFConfig:
    """Static model config (parity with tensorf-myc opt.py / TensorBase kwargs)."""

    decomp: str = "vm_split"                     # vm_split | cp
    density_n_comp: Tuple[int, ...] = (16, 16, 16)
    app_n_comp: Tuple[int, ...] = (48, 48, 48)
    app_dim: int = 27
    shading_mode: str = "MLP_Fea"                # MLP_PE | MLP_Fea | MLP | SH | RGB
    density_shift: float = -10.0
    alpha_mask_thres: float = 1e-3
    distance_scale: float = 25.0
    ray_march_weight_thres: float = 1e-4
    pos_pe: int = 6
    view_pe: int = 6
    fea_pe: int = 6
    featureC: int = 128
    step_ratio: float = 2.0
    fea2dense: str = "softplus"
    near_far: Tuple[float, float] = (2.0, 6.0)
    # static-shape resolution of the reference's dynamic app_mask indexing
    # (tensorBase.py:505-518): appearance features + the shading MLP run on
    # at most this many weight>thresh survivors per ray (first-K by depth,
    # cumsum-rank compaction). 0 = evaluate all samples (exact but ~4x the
    # appearance-side row traffic at typical survivor rates). Only active
    # once an alpha mask exists (update_AlphaMask culls empty space, making
    # survivors sparse); before that — early training with diffuse density,
    # where most samples pass the weight threshold — the exact full-sample
    # path runs. Post-mask rays with more survivors than the budget drop
    # the deepest ones (T there is < weight_thres * S in practice).
    app_sample_budget: int = 96
    # Cross-ray (whole-batch) density compaction: the CLOSEST static-shape
    # analog of the reference's flattened ray_valid boolean indexing
    # (tensorBase.py:497-504, which gathers xyz_sampled[ray_valid] across
    # the whole batch into one dense buffer). Survivor samples are packed
    # in SAMPLE-MAJOR order (all rays' sample 0, then sample 1, ...) into
    # this many slots, so overflow drops the deepest-rank samples
    # UNIFORMLY across rays instead of truncating whole thick rays the way
    # the per-ray budget does. Exact (bit-identical composite) whenever
    # total batch survivors <= budget. 0 = off. Mutually exclusive with
    # density_sample_budget; gated like it on the alpha mask existing.
    density_batch_budget: int = 0
    # Cast the factor tensors (planes + lines) to bf16 for the per-sample
    # gathers only. The r5 stage decomposition (probe_r5_tensorf `stages`)
    # puts the app stage at the wide-row gather bandwidth wall (~27 GB/s,
    # 768 B packed plane rows, PERF_NOTES par.7 cost model); halving the
    # row bytes halves both the forward gather and its scatter-add
    # transpose. Master params, Adam moments, and the dense pack stay f32
    # (grads accumulate through the cast's f32 transpose) — only the
    # gathered VALUES are rounded to bf16 (~3 decimal digits), which is
    # below the factor tensors' own TV-regularised noise floor. Gated at
    # the Coffee 30k horizon like every throughput knob.
    factor_gather_bf16: bool = False
    # static-shape resolution of the reference's ray_valid boolean indexing
    # (tensorBase.py:497-504): density factors are only evaluated at samples
    # that pass the AABB clip + alpha-mask gates, compacted to at most this
    # many per ray (first-K by depth). Composite-exact whenever a ray has
    # <= budget gated samples (dropped samples carry sigma=0 and so change
    # neither transmittance nor any weight); rays with more drop the
    # deepest. 0 = evaluate all samples. Gated like app_sample_budget on
    # the alpha mask existing — pre-mask stages run the exact full path.
    density_sample_budget: int = 0


class StageGeom(NamedTuple):
    """Host-side static geometry for one training stage (update_stepSize,
    tensorBase.py:197-209)."""

    grid_size: Tuple[int, int, int]
    step_size: float
    n_samples: int
    units: Tuple[float, float, float]


def compute_stage_geom(cfg: TensoRFConfig, aabb: np.ndarray,
                       grid_size: Sequence[int],
                       n_samples_cap: int = 0) -> StageGeom:
    aabb = np.asarray(aabb, np.float64)
    size = aabb[1] - aabb[0]
    gs = np.asarray(grid_size, np.float64)
    units = size / (gs - 1)
    step = float(units.mean() * cfg.step_ratio)
    diag = float(np.sqrt((size**2).sum()))
    n = int(diag / step) + 1
    if n_samples_cap:
        n = min(n, n_samples_cap)
    return StageGeom(grid_size=tuple(int(g) for g in grid_size), step_size=step,
                     n_samples=n, units=tuple(float(u) for u in units))


# ---------------------------------------------------------------------------
# shading modules (tensorBase.py:62-136)
# ---------------------------------------------------------------------------

def _tensorf_pe(x: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """TensoRF PE layout: [sin(all freqs/dims), cos(all freqs/dims)].

    Ref: tensorBase.py:9-15 (differs from barf layout).
    """
    bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * bands).reshape(x.shape[:-1] + (freqs * x.shape[-1],))
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


class MLPRender(nn.Module):
    """Shared 3-layer shading MLP; inputs vary per mode (tensorBase.py:62-136)."""

    mode: str = "MLP_Fea"
    view_pe: int = 6
    fea_pe: int = 6
    pos_pe: int = 6
    featureC: int = 128

    @nn.compact
    def __call__(self, pts, viewdirs, features):
        indata = [features, viewdirs]
        if self.mode == "MLP_Fea":
            if self.fea_pe > 0:
                indata.append(_tensorf_pe(features, self.fea_pe))
            if self.view_pe > 0:
                indata.append(_tensorf_pe(viewdirs, self.view_pe))
        elif self.mode == "MLP_PE":
            if self.pos_pe > 0:
                indata.append(_tensorf_pe(pts, self.pos_pe))
            if self.view_pe > 0:
                indata.append(_tensorf_pe(viewdirs, self.view_pe))
        elif self.mode == "MLP":
            if self.view_pe > 0:
                indata.append(_tensorf_pe(viewdirs, self.view_pe))
        x = jnp.concatenate(indata, axis=-1)
        x = nn.relu(nn.Dense(self.featureC)(x))
        x = nn.relu(nn.Dense(self.featureC)(x))
        x = nn.Dense(3, bias_init=nn.initializers.zeros)(x)
        return jax.nn.sigmoid(x)


def sh_render(pts, viewdirs, features):
    """SH shading (tensorBase.py:27-31): features are deg-2 SH coeffs."""
    sh_mult = eval_sh_bases(2, viewdirs)[..., None, :]
    rgb_sh = features.reshape(features.shape[:-1] + (3, 9))
    return nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)


# ---------------------------------------------------------------------------
# init / factor evaluation
# ---------------------------------------------------------------------------

def init_tensorf(key: jax.Array, cfg: TensoRFConfig, aabb,
                 grid_size: Sequence[int]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Init (params, buffers). Grids ~ N(0, scale) like init_one_svd
    (tensoRF.py:153-163, scale 0.1 VM / 0.2 CP)."""
    gs = [int(g) for g in grid_size]
    keys = jax.random.split(key, 16)
    params: Dict[str, Any] = {}
    if cfg.decomp == "vm_split":
        scale = 0.1
        params["density_plane"] = tuple(
            scale * jax.random.normal(keys[i], (cfg.density_n_comp[i],
                                                gs[MAT_MODE[i][1]], gs[MAT_MODE[i][0]]))
            for i in range(3))
        params["density_line"] = tuple(
            scale * jax.random.normal(keys[3 + i], (cfg.density_n_comp[i], gs[VEC_MODE[i]]))
            for i in range(3))
        params["app_plane"] = tuple(
            scale * jax.random.normal(keys[6 + i], (cfg.app_n_comp[i],
                                                    gs[MAT_MODE[i][1]], gs[MAT_MODE[i][0]]))
            for i in range(3))
        params["app_line"] = tuple(
            scale * jax.random.normal(keys[9 + i], (cfg.app_n_comp[i], gs[VEC_MODE[i]]))
            for i in range(3))
        n_basis_in = sum(cfg.app_n_comp)
    elif cfg.decomp == "cp":
        scale = 0.2
        params["density_line"] = tuple(
            scale * jax.random.normal(keys[i], (cfg.density_n_comp[0], gs[VEC_MODE[i]]))
            for i in range(3))
        params["app_line"] = tuple(
            scale * jax.random.normal(keys[3 + i], (cfg.app_n_comp[0], gs[VEC_MODE[i]]))
            for i in range(3))
        n_basis_in = cfg.app_n_comp[0]
    elif cfg.decomp == "vm":
        # non-split TensorVM: shared [3, D+A, res, res] plane + [3, D+A, res]
        # line with a single cubic res (tensoRF.py:4-31); density = last D
        # comps, appearance = first A comps
        scale = 0.1
        D, A = cfg.density_n_comp[0], cfg.app_n_comp[0]
        res = gs[0]
        params["vm_plane"] = tuple(
            scale * jax.random.normal(keys[i], (D + A, res, res))
            for i in range(3))
        params["vm_line"] = tuple(
            scale * jax.random.normal(keys[3 + i], (D + A, res))
            for i in range(3))
        n_basis_in = 3 * A
    else:
        raise ValueError(cfg.decomp)
    # basis_mat: Linear(no bias) default torch init U(-1/sqrt(in), 1/sqrt(in))
    bound = 1.0 / np.sqrt(n_basis_in)
    params["basis_mat"] = jax.random.uniform(keys[12], (n_basis_in, cfg.app_dim),
                                             minval=-bound, maxval=bound)
    if cfg.shading_mode.startswith("MLP"):
        mlp = make_render_mlp(cfg)
        dummy_f = jnp.zeros((1, cfg.app_dim))
        params["mlp"] = mlp.init(keys[13], jnp.zeros((1, 3)), jnp.zeros((1, 3)), dummy_f)
    buffers = {
        "aabb": jnp.asarray(aabb, jnp.float32),
        "alpha_volume": None,
        "alpha_aabb": jnp.asarray(aabb, jnp.float32),
    }
    return params, buffers


def make_render_mlp(cfg: TensoRFConfig) -> MLPRender:
    return MLPRender(mode=cfg.shading_mode, view_pe=cfg.view_pe, fea_pe=cfg.fea_pe,
                     pos_pe=cfg.pos_pe, featureC=cfg.featureC)


def _line_sample(line: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """1D lerp of line [C, L] at t [...] in [-1, 1] (align_corners).

    Packs both lerp endpoints into one [L, 2C] row so each sample costs ONE
    gather (and ONE wider scatter-add in the transpose) instead of two —
    random access on this chip is issue-bound per row (PERF_NOTES.md)."""
    L = line.shape[1]
    C = line.shape[0]
    x = (t + 1.0) * 0.5 * (L - 1)
    if L == 1:
        x0 = jnp.zeros_like(x, jnp.int32)
        w = jnp.zeros_like(x)[..., None]
    else:
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, L - 2)
        w = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    g = jnp.moveaxis(line, 0, -1)  # [L, C]
    if L > 1:
        nxt = jnp.concatenate([g[1:], g[-1:]], axis=0)
    else:
        nxt = g
    packed = jnp.concatenate([g, nxt], axis=-1)    # [L, 2C]
    rows = packed[x0]
    return rows[..., :C] * (1 - w) + rows[..., C:] * w


def _gather_cast(cfg: TensoRFConfig, table: jnp.ndarray) -> jnp.ndarray:
    """bf16 view of a factor tensor for the per-sample gather when
    cfg.factor_gather_bf16 (halves gather/scatter row bytes at the
    bandwidth wall); the lerp upcasts back to f32 against the f32
    weights, and the cast's transpose accumulates grads into the f32
    master param."""
    if cfg.factor_gather_bf16:
        return table.astype(jnp.bfloat16)
    return table


def compute_density_feature(cfg: TensoRFConfig, params, xyz: jnp.ndarray) -> jnp.ndarray:
    """Density factor feature at normalised coords xyz [..., 3] in [-1, 1].

    VM: sum_i sum_c plane_i(x_m0, x_m1) line_i(x_vec) (tensoRF.py:209-225);
    CP: sum_c prod_i line_i(x_vec_i) (tensoRF.py:345-361).
    """
    if cfg.decomp == "vm_split":
        total = 0.0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(
                _gather_cast(cfg, params["density_plane"][i]),
                jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
            line_feat = _line_sample(
                _gather_cast(cfg, params["density_line"][i]),
                xyz[..., VEC_MODE[i]])
            total = total + (plane_feat * line_feat
                             ).astype(jnp.float32).sum(-1)
        return total
    if cfg.decomp == "vm":
        D = cfg.density_n_comp[0]
        total = 0.0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(params["vm_plane"][i][-D:],
                                        jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
            line_feat = _line_sample(params["vm_line"][i][-D:], xyz[..., VEC_MODE[i]])
            total = total + (plane_feat * line_feat).sum(-1)
        return total
    prod = _line_sample(params["density_line"][0], xyz[..., VEC_MODE[0]])
    prod = prod * _line_sample(params["density_line"][1], xyz[..., VEC_MODE[1]])
    prod = prod * _line_sample(params["density_line"][2], xyz[..., VEC_MODE[2]])
    return prod.sum(-1)


def compute_app_feature(cfg: TensoRFConfig, params, xyz: jnp.ndarray) -> jnp.ndarray:
    """Appearance feature [..., app_dim] (tensoRF.py:228-244 / 364-379)."""
    if cfg.decomp == "vm_split":
        feats = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(
                _gather_cast(cfg, params["app_plane"][i]),
                jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
            line_feat = _line_sample(
                _gather_cast(cfg, params["app_line"][i]),
                xyz[..., VEC_MODE[i]])
            feats.append((plane_feat * line_feat).astype(jnp.float32))
        feat = jnp.concatenate(feats, axis=-1)
    elif cfg.decomp == "vm":
        A = cfg.app_n_comp[0]
        feats = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane_feat = grid_sample_2d(params["vm_plane"][i][:A],
                                        jnp.stack([xyz[..., m0], xyz[..., m1]], -1))
            line_feat = _line_sample(params["vm_line"][i][:A], xyz[..., VEC_MODE[i]])
            feats.append(plane_feat * line_feat)
        feat = jnp.concatenate(feats, axis=-1)
    else:
        feat = _line_sample(params["app_line"][0], xyz[..., VEC_MODE[0]])
        feat = feat * _line_sample(params["app_line"][1], xyz[..., VEC_MODE[1]])
        feat = feat * _line_sample(params["app_line"][2], xyz[..., VEC_MODE[2]])
    return feat @ params["basis_mat"]


def feature2density(cfg: TensoRFConfig, f: jnp.ndarray) -> jnp.ndarray:
    """softplus(f + shift) | relu(f) (tensorBase.py:444-448)."""
    if cfg.fea2dense == "softplus":
        return jax.nn.softplus(f + cfg.density_shift)
    return nn.relu(f)


def normalize_coord(aabb: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """AABB -> [-1, 1] (tensorBase.py:224-225)."""
    return (xyz - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0


# ---------------------------------------------------------------------------
# ray sampling + forward
# ---------------------------------------------------------------------------

def sample_ray(aabb: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
               step_size: float, n_samples: int, near_far: Tuple[float, float],
               key: Optional[jax.Array]) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """AABB-clipped fixed-step sampling (tensorBase.py:340-360).

    Returns (pts [N, S, 3], z_vals [N, S], valid [N, S]).
    """
    near, far = near_far
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)
    rng = jnp.arange(n_samples, dtype=jnp.float32)[None, :]
    if key is not None:
        rng = rng + jax.random.uniform(key, (rays_o.shape[0], 1))
    z_vals = t_min[:, None] + step_size * rng
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    out = jnp.logical_or(aabb[0] > pts, pts > aabb[1]).any(-1)
    return pts, z_vals, jnp.logical_not(out)


def sample_ray_ndc(aabb: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   n_samples: int, near_far: Tuple[float, float],
                   key: Optional[jax.Array]):
    """Uniform near-far sampling for NDC rays (tensorBase.py:328-338)."""
    near, far = near_far
    z_vals = jnp.broadcast_to(jnp.linspace(near, far, n_samples)[None],
                              (rays_o.shape[0], n_samples))
    if key is not None:
        z_vals = z_vals + jax.random.uniform(key, z_vals.shape) * \
            ((far - near) / n_samples)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    out = jnp.logical_or(aabb[0] > pts, pts > aabb[1]).any(-1)
    return pts, z_vals, jnp.logical_not(out)


def sample_alpha_mask(alpha_volume: jnp.ndarray, alpha_aabb: jnp.ndarray,
                      xyz: jnp.ndarray) -> jnp.ndarray:
    """Trilinear alpha-mask lookup (AlphaGridMask, tensorBase.py:39-59).

    alpha_volume is stored [D, H, W] indexed (z, y, x).
    """
    coords = normalize_coord(alpha_aabb, xyz)
    return grid_sample_3d(alpha_volume[None], coords)[..., 0]


def dilate_alpha_corners(vol: jnp.ndarray) -> jnp.ndarray:
    """Max over each trilinear cell's corner window: dil[i] = max vol[i:i+2]
    per axis (border clamped like the gather's corner index).

    For a BINARY volume this makes `dil[cell_base] > 0` equal to
    `trilinear(vol) > 0` in the cell interior (any corner occupied), the
    predicate every alpha-mask consumer applies (tensorBase.py:491-496) —
    so one nearest gather replaces 8 per-corner gathers per sample. On the
    clamped border and at exact grid planes the dilated form is a one-voxel
    superset: extra samples stay valid and get their true density, which
    only ever widens the evaluated set.
    """
    for ax in range(3):
        n = vol.shape[ax]
        if n > 1:
            idx = jnp.minimum(jnp.arange(n) + 1, n - 1)
            vol = jnp.maximum(vol, jnp.take(vol, idx, axis=ax))
    return vol


def prepare_alpha_buffers(buffers):
    """Derive the corner-dilated alpha volume once per stage (host side).

    Call after installing/restoring `alpha_volume`; forwards prefer the
    dilated single-gather gate when present (PERF_NOTES §14: the 256^3
    trilinear mask is 8 issue-bound narrow gathers per sample).
    """
    if buffers.get("alpha_volume") is None:
        if buffers.get("alpha_volume_dil") is not None:
            buffers = dict(buffers)
            buffers["alpha_volume_dil"] = None
        return buffers
    buffers = dict(buffers)
    buffers["alpha_volume_dil"] = dilate_alpha_corners(buffers["alpha_volume"])
    return buffers


def alpha_mask_valid(buffers, xyz: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Boolean occupancy gate from the installed alpha mask (or None).

    Single nearest gather on the corner-dilated volume when available;
    falls back to the trilinear lookup (identical predicate) otherwise.
    """
    if buffers.get("alpha_volume") is None:
        return None
    dil = buffers.get("alpha_volume_dil")
    if dil is not None:
        coords = normalize_coord(buffers["alpha_aabb"], xyz)
        D, H, W = dil.shape
        x0 = cell_base_index(coords[..., 0], W)
        y0 = cell_base_index(coords[..., 1], H)
        z0 = cell_base_index(coords[..., 2], D)
        return dil.reshape(-1)[(z0 * H + y0) * W + x0] > 0
    return sample_alpha_mask(buffers["alpha_volume"],
                             buffers["alpha_aabb"], xyz) > 0


def compact_density_samples(cfg: TensoRFConfig, buffers, valid: jnp.ndarray,
                            xyz: jnp.ndarray, z_vals: jnp.ndarray,
                            dists: jnp.ndarray):
    """First-K compaction of gate-passing samples before the density factors.

    Static-shape resolution of the reference's dynamic ``ray_valid`` boolean
    indexing (tensorBase.py:497-504): the reference evaluates density only at
    samples inside the AABB that pass the alpha mask; here those survivors
    are compacted to ``cfg.density_sample_budget`` slots per ray so every
    downstream plane/line gather (the §5d hot loop) runs on the compacted
    set. Composite-exact when a ray has <= budget survivors: dropped samples
    have sigma = 0, so they contribute neither transmittance attenuation nor
    weight, and per-sample ``dists`` are kept with their samples. Gated on
    the alpha mask existing (same as app_sample_budget).

    Returns (valid, xyz, z_vals, dists), each [..., K(, 3)].
    """
    kd = cfg.density_sample_budget
    if not kd or kd >= xyz.shape[-2] or buffers.get("alpha_volume") is None:
        return valid, xyz, z_vals, dists
    idx, keep = compact_first_k(valid, kd)
    xyz = jnp.take_along_axis(xyz, idx[..., None], axis=-2)
    z_vals = jnp.take_along_axis(z_vals, idx, axis=-1)
    dists = jnp.take_along_axis(dists, idx, axis=-1)
    return keep, xyz, z_vals, dists


def density_via_batch_compaction(cfg: TensoRFConfig, params,
                                 valid: jnp.ndarray, xyz: jnp.ndarray
                                 ) -> jnp.ndarray:
    """Evaluate density factors only at batch-compacted survivor samples.

    Implements TensoRFConfig.density_batch_budget: first-M gate-passing
    samples in sample-major order (jnp.nonzero with a static size), one
    [M, 3] coordinate gather, the density factors at M samples instead of
    N*S, and a drop-mode scatter back to the [N, S] sigma layout. Dropped
    samples (beyond the budget) and gate-failing samples carry sigma
    feature = -inf -> density 0 after feature2density's softplus shift
    (matching the full path where sigma is where(valid, ..., 0)).

    Returns sigma [N, S] (post feature2density, gated).
    """
    N, S = valid.shape
    M = cfg.density_batch_budget
    flat = valid.T.reshape(-1)                       # sample-major [S*N]
    (idx,) = jnp.nonzero(flat, size=M, fill_value=0)
    keep = jnp.arange(M, dtype=jnp.int32) < flat.sum()
    xyz_sm = jnp.swapaxes(xyz, 0, 1).reshape(S * N, 3)
    feat = compute_density_feature(cfg, params, xyz_sm[idx])
    sig = jnp.where(keep, feature2density(cfg, feat), 0.0)
    out = jnp.zeros((S * N,), sig.dtype)
    out = out.at[jnp.where(keep, idx, S * N)].set(sig, mode="drop")
    return out.reshape(S, N).T


class TensoRFOut(NamedTuple):
    rgb_map: jnp.ndarray
    depth_map: jnp.ndarray
    weight: jnp.ndarray
    sigma: jnp.ndarray
    bg_weight: jnp.ndarray
    z_vals: jnp.ndarray
    extras: Dict[str, jnp.ndarray]


def tensorf_forward(cfg: TensoRFConfig, geom: StageGeom, params, buffers,
                    rays: jnp.ndarray, key: Optional[jax.Array] = None,
                    white_bg: bool = True, n_samples: Optional[int] = None,
                    mlp_apply=None, ndc_ray: bool = False) -> TensoRFOut:
    """Full TensoRF forward on rays [N, 6(+1 far)] (tensorBase.py:476-536)."""
    n_s = n_samples or geom.n_samples
    rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
    if ndc_ray:
        pts, z_vals, valid = sample_ray_ndc(buffers["aabb"], rays_o, viewdirs,
                                            n_s, cfg.near_far, key)
        dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                                 jnp.zeros_like(z_vals[:, :1])], axis=-1)
        norm = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
        dists = dists * norm
        viewdirs = viewdirs / norm
    else:
        pts, z_vals, valid = sample_ray(buffers["aabb"], rays_o, viewdirs,
                                        geom.step_size, n_s, cfg.near_far, key)
        dists = jnp.concatenate([z_vals[:, 1:] - z_vals[:, :-1],
                                 jnp.zeros_like(z_vals[:, :1])], axis=-1)
    occ = alpha_mask_valid(buffers, pts)
    if occ is not None:
        valid = jnp.logical_and(valid, occ)

    xyz = normalize_coord(buffers["aabb"], pts)
    # TRAIN-only: the batch budget is sized in TOTAL survivor slots for the
    # training ray batch (cfg docstring); eval renders arrive in whole-image
    # chunks of a different (larger) ray count, where the same M would
    # truncate wholesale — caught as a -10 dB val collapse with healthy
    # train PSNR on the Coffee trajectory gate. ``key is None`` is the
    # eval-path marker (deterministic unjittered sampling), so eval runs
    # the per-ray/exact path like the reference's dynamic indexing.
    use_batch_budget = (cfg.density_batch_budget
                        and buffers.get("alpha_volume") is not None
                        and key is not None)
    if use_batch_budget:
        sigma = density_via_batch_compaction(cfg, params, valid, xyz)
    else:
        valid, xyz, z_vals, dists = compact_density_samples(
            cfg, buffers, valid, xyz, z_vals, dists)
        sigma_feat = compute_density_feature(cfg, params, xyz)
        sigma = jnp.where(valid, feature2density(cfg, sigma_feat), 0.0)

    alpha, weight, bg_weight = raw2alpha(sigma, dists * cfg.distance_scale)
    app_mask = weight > cfg.ray_march_weight_thres

    dirs = jnp.broadcast_to(viewdirs[:, None, :], xyz.shape)
    K = cfg.app_sample_budget
    use_budget = (K and K < xyz.shape[1]
                  and buffers.get("alpha_volume") is not None)
    if use_budget:
        # static compaction: appearance only at the first K weight>thresh
        # survivors per ray (the reference's boolean app_mask indexing,
        # tensorBase.py:505-518, as a fixed-shape gather). Gated on the
        # alpha mask existing: post-mask survivors are sparse; pre-mask the
        # exact path below runs (see app_sample_budget docstring).
        idx, valid_app = compact_first_k(app_mask, K)
        xyz_c = jnp.take_along_axis(xyz, idx[..., None], axis=1)
        w_c = jnp.take_along_axis(weight, idx, axis=1)
        w_c = jnp.where(valid_app, w_c, 0.0)
        dirs_c = jnp.broadcast_to(viewdirs[:, None, :], xyz_c.shape)
        app_feat = compute_app_feature(cfg, params, xyz_c)
        if cfg.shading_mode.startswith("MLP"):
            apply = mlp_apply or make_render_mlp(cfg).apply
            rgb_c = apply(params["mlp"], xyz_c, dirs_c, app_feat)
        elif cfg.shading_mode == "SH":
            rgb_c = sh_render(xyz_c, dirs_c, app_feat)
        else:  # RGB
            rgb_c = app_feat
        rgb_c = jnp.where(valid_app[..., None], rgb_c, 0.0)
        acc_map = weight.sum(-1)
        rgb_map = (w_c[..., None] * rgb_c).sum(-2)
        if white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
        depth_map = (weight * z_vals).sum(-1)
        far_plane = rays[:, -1] if rays.shape[-1] > 6 else jnp.full_like(
            acc_map, cfg.near_far[1])
        depth_map = depth_map + (1.0 - acc_map) * far_plane
        return TensoRFOut(rgb_map=rgb_map, depth_map=depth_map, weight=weight,
                          sigma=sigma, bg_weight=bg_weight, z_vals=z_vals,
                          extras={"app_mask": app_mask, "valid": valid,
                                  "app_xyz": xyz_c, "app_rgb": rgb_c,
                                  "app_weight": w_c, "app_dirs": dirs_c,
                                  "app_valid": valid_app})
    app_feat = compute_app_feature(cfg, params, xyz)
    if cfg.shading_mode.startswith("MLP"):
        apply = mlp_apply or make_render_mlp(cfg).apply
        rgb_s = apply(params["mlp"], xyz, dirs, app_feat)
    elif cfg.shading_mode == "SH":
        rgb_s = sh_render(xyz, dirs, app_feat)
    else:  # RGB
        rgb_s = app_feat
    rgb_s = jnp.where(app_mask[..., None], rgb_s, 0.0)

    acc_map = weight.sum(-1)
    rgb_map = (weight[..., None] * rgb_s).sum(-2)
    if white_bg:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
    depth_map = (weight * z_vals).sum(-1)
    far_plane = rays[:, -1] if rays.shape[-1] > 6 else jnp.full_like(acc_map,
                                                                     cfg.near_far[1])
    depth_map = depth_map + (1.0 - acc_map) * far_plane
    return TensoRFOut(rgb_map=rgb_map, depth_map=depth_map, weight=weight,
                      sigma=sigma, bg_weight=bg_weight, z_vals=z_vals,
                      extras={"app_mask": app_mask, "valid": valid})


def compute_alpha(cfg: TensoRFConfig, params, buffers, xyz: jnp.ndarray,
                  length: float) -> jnp.ndarray:
    """Opacity of a dense point set (tensorBase.py:450-473)."""
    occ = alpha_mask_valid(buffers, xyz)
    mask = occ if occ is not None else jnp.ones(xyz.shape[:-1], bool)
    coords = normalize_coord(buffers["aabb"], xyz)
    sigma = jnp.where(mask, feature2density(cfg, compute_density_feature(cfg, params, coords)), 0.0)
    return 1.0 - jnp.exp(-sigma * length)


# ---------------------------------------------------------------------------
# alpha-mask update / shrink / upsample (host-boundary stage transforms)
# ---------------------------------------------------------------------------

def get_dense_alpha(cfg: TensoRFConfig, geom: StageGeom, params, buffers,
                    grid_size: Optional[Sequence[int]] = None):
    """Dense alpha grid [gx, gy, gz] + its sample coords (tensorBase.py:366-383)."""
    gs = tuple(grid_size or geom.grid_size)
    lin = [jnp.linspace(0.0, 1.0, g) for g in gs]
    s = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), axis=-1)
    aabb = buffers["aabb"]
    dense_xyz = aabb[0] * (1 - s) + aabb[1] * s
    alpha = jax.lax.map(
        lambda sl: compute_alpha(cfg, params, buffers, sl.reshape(-1, 3),
                                 geom.step_size).reshape(gs[1], gs[2]),
        dense_xyz)
    return alpha, dense_xyz


def _max_pool3d_same(x: jnp.ndarray, ks: int = 3) -> jnp.ndarray:
    """3D max pool, stride 1, same padding (F.max_pool3d, tensorBase.py:393)."""
    pad = ks // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (ks, ks, ks), (1, 1, 1),
        [(pad, pad)] * 3)


def update_alpha_mask(cfg: TensoRFConfig, geom: StageGeom, params, buffers,
                      grid_size=(200, 200, 200)):
    """-> (new buffers with alpha volume, new_aabb np). Ref: tensorBase.py:385-409.

    The alpha volume is stored transposed to (z, y, x) like the reference so
    grid_sample indexes (x, y, z) coords naturally.
    """
    alpha, dense_xyz = get_dense_alpha(cfg, geom, params, buffers, grid_size)
    alpha = jnp.clip(alpha, 0, 1)
    alpha_t = jnp.transpose(alpha, (2, 1, 0))  # [gz, gy, gx]
    alpha_t = _max_pool3d_same(alpha_t, 3)
    alpha_bin = (alpha_t >= cfg.alpha_mask_thres).astype(jnp.float32)

    valid_mask = jnp.transpose(alpha_bin, (2, 1, 0)) > 0.5  # back to (x,y,z)
    big = jnp.float32(1e10)
    xyz_min = jnp.min(jnp.where(valid_mask[..., None], dense_xyz, big), axis=(0, 1, 2))
    xyz_max = jnp.max(jnp.where(valid_mask[..., None], dense_xyz, -big), axis=(0, 1, 2))
    new_aabb = jnp.stack([xyz_min, xyz_max])
    new_buffers = dict(buffers)
    new_buffers["alpha_volume"] = alpha_bin
    new_buffers["alpha_aabb"] = buffers["aabb"]
    return prepare_alpha_buffers(new_buffers), np.asarray(new_aabb)


def _resize_align_corners(grid: jnp.ndarray, new_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of [C, H, W] with align_corners=True via grid_sample."""
    H2, W2 = new_hw
    ys = jnp.linspace(-1.0, 1.0, H2)
    xs = jnp.linspace(-1.0, 1.0, W2)
    X, Y = jnp.meshgrid(xs, ys)
    coords = jnp.stack([X, Y], axis=-1)
    return jnp.moveaxis(grid_sample_2d(grid, coords), -1, 0)


def _resize_line(line: jnp.ndarray, new_len: int) -> jnp.ndarray:
    return _resize_align_corners(line[:, :, None], (new_len, 1))[:, :, 0]


def upsample_volume_grid(cfg: TensoRFConfig, params, res_target: Sequence[int]):
    """Bilinear-upsample all factors (tensoRF.py:248-271), functional."""
    res = [int(r) for r in res_target]
    new = dict(params)
    if cfg.decomp == "vm_split":
        for name in ("density", "app"):
            new[f"{name}_plane"] = tuple(
                _resize_align_corners(params[f"{name}_plane"][i],
                                      (res[MAT_MODE[i][1]], res[MAT_MODE[i][0]]))
                for i in range(3))
            new[f"{name}_line"] = tuple(
                _resize_line(params[f"{name}_line"][i], res[VEC_MODE[i]])
                for i in range(3))
    elif cfg.decomp == "vm":
        new["vm_plane"] = tuple(
            _resize_align_corners(params["vm_plane"][i],
                                  (res[MAT_MODE[i][1]], res[MAT_MODE[i][0]]))
            for i in range(3))
        new["vm_line"] = tuple(
            _resize_line(params["vm_line"][i], res[VEC_MODE[i]])
            for i in range(3))
    else:
        for name in ("density", "app"):
            new[f"{name}_line"] = tuple(
                _resize_line(params[f"{name}_line"][i], res[VEC_MODE[i]])
                for i in range(3))
    return new


def shrink(cfg: TensoRFConfig, geom: StageGeom, params, buffers,
           new_aabb: np.ndarray):
    """Slice factor grids to a tightened AABB (tensoRF.py:273-314), functional.

    Returns (params, buffers, new_grid_size). Host-side (concrete shapes).
    """
    aabb = np.asarray(buffers["aabb"])
    units = np.asarray(geom.units)
    gs = np.asarray(geom.grid_size)
    xyz_min, xyz_max = np.asarray(new_aabb)
    t_l = np.round((xyz_min - aabb[0]) / units).astype(int)
    b_r = np.round((xyz_max - aabb[0]) / units).astype(int) + 1
    b_r = np.minimum(b_r, gs)
    new = dict(params)
    if cfg.decomp == "vm_split":
        for name in ("density", "app"):
            new[f"{name}_line"] = tuple(
                params[f"{name}_line"][i][:, t_l[VEC_MODE[i]]:b_r[VEC_MODE[i]]]
                for i in range(3))
            new[f"{name}_plane"] = tuple(
                params[f"{name}_plane"][i][:,
                                           t_l[MAT_MODE[i][1]]:b_r[MAT_MODE[i][1]],
                                           t_l[MAT_MODE[i][0]]:b_r[MAT_MODE[i][0]]]
                for i in range(3))
    elif cfg.decomp == "vm":
        new["vm_line"] = tuple(
            params["vm_line"][i][:, t_l[VEC_MODE[i]]:b_r[VEC_MODE[i]]]
            for i in range(3))
        new["vm_plane"] = tuple(
            params["vm_plane"][i][:,
                                  t_l[MAT_MODE[i][1]]:b_r[MAT_MODE[i][1]],
                                  t_l[MAT_MODE[i][0]]:b_r[MAT_MODE[i][0]]]
            for i in range(3))
    else:
        for name in ("density", "app"):
            new[f"{name}_line"] = tuple(
                params[f"{name}_line"][i][:, t_l[VEC_MODE[i]]:b_r[VEC_MODE[i]]]
                for i in range(3))
    # snap aabb to the voxel lattice when alpha grid reso != model grid
    # (tensoRF.py:297-305)
    alpha_gs = (None if buffers.get("alpha_volume") is None
                else buffers["alpha_volume"].shape[::-1])
    if alpha_gs is not None and tuple(alpha_gs) != tuple(geom.grid_size):
        t_l_r = t_l / (gs - 1)
        b_r_r = (b_r - 1) / (gs - 1)
        corrected = np.stack([
            (1 - t_l_r) * aabb[0] + t_l_r * aabb[1],
            (1 - b_r_r) * aabb[0] + b_r_r * aabb[1]])
        new_aabb = corrected
    new_buffers = dict(buffers)
    new_buffers["aabb"] = jnp.asarray(new_aabb, jnp.float32)
    new_size = tuple(int(x) for x in (b_r - t_l))
    return new, new_buffers, new_size


# ---------------------------------------------------------------------------
# regularizers (tensoRF.py:177-207)
# ---------------------------------------------------------------------------

def vector_comp_diffs(params) -> jnp.ndarray:
    """Mean |off-diagonal| of line-factor Gram matrices (tensoRF.py:177-189)."""
    total = 0.0
    if "vm_line" in params:
        lines = tuple(params["vm_line"])
    else:
        lines = tuple(params["density_line"]) + tuple(params["app_line"])
    for v in lines:
        n_comp = v.shape[0]
        dotp = v @ v.T
        off = dotp - jnp.diag(jnp.diag(dotp))
        total = total + jnp.abs(off).sum() / (n_comp * (n_comp - 1))
    return total


def density_L1(cfg: TensoRFConfig, params) -> jnp.ndarray:
    """Ref: tensoRF.py:191-195 (VM: plane+line; CP: line only)."""
    total = 0.0
    if cfg.decomp == "vm_split":
        for i in range(3):
            total = total + jnp.abs(params["density_plane"][i]).mean() \
                + jnp.abs(params["density_line"][i]).mean()
    elif cfg.decomp == "vm":
        D = cfg.density_n_comp[0]
        for i in range(3):
            total = total + jnp.abs(params["vm_plane"][i][-D:]).mean() \
                + jnp.abs(params["vm_line"][i][-D:]).mean()
    else:
        for i in range(3):
            total = total + jnp.abs(params["density_line"][i]).mean()
    return total


def tv_loss_2d(grid: jnp.ndarray) -> jnp.ndarray:
    """TVLoss on [C, H, W] (tensorf-myc/utils.py:123-142 semantics)."""
    h_tv = ((grid[:, 1:, :] - grid[:, :-1, :]) ** 2).sum()
    w_tv = ((grid[:, :, 1:] - grid[:, :, :-1]) ** 2).sum()
    C, H, W = grid.shape
    count_h = C * (H - 1) * W
    count_w = C * H * (W - 1)
    return 2 * (h_tv / count_h + w_tv / count_w)


def tv_loss_density(cfg: TensoRFConfig, params) -> jnp.ndarray:
    """Ref: tensoRF.py:197-201 (planes x 1e-2 VM; lines x 1e-3 CP)."""
    total = 0.0
    if cfg.decomp == "vm_split":
        for p in params["density_plane"]:
            total = total + tv_loss_2d(p) * 1e-2
    elif cfg.decomp == "vm":
        D = cfg.density_n_comp[0]
        for p in params["vm_plane"]:
            total = total + tv_loss_2d(p[-D:]) * 1e-2
    else:
        for v in params["density_line"]:
            total = total + tv_loss_2d(v[:, :, None]) * 1e-3
    return total


def tv_loss_app(cfg: TensoRFConfig, params) -> jnp.ndarray:
    """Ref: tensoRF.py:203-207."""
    total = 0.0
    if cfg.decomp == "vm_split":
        for p in params["app_plane"]:
            total = total + tv_loss_2d(p) * 1e-2
    elif cfg.decomp == "vm":
        A = cfg.app_n_comp[0]
        for p in params["vm_plane"]:
            total = total + tv_loss_2d(p[:A]) * 1e-2
    else:
        for v in params["app_line"]:
            total = total + tv_loss_2d(v[:, :, None]) * 1e-3
    return total


def filter_rays_bbox(aabb: jnp.ndarray, rays: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask of rays that hit the AABB (filtering_rays bbox_only,
    tensorBase.py:411-431). Static-shape: caller keeps the mask."""
    rays_o, rays_d = rays[..., :3], rays[..., 3:6]
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.minimum(rate_a, rate_b).max(-1)
    t_max = jnp.maximum(rate_a, rate_b).min(-1)
    return t_max > t_min
