"""NGP ray marching + rendering: static-shape, occupancy-gated, TPU-first.

Re-implements the jnerf-myc CUDA march/composite pipeline (RaySampler
op_header/ray_sampler.h:4-114, CompactedCoord op_header/compacted_coord.h,
CalcRgb calc_rgb.o/calc_rgb.h) with the XLA-native design from SURVEY.md §7.3:

- The reference's per-thread DDA march with atomic sample offsets and a host
  sync (ray_sampler.py:70) becomes a **two-pass static-shape march**:
  1. a cheap coarse pass probes the occupancy bitfield at n_coarse uniform
     t's inside the ray/AABB intersection and finds the per-ray occupied
     span [t_lo, t_hi];
  2. n_samples fine samples are placed uniformly inside that span, each
     validity-masked by the bitfield.
  Work is bounded, not skipped; there are no host round-trips.
- Dynamic compaction (atomics + .item() sync) becomes the validity mask +
  transmittance early-termination mask in composite_weights.
- CalcRgb's analytic custom VJP is XLA autodiff of the same scan.

Positions are warped to [0, 1] over the cascade AABB (warp_position,
ray_sampler_header.h:790-796); directions warped to [0, 1]
(warp_direction, :819-822) to match the reference's network inputs.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.ngp import density_activation
from ..ops.compaction import compact_first_k
from .composite import composite_rgb, composite_weights
from .occupancy import (OccupancyConfig, OccupancyState, grid_value_at,
                        mip_from_pos, occupied_at, occupied_at_mip0,
                        sigma_at)


SQRT3 = 1.7320508075688772
MAX_STEP = 1024  # NERF_STEPS (density_grid_sampler.py:38)


@dataclasses.dataclass(frozen=True)
class NGPRenderConfig:
    aabb_scale: int = 1
    n_coarse: int = 512          # occupancy probes per ray (pass 1)
    n_samples: int = 64          # MLP samples per ray (pass 2)
    near_distance: float = 0.2   # configs/Easyship.py:91
    cone_angle_constant: float = 0.00390625
    const_dt: bool = True
    early_stop_eps: float = 1e-4
    # training-time compaction budget (0 = off); the differentiable pass
    # runs on at most n_compact surviving samples per ray (CompactedCoord).
    # 20 is the quality-gated aabb_scale=1 budget: it holds BOTH the
    # 6k-step gate (33.75 vs 33.75 at 32) AND the full 40k reference
    # budget (-0.23 dB, inside gate noise). 18 passes at 6k (-0.11) but
    # FAILS the 40k budget by -1.15 dB, 16 fails at 6k (-0.53) — the
    # short gate underestimates long-horizon sensitivity (PERF_NOTES
    # par.18d; quality_r4_log ncompact_gate / ngp40k_budget_*). Cascaded
    # scenes need ~64 (32 undersamples the scale-4 ray extent, par.8b)
    n_compact: int = 20
    # transmittance source for compaction: 'grid' reads the maintained
    # density grid (one narrow gather — free), 'network' runs the detached
    # density forward like the reference (density_grid_sampler.py:150-154)
    compact_source: str = "grid"
    # fused march: probe the density grid (not the bitfield) in pass 1 so
    # coarse transmittance truncation happens DURING sample placement —
    # the separate compaction stage disappears (see march_rays_fused)
    fused_march: bool = True

    @property
    def aabb(self) -> Tuple[float, float]:
        s = self.aabb_scale
        return (0.5 - s / 2.0, 0.5 + s / 2.0)

    @property
    def min_stepsize(self) -> float:
        """MIN_CONE_STEPSIZE = SQRT3/NERF_STEPS (ray_sampler_header.h:100-101),
        in units of the unit box; scene extent is aabb_scale wide."""
        return SQRT3 / MAX_STEP


def calc_dt(rcfg: NGPRenderConfig, n_cascades: int, grid_size: int,
            t: jnp.ndarray) -> jnp.ndarray:
    """The reference's per-sample step size (ray_sampler_header.h:106-111):
    const_dt -> MIN_CONE_STEPSIZE * 0.5; else clamp(t * cone_angle,
    MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)."""
    mn = rcfg.min_stepsize
    if rcfg.const_dt:
        return jnp.full_like(t, mn * 0.5)
    mx = mn * (1 << (n_cascades - 1)) * MAX_STEP / grid_size
    return jnp.clip(t * rcfg.cone_angle_constant, mn, mx)


class MarchedRays(NamedTuple):
    positions: jnp.ndarray  # [N, K, 3] warped to [0, 1]
    dirs: jnp.ndarray       # [N, K, 3] warped to [0, 1]
    dt: jnp.ndarray         # [N, K] metric step sizes
    t: jnp.ndarray          # [N, K] metric depths
    valid: jnp.ndarray      # [N, K] bool


def ray_aabb_range(rcfg: NGPRenderConfig, rays_o: jnp.ndarray,
                   rays_d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entry/exit t of the cascade AABB (BoundingBox.ray_intersect)."""
    lo, hi = rcfg.aabb
    inv = 1.0 / jnp.where(rays_d == 0, 1e-10, rays_d)
    t1 = (lo - rays_o) * inv
    t2 = (hi - rays_o) * inv
    tmin = jnp.minimum(t1, t2).max(-1)
    tmax = jnp.maximum(t1, t2).min(-1)
    tmin = jnp.maximum(tmin, rcfg.near_distance)
    tmax = jnp.maximum(tmax, tmin)
    return tmin, tmax


def march_rays(occ_cfg: OccupancyConfig, rcfg: NGPRenderConfig,
               bitfield: jnp.ndarray, rays_o: jnp.ndarray,
               rays_d: jnp.ndarray, key: Optional[jax.Array] = None
               ) -> MarchedRays:
    """Two-pass occupancy-gated march (replaces rays_sampler, ray_sampler.h)."""
    N = rays_o.shape[0]
    tmin, tmax = ray_aabb_range(rcfg, rays_o, rays_d)
    span = tmax - tmin

    single_mip = rcfg.aabb_scale == 1  # static: skip cascade math entirely

    def lookup(pos):
        if single_mip:
            return occupied_at_mip0(occ_cfg, bitfield, pos)
        return occupied_at(occ_cfg, bitfield, pos, mip_from_pos(occ_cfg, pos))

    # --- pass 1: coarse occupancy probe over [tmin, tmax]
    Mc = rcfg.n_coarse
    frac = (jnp.arange(Mc, dtype=jnp.float32) + 0.5) / Mc
    tc = tmin[:, None] + span[:, None] * frac[None, :]
    pos_c = rays_o[:, None, :] + rays_d[:, None, :] * tc[..., None]
    occ_c = lookup(pos_c)
    wb = span / Mc                                    # coarse bin width

    # --- pass 2: inverse-CDF placement over the occupied bins
    # (multi-span-aware: samples land ONLY in occupied bins, wherever they
    # are along the ray — replaces advance_to_next_voxel DDA skipping,
    # ray_sampler_header.h:728-752)
    return _place_samples(occ_cfg, rcfg, rays_o, rays_d, tmin, span, wb,
                          occ_c, rcfg.n_samples, key, lookup)


def _place_samples(occ_cfg: OccupancyConfig, rcfg: NGPRenderConfig,
                   rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   tmin: jnp.ndarray, span: jnp.ndarray, wb: jnp.ndarray,
                   mask: jnp.ndarray, K: int, key: Optional[jax.Array],
                   sample_check) -> MarchedRays:
    """Shared pass-2 of march_rays / march_rays_fused: inverse-CDF placement
    of K samples over the masked coarse bins, AABB warp epilogue.

    The sample's arc-rank advances by the reference's calc_dt per step, so
    the MAX_STEP/cone-angle budget holds: rays whose live arc is shorter
    than K*dt get fewer valid samples. ``sample_check(pos [N,K,3]) -> bool``
    re-checks occupancy at the placed samples (bitfield for the two-pass
    march, density-grid threshold for the fused march).
    """
    N = rays_o.shape[0]
    any_occ = mask.any(axis=1)
    o = mask.astype(jnp.float32)
    c = jnp.cumsum(o, axis=1)                         # [N, Mc]
    n_occ = c[:, -1]
    arc = n_occ * wb                                  # live arc length
    dt_ref = calc_dt(rcfg, occ_cfg.n_cascades, occ_cfg.grid_size,
                     tmin + 0.5 * span)
    dt = jnp.maximum(arc / K, dt_ref)                 # [N]
    if key is not None:
        xi = jax.random.uniform(key, (N, 1))
    else:
        xi = 0.5
    # arc-rank of each sample, in live-bin units. A ray that misses the
    # AABB has span == 0 -> wb == 0: the safe inverse keeps r/t/positions
    # finite (0 * anything would otherwise be NaN and leak through the MLP
    # into the composite even at zero weight); `hit` gates validity.
    hit = span > 0.0
    inv_wb = jnp.where(hit, 1.0 / jnp.where(hit, wb, 1.0), 0.0)
    r = (jnp.arange(K, dtype=jnp.float32)[None, :] + xi) * (dt * inv_wb)[:, None]
    # bin index: first i with c_i > r == count of bins with c_i <= r; since c
    # is a 0/1 cumsum, the within-bin fraction is simply r - floor(r)
    bin_idx = (c[:, None, :] <= r[:, :, None]).sum(-1).astype(jnp.float32)
    frac_in = r - jnp.floor(r)
    t = tmin[:, None] + (bin_idx + frac_in) * wb[:, None]
    valid_budget = r < n_occ[:, None]

    pos = rays_o[:, None, :] + rays_d[:, None, :] * t[..., None]
    occ_f = sample_check(pos)
    lo, hi = rcfg.aabb
    inbox = jnp.logical_and(pos >= lo, pos <= hi).all(-1)
    valid = occ_f & inbox & any_occ[:, None] & valid_budget & hit[:, None]

    extent = hi - lo
    warped_pos = jnp.clip((pos - lo) / extent, 0.0, 1.0)
    warped_dir = (rays_d[:, None, :] + 1.0) * 0.5
    warped_dir = jnp.broadcast_to(warped_dir, pos.shape)
    dt_full = jnp.broadcast_to(dt[:, None], t.shape)
    return MarchedRays(positions=warped_pos, dirs=warped_dir, dt=dt_full,
                       t=t, valid=valid)


def _sigma_probe(occ_cfg: OccupancyConfig, density_grid: jnp.ndarray,
                 pos: jnp.ndarray, single_mip: bool) -> jnp.ndarray:
    """Raw density-grid value at world pos [..., 3] (one narrow gather).

    Returns the grid's stored optical thickness (sigma * MIN_CONE_STEPSIZE,
    EMA-maxed; -1 marks untrained). Lookups go through mip_from_pos, which
    never reads the OR-pooled centre octant of a cascade (those positions
    resolve to a smaller mip), so `value > thresh` here is EXACTLY the
    bitfield bit the non-fused march reads (update_bitfield semantics) —
    structurally so: both delegate to occupancy.grid_value_at.
    """
    return grid_value_at(occ_cfg, density_grid, pos,
                         None if single_mip else mip_from_pos(occ_cfg, pos))


def march_rays_fused(occ_cfg: OccupancyConfig, rcfg: NGPRenderConfig,
                     occ_state: OccupancyState, rays_o: jnp.ndarray,
                     rays_d: jnp.ndarray, key: Optional[jax.Array] = None,
                     n_samples: Optional[int] = None,
                     trunc_eps: Optional[float] = None) -> MarchedRays:
    """March + transmittance truncation in ONE pass over the density grid.

    Replaces march_rays + compact_marched for the 'grid' compaction source:
    pass 1 gathers the *density grid value* at n_coarse probes (same narrow
    gather cost as the bitfield probe, same occupancy decision — see
    _sigma_probe), and additionally accumulates coarse per-bin transmittance.
    Bins where T has fallen below trunc_eps are excluded from the
    inverse-CDF placement, so the K samples only land on LIVE bins — the
    reference's CompactedCoord early-termination (compacted_coord.h:39-77)
    folded into the RaySampler (ray_sampler.h) instead of a separate stage.
    """
    N = rays_o.shape[0]
    K = n_samples or rcfg.n_samples
    eps = rcfg.early_stop_eps if trunc_eps is None else trunc_eps
    tmin, tmax = ray_aabb_range(rcfg, rays_o, rays_d)
    span = tmax - tmin
    single_mip = rcfg.aabb_scale == 1

    # threshold in grid units: min(0.01, mean) (update_bitfield.h)
    thresh = jnp.minimum(0.01, occ_state.mean_density)

    # --- pass 1: density probe over [tmin, tmax]
    Mc = rcfg.n_coarse
    frac = (jnp.arange(Mc, dtype=jnp.float32) + 0.5) / Mc
    tc = tmin[:, None] + span[:, None] * frac[None, :]
    pos_c = rays_o[:, None, :] + rays_d[:, None, :] * tc[..., None]
    gval = _sigma_probe(occ_cfg, occ_state.density_grid, pos_c, single_mip)
    occ_c = gval > thresh
    wb = span / Mc

    # coarse transmittance: sigma = optical/MIN_CONE_STEPSIZE over bin width
    sigma_c = jnp.maximum(gval, 0.0) * (1.0 / occ_cfg.min_cone_stepsize)
    od = sigma_c * wb[:, None]                         # per-bin optical depth
    od = jnp.where(occ_c, od, 0.0)
    logT_prev = jnp.concatenate(
        [jnp.zeros((N, 1)), -jnp.cumsum(od, axis=1)[:, :-1]], axis=1)
    live = occ_c & (logT_prev > jnp.log(eps)) if eps > 0 else occ_c

    # --- pass 2: shared inverse-CDF placement over LIVE bins; the final
    # per-sample re-check reads the density grid against the bitfield
    # threshold (same decision — see _sigma_probe)
    def check(pos):
        gf = _sigma_probe(occ_cfg, occ_state.density_grid, pos, single_mip)
        return gf > thresh

    return _place_samples(occ_cfg, rcfg, rays_o, rays_d, tmin, span, wb,
                          live, K, key, check)


def compact_marched(marched: MarchedRays, sigma_det: jnp.ndarray,
                    n_compact: int, eps: float = 1e-4) -> MarchedRays:
    """Early-termination compaction (CompactedCoord, compacted_coord.h:39-77).

    The reference recomputes per-ray transmittance from a detached forward
    pass and truncates each ray at T < 1e-4, compacting survivors into a
    dense buffer so the differentiable pass (and its backward) only touches
    live samples. Static-shape version: per ray keep the first n_compact
    survivors via the cumsum-rank trick (no sort, one narrow gather).
    """
    N, K = sigma_det.shape
    alpha = 1.0 - jnp.exp(-sigma_det * marched.dt)
    alpha = jnp.where(marched.valid, alpha, 0.0)
    # transmittance BEFORE each sample (exclusive product)
    log1ma = jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7))
    logT_prev = jnp.concatenate(
        [jnp.zeros((N, 1)), jnp.cumsum(log1ma, axis=-1)[:, :-1]], axis=-1)
    surv = marched.valid & (jnp.exp(logT_prev) > eps)
    # slot j holds the j-th survivor (valid by construction); slots past the
    # survivor count are masked. ONE packed gather (pos, t, dt); dirs are
    # per-ray broadcasts, not gathered.
    idx, valid = compact_first_k(surv, n_compact)
    packed = jnp.concatenate([marched.positions, marched.t[..., None],
                              marched.dt[..., None]], axis=-1)  # [N, K, 5]
    taken = jnp.take_along_axis(packed, idx[..., None], axis=1)  # [N, M, 5]
    dirs = jnp.broadcast_to(marched.dirs[:, :1], taken[..., :3].shape)
    return MarchedRays(positions=taken[..., :3], dirs=dirs,
                       dt=taken[..., 3 + 1], t=taken[..., 3],
                       valid=valid)


class NGPRenderOut(NamedTuple):
    rgb: jnp.ndarray        # [N, 3]
    depth: jnp.ndarray      # [N]
    opacity: jnp.ndarray    # [N]
    n_samples: jnp.ndarray  # scalar: total valid samples (for batch adapt)


def render_marched(model_apply, params, marched: MarchedRays,
                   bg_color: jnp.ndarray,
                   early_stop_eps: float = 1e-4) -> NGPRenderOut:
    """Evaluate the field on marched samples and composite (CalcRgb fwd).

    ``model_apply(params, positions [M, 3], dirs [M, 3]) -> raw [M, 4]``
    with raw rgb (sigmoid later) + raw density (exp later), matching
    jnerf's NGPNetworks output contract.
    """
    N, K, _ = marched.positions.shape
    raw = model_apply(params, marched.positions.reshape(-1, 3),
                      marched.dirs.reshape(-1, 3)).reshape(N, K, 4)
    sigma = density_activation(raw[..., 3])
    rgb_s = jax.nn.sigmoid(raw[..., :3])
    weights, t_left = composite_weights(sigma, marched.dt, marched.valid,
                                        early_stop_eps)
    rgb = composite_rgb(rgb_s, weights, t_left, bg_color)
    depth = (weights * marched.t).sum(-1)
    return NGPRenderOut(rgb=rgb, depth=depth, opacity=1.0 - t_left[..., 0],
                        n_samples=marched.valid.sum())


def render_rays_ngp(occ_cfg: OccupancyConfig, rcfg: NGPRenderConfig,
                    model_apply, params, occ_state: OccupancyState,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    bg_color: jnp.ndarray,
                    key: Optional[jax.Array] = None,
                    density_apply=None) -> NGPRenderOut:
    """Full path: march + field + composite (DensityGridSampler.sample +
    rays2rgb, density_grid_sampler.py:133-193).

    With ``density_apply(params, positions) -> raw sigma [M, 1]`` and
    rcfg.n_compact > 0, a detached density pass truncates each ray at
    T < 1e-4 and compacts survivors so the differentiable pass only runs on
    live samples — the reference's training-time CompactedCoord stage
    (density_grid_sampler.py:150-164).

    With rcfg.fused_march (default), the march probes the density grid and
    folds the grid-sourced truncation into sample placement directly
    (march_rays_fused): training marches exactly n_compact samples per ray
    and there is no separate compaction stage."""
    compacting = density_apply is not None and rcfg.n_compact > 0
    # compact_source='network' asks for the reference's detached-network
    # truncation — that only exists on the non-fused path, so fall through
    # rather than silently substituting the grid-sourced fused truncation
    if rcfg.fused_march and not (compacting
                                 and rcfg.compact_source == "network"):
        K = rcfg.n_compact if compacting else rcfg.n_samples
        marched = march_rays_fused(occ_cfg, rcfg, occ_state, rays_o, rays_d,
                                   key, n_samples=K)
        return render_marched(model_apply, params, marched, bg_color,
                              rcfg.early_stop_eps)
    marched = march_rays(occ_cfg, rcfg, occ_state.bitfield, rays_o, rays_d, key)
    if density_apply is not None and rcfg.n_compact > 0:
        N, K, _ = marched.positions.shape
        if rcfg.compact_source == "grid":
            lo, hi = rcfg.aabb
            world = marched.positions * (hi - lo) + lo  # un-warp
            mip = (None if rcfg.aabb_scale == 1
                   else mip_from_pos(occ_cfg, world))
            sigma_det = sigma_at(occ_cfg, occ_state.density_grid, world, mip)
        else:
            raw_sigma = jax.lax.stop_gradient(
                density_apply(params, marched.positions.reshape(-1, 3)))
            sigma_det = density_activation(raw_sigma.reshape(N, K))
        marched = compact_marched(marched, sigma_det, rcfg.n_compact,
                                  rcfg.early_stop_eps)
    return render_marched(model_apply, params, marched, bg_color,
                          rcfg.early_stop_eps)
