"""NGP training: Runner-equivalent with ExpDecay Adam + EMA params.

TPU-native re-implementation of jnerf-myc Runner.train
(python/jnerf/runner/runner.py:62-85) and the optimizers (SURVEY.md J17):

- Adam(lr=0.1, eps=1e-15, betas=(0.9, 0.99)) under an ExpDecay step schedule
  (x decay_base at decay_start then every decay_interval; expdecay.py:7-31)
- EMA parameter smoothing with the reference's debiased blend applied to the
  live params every step (ema.py:26-42)
- per-step random background compositing of RGBA targets (runner.py:66-68)
- occupancy-grid update every update_den_freq steps and ray-batch-size
  adaptation toward target_batch_size samples (density_grid_sampler.py:
  251-267) — batch adaptation is a host-side scalar between jitted steps
- Huber loss delta=0.1 (losses/huber_loss.py:6-13)
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ngp import NGPModel, NGPModelConfig
from ..render import occupancy as occ
from ..render.ngp_render import NGPRenderConfig, render_rays_ngp
from ..utils.metrics import mse2psnr


def huber_loss(x: jnp.ndarray, y: jnp.ndarray, delta: float = 0.1) -> jnp.ndarray:
    """Elementwise Huber (huber_loss.py:6-13)."""
    d = jnp.abs(x - y)
    return jnp.where(d < delta, 0.5 * d * d / delta, d - 0.5 * delta)


_LADDER_MANTISSAS = (1.0, 1.25, 1.5, 1.75)


def _ladder_floor(rays: int) -> int:
    """Largest quarter-octave rung ({1, 1.25, 1.5, 1.75} x 2^k) <= rays.

    Bounds the number of distinct compiled batch shapes to 4 per octave
    while tracking the reference's fine-grained ray-count adaptation
    (density_grid_sampler.py:262-267) to within -12.5%."""
    rays = max(128, int(rays))
    k = int(np.floor(np.log2(rays)))
    best = 1 << k
    for m in _LADDER_MANTISSAS:
        cand = int(m * (1 << k))
        if cand <= rays:
            best = max(best, cand)
    return best


@dataclasses.dataclass(frozen=True)
class NGPTrainConfig:
    """Config parity with projects/ngp/configs/*.py."""

    lr: float = 1e-1
    eps: float = 1e-15
    betas: Tuple[float, float] = (0.9, 0.99)
    ema_decay: float = 0.95
    decay_start: int = 20000
    decay_interval: int = 10000
    decay_base: float = 0.33
    n_rays_per_batch: int = 4096
    target_batch_size: int = 1 << 18
    update_den_freq: int = 16
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    huber_delta: float = 0.1
    tot_train_steps: int = 40000
    # grid-update sample counts (update_density_grid, :251-260); the
    # reference uses G^3*n_cascades which is huge — configurable here
    n_grid_uniform: int = 1 << 16
    n_grid_nonuniform: int = 1 << 16
    # GradScaler semantics: the reference's fp16 path wraps Adam in a
    # jt.amp GradScaler that SKIPS the optimizer step (params and moments
    # untouched) whenever any grad is inf/nan (runner.py fp16 wiring;
    # nerf_base.py:80 fp16=True). bf16 needs no loss scaling, but the
    # step-skip is load-bearing for high-lr configs whose early steps
    # overflow — opt-in to keep the default path branch-free.
    skip_nonfinite: bool = False
    # Full fp16-backward numerics emulation (the rest of the reference's
    # GradScaler contract): grads are scaled by fp16_grad_scale, cast
    # through float16 (range +-65504 — large grads become inf, sub-
    # 6e-8 grads flush to zero, exactly the fp16 backward's behavior at
    # amp level 5, ori_nerf_network.py:33), then unscaled. Combined with
    # skip_nonfinite this reproduces the implicit early-step rejection
    # the reference's high-lr configs rely on: a bf16/f32 backward never
    # overflows, so violent early steps LAND here that the reference's
    # fp16 pipeline silently skips.
    fp16_grads: bool = False
    fp16_grad_scale: float = 128.0
    # optional global-norm clip (0 = off; diagnostic/stability knob —
    # the reference has no explicit clip, its fp16 range IS the clip)
    clip_grad_norm: float = 0.0
    # optional linear lr warmup (0 = off; diagnostic — no reference analog)
    warmup_steps: int = 0
    # Staged march budget: ((from_step, n_compact), ...) sorted ascending.
    # The reference's CUDA marcher compacts losslessly (truncates only at
    # T<1e-4, compacted_coord.h:37-77) so its sample budget is implicitly
    # unlimited; our static-K budget trades samples for gather bandwidth
    # (PERF_NOTES par.16). A schedule recovers the late-training quality
    # the flat budget gives up: the PERF_NOTES par.18d evidence shows the
    # budget floor binds only once the field is sharp (past decay_start),
    # so e.g. ((0, 20), (20000, 32)) runs the fast budget for the majority
    # early phase and the lossless-equivalent one late. Crossing a boundary
    # re-jits the step (staged re-jit, same mechanism as the batch ladder);
    # host-side step tracking, no device sync.
    n_compact_schedule: Optional[Tuple[Tuple[int, int], ...]] = None


class NGPTrainState(NamedTuple):
    """Note there is NO separate EMA shadow tree: the reference's EMA
    optimizer (ema.py:33-35) writes the debiased blend into the LIVE params
    and then copies them into its shadow, so shadow == live after every
    step — the shadow is recoverable as the previous step's final params.
    Dropping the duplicate halves param-state HBM and checkpoint size.
    (Pre-round-4 checkpoints carried `ema_params`/`ema_steps` fields;
    restore_checkpoint tolerates and drops them.)"""

    params: Any
    opt_state: Any
    occ: occ.OccupancyState
    step: jnp.ndarray


def make_lr_schedule(cfg: NGPTrainConfig):
    """ExpDecay (expdecay.py:20-26): factor *= base at start + k*interval.
    Optional linear warmup over cfg.warmup_steps (no reference analog —
    a diagnostic/stability knob for high-lr configs, see the lr 1e-2
    attractor analysis in PERF_NOTES r5)."""
    def sched(step):
        n = jnp.maximum(0, (step - cfg.decay_start) // cfg.decay_interval + 1)
        lr = cfg.lr * cfg.decay_base ** n
        if cfg.warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / cfg.warmup_steps)
        return lr
    return sched


def make_optimizer(cfg: NGPTrainConfig):
    return optax.adam(make_lr_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
                      eps=cfg.eps)


def apply_param_update(cfg: NGPTrainConfig, tx, state: "NGPTrainState",
                       grads) -> "NGPTrainState":
    """Adam update + dtype-preserving cast + EMA smoothing (the shared tail
    of every train step). With cfg.skip_nonfinite, a step whose grads
    contain inf/nan leaves params AND optimizer moments untouched — the
    reference's fp16 GradScaler contract (step counters still advance, as
    torch/jt schedulers do on skipped steps)."""
    if cfg.clip_grad_norm > 0:
        gn = optax.global_norm(grads)
        scale = jnp.minimum(1.0, cfg.clip_grad_norm / (gn + 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    if cfg.fp16_grads:
        s = cfg.fp16_grad_scale
        grads = jax.tree_util.tree_map(
            lambda g: ((g.astype(jnp.float32) * s).astype(jnp.float16)
                       .astype(g.dtype) / s), grads)

    def do_update(g):
        updates, opt_state = tx.update(g, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree_util.tree_map(
            lambda new, old: new.astype(old.dtype), params, state.params)
        return params, opt_state

    if cfg.skip_nonfinite:
        finite = jnp.asarray(True)
        for g in jax.tree_util.tree_leaves(grads):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
        params, opt_state = jax.lax.cond(
            finite, do_update,
            lambda g: (state.params, state.opt_state), grads)
    else:
        params, opt_state = do_update(grads)
    # EMA shadow == the previous step's final (post-blend) params, which is
    # exactly state.params at entry — no separate shadow tree needed.
    params = ema_step(cfg, params, state.params, state.step)
    return state._replace(params=params, opt_state=opt_state,
                          step=state.step + 1)


def ema_step(cfg: NGPTrainConfig, params, shadow, steps: jnp.ndarray):
    """The reference's in-place EMA smoothing of the live params (ema.py:26-42):

    p <- ((1-d) p + d v (1 - d^(n-1))) / (1 - d^n); v <- p.
    ``shadow`` (v) is the previous step's final params. Returns the blended
    params (which are both the new live params and the new shadow).
    """
    d = cfg.ema_decay
    n = steps.astype(jnp.float32) + 1.0
    debias_old = 1.0 - d ** (n - 1.0)
    debias_new = 1.0 / (1.0 - d**n)

    def blend(p, v):
        out = ((1.0 - d) * p.astype(jnp.float32)
               + d * v.astype(jnp.float32) * debias_old) * debias_new
        return out.astype(p.dtype)

    return jax.tree_util.tree_map(blend, params, shadow)


class NGPTrainer:
    """Host-side orchestration (Runner, runner.py:16-85)."""

    def __init__(self, model_cfg: NGPModelConfig, rcfg: NGPRenderConfig,
                 cfg: NGPTrainConfig, key: jax.Array,
                 camera_c2w: Optional[jnp.ndarray] = None,
                 focal: Optional[jnp.ndarray] = None,
                 image_wh: Optional[Tuple[int, int]] = None,
                 loss_fn=None, model=None):
        # `model` overrides the default NGPModel — any object exposing
        # apply(params, pos, dirs) + density_raw(params, pos) + init(key)
        # trains under the same Runner machinery (e.g. OriginNeRFModel,
        # the reference's projects/nerf config pairing ori_nerf_network with
        # the DensityGridSampler, ori_nerf_network.py:10-77)
        self.model = model if model is not None else NGPModel(model_cfg)
        self.rcfg = rcfg
        self.cfg = cfg
        self.loss_fn = loss_fn or (
            lambda x, y: huber_loss(x, y, cfg.huber_delta))
        max_cascade = 0
        while (1 << max_cascade) < rcfg.aabb_scale:
            max_cascade += 1
        self.occ_cfg = occ.OccupancyConfig(max_cascade=max_cascade)
        # reference bound check (density_grid_sampler.py:55-57): cascades
        # above n_cascades-1 would silently clamp gathers / drop splats
        max_aabb_scale = 1 << (self.occ_cfg.n_cascades - 1)
        if rcfg.aabb_scale > max_aabb_scale:
            raise ValueError(
                f"aabb_scale={rcfg.aabb_scale} exceeds the supported "
                f"{max_aabb_scale} (grid has {self.occ_cfg.n_cascades} "
                "cascades; raise OccupancyConfig.n_cascades by factors of 2)")
        params = self.model.init(key)
        occ_state = occ.init_occupancy(self.occ_cfg)
        if camera_c2w is not None:
            grid0 = occ.mark_untrained(self.occ_cfg, camera_c2w, focal,
                                       image_wh[0], image_wh[1])
            occ_state = occ_state._replace(density_grid=grid0)
        tx = make_optimizer(cfg)
        self.tx = tx
        self.state = NGPTrainState(
            params=params, opt_state=tx.init(params),
            occ=occ_state, step=jnp.zeros((), jnp.int32))
        self.n_rays_per_batch = cfg.n_rays_per_batch
        self._measured_samples = 0.0
        self._measure_count = 0

        self.grid_update = occ.make_density_grid_update(
            self.occ_cfg, lambda p, x: self.model.density_raw(p, x),
            cfg.n_grid_uniform, cfg.n_grid_nonuniform, aabb=rcfg.aabb)
        # host-side mirror of state.step for schedule decisions (device
        # sync per block would reintroduce the PERF_NOTES par.23 flush);
        # callers that resume from a checkpoint must call set_host_step()
        self.host_step = 0
        self._apply_march_schedule()
        self._step_fn = self._build_step()
        self._block_fn = None   # lax.scan multi-step program, built lazily
        self._render_fn = None  # cached whole-image chunked renderer

    def set_host_step(self, step: int) -> None:
        """Sync the host step mirror after a checkpoint restore and apply
        any march-schedule stage that step falls into."""
        self.host_step = int(step)
        self._apply_march_schedule()

    def _apply_march_schedule(self) -> None:
        """Swap rcfg.n_compact per cfg.n_compact_schedule at host_step;
        invalidates compiled programs on change (staged re-jit)."""
        sched = self.cfg.n_compact_schedule
        if not sched:
            return
        nc = None
        for frm, v in sched:
            if self.host_step >= frm:
                nc = v
        if nc is not None and nc != self.rcfg.n_compact:
            self.rcfg = dataclasses.replace(self.rcfg, n_compact=nc)
            self._block_fn = None
            self._render_fn = None
            if getattr(self, "_step_fn", None) is not None:
                self._step_fn = self._build_step()

    def _build_step(self):
        model_apply = self.model.apply
        density_apply = self.model.density_raw
        occ_cfg, rcfg, cfg, tx = self.occ_cfg, self.rcfg, self.cfg, self.tx
        elem_loss = self.loss_fn

        @jax.jit
        def step_fn(state: NGPTrainState, rays_o, rays_d, target, bg, key):
            def loss_fn(params):
                out = render_rays_ngp(occ_cfg, rcfg, model_apply, params,
                                      state.occ, rays_o, rays_d, bg, key,
                                      density_apply=density_apply)
                loss = elem_loss(out.rgb, target).mean()
                return loss, (out.n_samples,
                              mse2psnr(jnp.mean((out.rgb - target) ** 2)))

            (loss, (n_samp, psnr)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = apply_param_update(cfg, tx, state, grads)
            return new_state, {"loss": loss, "psnr": psnr, "n_samples": n_samp}

        return step_fn

    def _build_block(self):
        """S train steps under one jitted lax.scan — the dispatch latency of
        this platform (~30 ms/call through the axon tunnel) would otherwise
        dominate a ~60-100 ms step. One block per update_den_freq cadence so
        the occupancy-grid update stays a host-side boundary like the
        reference's every-16-steps update (density_grid_sampler.py:251-260).
        """
        model_apply = self.model.apply
        density_apply = self.model.density_raw
        occ_cfg, rcfg, cfg, tx = self.occ_cfg, self.rcfg, self.cfg, self.tx
        elem_loss = self.loss_fn

        @jax.jit
        def block_fn(state: NGPTrainState, rays_o, rays_d, target, bg, key):
            def one(state, xs):
                o, d, tgt, b, k = xs

                def loss_fn(params):
                    out = render_rays_ngp(occ_cfg, rcfg, model_apply, params,
                                          state.occ, o, d, b, k,
                                          density_apply=density_apply)
                    loss = elem_loss(out.rgb, tgt).mean()
                    return loss, (out.n_samples,
                                  mse2psnr(jnp.mean((out.rgb - tgt) ** 2)))

                (loss, (n_samp, psnr)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                state = apply_param_update(cfg, tx, state, grads)
                return state, {"loss": loss, "psnr": psnr, "n_samples": n_samp}

            S = rays_o.shape[0]
            keys = jax.random.split(key, S)
            state, ms = jax.lax.scan(one, state,
                                     (rays_o, rays_d, target, bg, keys))
            return state, jax.tree_util.tree_map(lambda x: x[-1], ms), \
                ms["n_samples"].sum()

        return block_fn

    def train_block(self, rays_o, rays_d, target, key, bg=None):
        """Run S = rays_o.shape[0] steps in one dispatch.

        rays_o/rays_d [S, B, 3], target [S, B, 3], bg [S, B, 3] or [3].
        Callers align S with update_den_freq and run the occupancy update
        between blocks (train loop in cli/run_net.py, bench.py).
        """
        S, B = rays_o.shape[:2]
        self._apply_march_schedule()
        self.host_step += S
        if self._block_fn is None:
            self._block_fn = self._build_block()
        if bg is None:
            bg = self.cfg.background_color
        bg = jnp.asarray(bg)
        if bg.shape != (S, B, 3):
            # accept [3] / [B, 3]: the scan consumes one [B, 3] slice per
            # step, so anything else must be broadcast up front
            bg = jnp.broadcast_to(bg, (S, B, 3))
        self.state, metrics, n_total = self._block_fn(
            self.state, jnp.asarray(rays_o), jnp.asarray(rays_d),
            jnp.asarray(target), jnp.asarray(bg), key)
        # lazy device-side accumulation: a float() here would force a
        # pipeline flush after EVERY block (~6 ms/step of axon-tunnel
        # serialization at the bench shape, PERF_NOTES par.22); the host
        # only needs the value at _update_batch_rays time
        self._measured_samples = self._measured_samples + n_total
        self._measure_count += S
        return metrics

    def train_step(self, rays_o, rays_d, target, key, bg_color=None):
        cfg = self.cfg
        self._apply_march_schedule()
        self.host_step += 1
        it = int(self.state.step)
        if it % cfg.update_den_freq == 0:
            key, k = jax.random.split(key)
            new_occ = self.grid_update(self.state.occ, self.state.params, k)
            self.state = self.state._replace(occ=new_occ)
        bg = jnp.asarray(bg_color if bg_color is not None
                         else cfg.background_color)
        key, k = jax.random.split(key)
        self.state, metrics = self._step_fn(self.state, rays_o, rays_d,
                                            target, bg, k)
        self._measured_samples = self._measured_samples + metrics["n_samples"]
        self._measure_count += 1
        if it % cfg.update_den_freq == cfg.update_den_freq - 1:
            self._update_batch_rays()
        return metrics

    def _update_batch_rays(self):
        """Resize the ray batch toward target_batch_size samples
        (update_batch_rays, density_grid_sampler.py:262-267). Host scalar.
        Snapped DOWN to a quarter-octave ladder ({1, 1.25, 1.5, 1.75} x 2^k):
        every distinct batch shape costs a fresh XLA compile (slow through
        the remote-compile tunnel), so the adaptation walks a small ladder
        instead of the reference's 128-ray increments — but flooring to the
        ladder keeps the realized sample count AT OR UNDER the reference's
        samples-per-batch budget (Easyship.py:95) instead of overshooting
        it by up to 41% the way nearest-pow2 rounding can."""
        measured = max(float(self._measured_samples)
                       / max(self._measure_count, 1), 1.0)
        rays = int(self.n_rays_per_batch * self.cfg.target_batch_size / measured)
        rays = max(128, min(rays, self.cfg.target_batch_size))
        self.n_rays_per_batch = _ladder_floor(rays)
        self._measured_samples = 0.0
        self._measure_count = 0

    def render_image(self, pose_c2w: jnp.ndarray, intr: jnp.ndarray,
                     H: int, W: int, chunk: int = 4096):
        """Chunked full-image render (Runner.render_img, runner.py:195-228).

        state.params ARE the EMA-smoothed params (the reference's EMA
        optimizer blends into the live params every step, ema.py:33-35),
        so there is no separate smoothed tree to select."""
        from ..geom import rays as rays_lib

        d = rays_lib.get_ray_directions(H, W, (intr[0, 0], intr[1, 1]),
                                        center=(intr[0, 2], intr[1, 2]))
        rays_d = (d.reshape(-1, 3) @ pose_c2w[:3, :3].T)
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = jnp.broadcast_to(pose_c2w[:3, 3], rays_d.shape)
        n = H * W
        pad = (-n) % chunk
        rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
        rays_d = jnp.pad(rays_d, ((0, pad), (0, 0)))
        params = self.state.params
        bg = jnp.asarray(self.cfg.background_color)

        if self._render_fn is None:
            model_apply = self.model.apply
            occ_cfg, rcfg = self.occ_cfg, self.rcfg

            @jax.jit
            def render_all(params, occ_state, ro3, rd3, bg):
                def one(chunk_rays):
                    ro, rd = chunk_rays
                    out = render_rays_ngp(occ_cfg, rcfg, model_apply, params,
                                          occ_state, ro, rd, bg, None)
                    return out.rgb, out.depth

                return jax.lax.map(one, (ro3, rd3))

            self._render_fn = render_all

        rgb, depth = self._render_fn(
            params, self.state.occ, rays_o.reshape(-1, chunk, 3),
            rays_d.reshape(-1, chunk, 3), bg)
        rgb = rgb.reshape(-1, 3)[:n].reshape(H, W, 3)
        depth = depth.reshape(-1)[:n].reshape(H, W)
        return rgb, depth
