"""Benchmark: Instant-NGP hash pipeline TRAIN throughput (rays/s/chip).

Run by the driver on the TPU chip at the end of every round. Prints ONE JSON
line {"metric", "value", "unit", "vs_baseline", "detail"}.

Headline (the honest, like-for-like number): the NGP **hash pipeline at the
reference config** (L16F2, 2^19 params/level, brick-packed layout) measured
TRAIN-side — full march + encode + MLP + composite + Huber + Adam + EMA +
occupancy-grid updates at the reference cadence, with the reference's ray
batch adaptation toward target_batch_size = 2^18 samples
(density_grid_sampler.py:262-267). Baseline: 133 iters/s x 4096 rays =
0.54 Mrays/s train-side on an RTX 3090 (jnerf-myc/README.md:96 +
projects/ngp/configs/Easyship.py:92; BASELINE.md).

Detail fields carry the hash render throughput and the TPU-flagship MXU
field (OriginNeRF bf16, zero gathers) render/train numbers — those beat the
hash path on TPU but are NOT the baseline comparable, so they no longer
headline. Scene: ~11%-occupancy ball ("aabb-realistic"), occupancy state
re-pinned after each update so the throughput sample is stationary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_TRAIN_RAYS_PER_S = 0.54e6
RENDER_RAYS = 16384
RENDER_CHUNKS = 8   # one dispatch renders CHUNKS x RAYS via lax.map (a full
                    # image is ~640k rays — single-dispatch is the real shape)
RENDER_ITERS = 4


def make_rays(n, key=None):
    if key is None:
        key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.sin(theta) * jnp.sin(phi),
                        0.5 + 1.4 * jnp.cos(phi)], -1)
    rays_d = 0.5 - rays_o
    return rays_o, rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


def occupancy_ball():
    from myc_nerfs_tpu.render import occupancy as occ

    occ_cfg = occ.OccupancyConfig()
    state = occ.init_occupancy(occ_cfg)
    centers = occ.cell_centers(occ_cfg, 0)
    ball = jnp.linalg.norm(centers - 0.5, axis=-1) < 0.3  # ~11% occupancy
    # density grid consistent with the bitfield (the fused march probes the
    # grid; value 0.05 > thresh keeps every ball cell live through the
    # coarse-transmittance truncation at realistic magnitudes)
    grid = jnp.where(ball, 0.05, 0.0)
    return occ_cfg, state._replace(
        bitfield=state.bitfield.at[0].set(ball),
        density_grid=state.density_grid.at[0].set(grid),
        mean_density=jnp.maximum(grid, 0.0).mean())


def host_sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(leaves[0].astype(jnp.float32).sum())


def measure_render(render_fn, params, rays_o, rays_d):
    """render_fn maps one [RENDER_RAYS, 3] chunk; measured as ONE dispatch
    over RENDER_CHUNKS chunks via lax.map (whole-image rendering is one
    jitted program — per-dispatch tunnel latency is not part of the work)."""
    o = jnp.broadcast_to(rays_o, (RENDER_CHUNKS,) + rays_o.shape)
    d = jnp.broadcast_to(rays_d, (RENDER_CHUNKS,) + rays_d.shape)

    @jax.jit
    def render_all(params, o, d):
        return jax.lax.map(lambda ch: render_fn(params, ch[0], ch[1]), (o, d))

    host_sync(render_all(params, o, d))
    t0 = time.perf_counter()
    for _ in range(RENDER_ITERS):
        out = render_all(params, o, d)
    host_sync(out)
    n = RENDER_RAYS * RENDER_CHUNKS * RENDER_ITERS
    return n / (time.perf_counter() - t0)


def measure_ngp_train(grid_impl="brick3", model=None, steps_per_block=16,
                      n_samples=64, n_coarse=128, n_compact=20):
    """Full training pipeline throughput at reference config.

    n_compact=20 is the shipped train-march budget: quality-gated on the
    256^2 detail scene at BOTH horizons — 6k steps (33.75 vs 33.75 at 32)
    and the full 40k reference budget (-0.23 dB, inside gate noise).
    The 18 rung passes 6k but fails the 40k budget by -1.15 dB
    (PERF_NOTES par.18d) and was reverted; swept at this exact bench shape
    (ncompact_bench_probe: 95.6 -> 155.9 krays/s). The reference's marcher
    adapts its per-ray budget dynamically to fill 2^18 samples
    (density_grid_sampler.py:262-267); this is the static-K equivalent."""
    from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModelConfig
    from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
    from myc_nerfs_tpu.train.ngp_trainer import NGPTrainConfig, NGPTrainer

    occ_cfg, occ_ball = occupancy_ball()
    mcfg = NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                          grid_impl=grid_impl)
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=n_coarse,
                           n_samples=n_samples, n_compact=n_compact)
    tcfg = NGPTrainConfig(n_rays_per_batch=4096, target_batch_size=1 << 18,
                          n_grid_uniform=1 << 16, n_grid_nonuniform=1 << 16,
                          update_den_freq=steps_per_block)
    trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
    trainer.state = trainer.state._replace(occ=occ_ball)
    key = jax.random.PRNGKey(2)

    scan_ok = [True]

    def run_block(key, n_rays):
        """One reference-cadence block: grid update + 16 jitted train steps
        in one dispatch + batch adaptation. Falls back to pipelined
        single-step dispatches if the scanned program crashes the remote
        compiler (HTTP 500 on large scan bodies)."""
        key, k1, k2, k3 = jax.random.split(key, 4)
        new_occ = trainer.grid_update(trainer.state.occ, trainer.state.params, k1)
        # pin occupancy back to the ball so the throughput sample is
        # stationary (update cost stays in the measurement)
        trainer.state = trainer.state._replace(occ=occ_ball)
        S = tcfg.update_den_freq
        o, d = make_rays(S * n_rays, k2)
        o = o.reshape(S, n_rays, 3)
        d = d.reshape(S, n_rays, 3)
        tgt = jax.random.uniform(k3, (S, n_rays, 3))
        if scan_ok[0]:
            try:
                trainer.train_block(o, d, tgt, key)
                host_sync(trainer.state.params)
                return key, S, S * n_rays
            except Exception:
                scan_ok[0] = False
        for s in range(S):
            key, k = jax.random.split(key)
            trainer.train_step(o[s], d[s], tgt[s], k)
        host_sync(trainer.state.params)
        return key, S, S * n_rays

    # warmup + adaptation (compiles one program per batch-size rung)
    for _ in range(4):
        key, _, _ = run_block(key, trainer.n_rays_per_batch)
        trainer._update_batch_rays()

    # measured: steady-state training at the adapted batch. Ray batches are
    # pre-staged on device OUTSIDE the window (a real loop samples from a
    # device-resident ray store and overlaps host work with device compute;
    # run_block's eager per-block make_rays/host_sync serialized ~6 ms/step
    # of pure axon-tunnel submission latency into rounds 1-4a measurements
    # — PERF_NOTES par.22). Blocks pipeline; one sync closes the window.
    n_meas = 6 if scan_ok[0] else 2
    S = tcfg.update_den_freq
    n_rays = trainer.n_rays_per_batch
    staged = []
    for i in range(n_meas):
        key, k2, k3 = jax.random.split(key, 3)
        o, d = make_rays(S * n_rays, k2)
        staged.append((o.reshape(S, n_rays, 3), d.reshape(S, n_rays, 3),
                       jax.random.uniform(k3, (S, n_rays, 3))))
    host_sync(trainer.state.params)  # drain warmup before opening the window
    t0 = time.perf_counter()
    steps = rays = 0
    for i, (o, d, tgt) in enumerate(staged):
        key, k1, kb = jax.random.split(key, 3)
        trainer.grid_update(trainer.state.occ, trainer.state.params, k1)
        if scan_ok[0]:
            trainer.train_block(o, d, tgt, kb)
        else:
            for s in range(S):
                kb, k = jax.random.split(kb)
                trainer.train_step(o[s], d[s], tgt[s], k)
        steps += S
        rays += S * n_rays
    host_sync(trainer.state.params)
    dt = time.perf_counter() - t0
    return {"train_rays_per_s": rays / dt, "iters_per_s": steps / dt,
            "rays_per_batch": trainer.n_rays_per_batch,
            "trainer": trainer, "rcfg": rcfg, "occ": (occ_cfg, occ_ball)}


def measure_garf_train():
    """GARF-shaped pose-refinement training throughput (barf-myc stack).

    Reference budget: 200k iters x 2048 rays x 128 samples, 8x256 MLP with
    joint per-image SE(3) refinement + 2nd optimizer (options/Easyship.yaml).
    No published iters/s exists for the 3090, so this reports absolute
    rays/s/chip — the wide-MLP workload is the MXU-friendly stack."""
    from myc_nerfs_tpu.data.synthetic import make_scene
    from myc_nerfs_tpu.train import nerf_trainer as nt

    scene = make_scene(n_views=8, H=64, W=64)
    cfg = nt.NeRFTrainConfig(model="garf", refine_pose=True,
                             rand_rays=2048, sample_intvs=128,
                             max_iter=200000)
    model, state = nt.init_state(cfg, jax.random.PRNGKey(0),
                                 n_images=scene.images.shape[0])
    block = nt.make_train_block(cfg, model, scene.images, scene.poses,
                                scene.intr, steps_per_block=16)
    key = jax.random.PRNGKey(3)
    state, _ = block(state, key)
    host_sync(state.params)
    t0 = time.perf_counter()
    nblk = 4
    for i in range(nblk):
        state, m = block(state, jax.random.fold_in(key, i))
    host_sync(state.params)
    dt = time.perf_counter() - t0
    steps = nblk * 16
    return {"rays_per_s": steps * cfg.rand_rays / dt,
            "iters_per_s": steps / dt}


def measure_tensorf_train():
    """TensoRF train throughput at the Coffee-budget shape (tensorf-myc).

    The reference publishes no TensoRF iters/s, so this reports absolute
    rays/s/chip at the hardest stage of the Coffee 30k schedule: 300^3
    VM-split voxels, batch 4096, step_ratio 0.5 (opt.py:127 -> n_samples
    1036 per ray — the REAL sample count; earlier probes at step_ratio 2.0
    ran 4x fewer), the real 256^3 alpha mask (corner-dilated single-gather
    gate, PERF_NOTES par.14), the static density-sample compaction at the
    CLI-default budget 256 (the reference's ray_valid boolean indexing,
    tensorBase.py:497-504) and the Coffee regularizers (TV 0.3 x2 + L1).
    Shape-parity: tensorf-myc/configs/Coffee.txt:11 + tensorf-myc/train.py
    (N_voxel_final 27e6, batch_size 4096)."""
    from myc_nerfs_tpu.models import tensorf as tf
    from myc_nerfs_tpu.train import tensorf_trainer as tt

    mcfg = tf.TensoRFConfig(decomp="vm_split", step_ratio=0.5,
                            density_sample_budget=256)
    cfg = tt.TensoRFTrainConfig(
        n_voxel_init=300 ** 3, batch_size=4096,
        tv_weight_density=0.3, tv_weight_app=0.3,
        l1_weight_initial=4e-5, l1_weight_rest=2e-5)
    aabb = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]], np.float32)
    trainer = tt.TensoRFTrainer(mcfg, cfg, aabb, jax.random.PRNGKey(0))
    # ball-shaped 256^3 alpha volume (~real-scene pass rate), then the
    # production corner-dilated nearest-gather gate
    reso = 256
    g = (jnp.arange(reso) + 0.5) / reso - 0.5
    r = jnp.sqrt(g[:, None, None] ** 2 + g[None, :, None] ** 2
                 + g[None, None, :] ** 2)
    trainer.buffers = dict(trainer.buffers)
    trainer.buffers["alpha_volume"] = (r < 0.35).astype(jnp.float32)
    trainer.buffers["alpha_aabb"] = jnp.asarray(aabb)
    trainer.buffers = tf.prepare_alpha_buffers(trainer.buffers)
    trainer._rebuild(lr_scale=1.0)
    key = jax.random.PRNGKey(1)
    S = 16
    n = S * cfg.batch_size
    theta = jax.random.uniform(key, (n,)) * 6.28318
    phi = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 3.14159
    o = jnp.stack([3.0 * jnp.cos(theta) * jnp.sin(phi),
                   3.0 * jnp.sin(theta) * jnp.sin(phi),
                   3.0 * jnp.cos(phi)], -1)
    d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    rays = jnp.concatenate([o, d], -1).reshape(S, cfg.batch_size, 6)
    rgbs = jax.random.uniform(jax.random.fold_in(key, 2),
                              (S, cfg.batch_size, 3))
    p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                               rays, rgbs, key, jnp.int32(0))
    trainer.params = p
    host_sync(p)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        p, o, m = trainer.block_fn(trainer.params, trainer.opt_state,
                                   rays, rgbs, jax.random.fold_in(key, i),
                                   jnp.int32(16 * i))
    host_sync(p)
    dt = (time.perf_counter() - t0) / (reps * S)
    return {"rays_per_s": cfg.batch_size / dt, "iters_per_s": 1.0 / dt}


def _flagship_train_subprocess():
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-train"],
            capture_output=True, text=True, timeout=1500)
        for line in out.stdout.strip().splitlines()[::-1]:
            if line.startswith("{"):
                return json.loads(line)
        err = (out.stderr or "no json line from flagship subprocess")[-200:]
    except Exception as e:
        # on timeout the K=32 line may already be on the captured stdout
        partial = getattr(e, "stdout", None) or ""
        if isinstance(partial, bytes):
            partial = partial.decode("utf-8", "replace")
        for line in partial.strip().splitlines()[::-1]:
            if line.startswith("{"):
                try:
                    res = json.loads(line)
                except json.JSONDecodeError:
                    continue  # line truncated mid-write by the timeout kill
                res["k64_remat_error"] = str(e)[:200]
                return res
        err = str(e)[:200]
    # a broken path must not masquerade as a slow path: rates become null
    return {"train_rays_per_s": None, "iters_per_s": None,
            "rays_per_batch": None, "error": err}


def flagship_train_main():
    from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel

    # K=32 is the round-1/2 comparable; K=64 previously OOMed HBM on the
    # 8x256 backward activations — jax.checkpoint (remat) on the backbone
    # lifts that (VERDICT r2 #5), measured here as a separate field.
    # steps_per_block=16 is the REFERENCE grid-update cadence
    # (update_den_freq, density_grid_sampler.py:251-260); rounds 2-3 used 4
    # to dodge a remote-compile limit that no longer exists (PERF_NOTES
    # §10) and paid ~2 extra dispatch floors per 4 steps for it.
    # n_coarse=64 for the flagship: quality-gated on the 256^2 detail scene
    # at 6000 steps — val PSNR 21.41 (64) vs 21.32 (128), quality_r4_log
    # flagship_ncoarse_gate events — and worth ~5.8 ms/step (PERF_NOTES
    # par.9c). The hash headline keeps n_coarse=128 (unchanged definition).
    out = {}
    flagship = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
    # n_compact=20: gated at the 40k reference horizon for the FLAGSHIP
    # specifically (round-5 runs, quality_r5_log flagship40k events —
    # val 21.89 at nc=20 vs 21.95 at nc=32, -0.06 dB, inside the 0.1 dB
    # parity band), per the PERF_NOTES par.18d rule that march-budget cuts
    # need the full reference budget, not the 6k screen. This is the
    # config PERF_NOTES par.24 measured at 568 krays/s = 1.05x the 3090
    # train baseline.
    res = measure_ngp_train(model=flagship, steps_per_block=16, n_samples=32,
                            n_coarse=64, n_compact=20)
    out.update({"train_rays_per_s": res["train_rays_per_s"],
                "iters_per_s": res["iters_per_s"],
                "rays_per_batch": res["rays_per_batch"]})
    # emit the K=32 comparable immediately: if the K=64 remat attempt kills
    # the process (TPU worker crash / parent timeout), the parent's
    # last-JSON-line scan still recovers this result
    print(json.dumps(out), flush=True)
    try:
        remat = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True,
                                                 remat=True))
        # under the fused march the compaction budget IS the per-ray sample
        # count (K = n_compact, render_rays_ngp) — the old n_samples=64 arg
        # was inert, so this leg silently measured K=32. n_compact=64 makes
        # the 2x-samples remat leg march 64 live samples for real.
        res64 = measure_ngp_train(model=remat, steps_per_block=16,
                                  n_samples=64, n_coarse=64, n_compact=64)
        out.update({"train_rays_per_s_k64_remat": res64["train_rays_per_s"],
                    "iters_per_s_k64_remat": res64["iters_per_s"],
                    "rays_per_batch_k64": res64["rays_per_batch"]})
    except Exception as e:  # OOM or compile failure: record, don't fake
        out["k64_remat_error"] = str(e)[:200]
    print(json.dumps(out))


def main():
    from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, NGPModelConfig
    from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
    from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp

    res = measure_ngp_train("brick3")
    occ_cfg, occ_state = res["occ"]
    # Phase-2 of the shipped staged march budget (n_compact 20 until
    # decay_start=20000, 32 after — run_net's aabb_scale<=1 default since
    # round 5). The headline reports the BUDGET-WEIGHTED average over the
    # reference's 40k schedule: what a user actually pays end-to-end at
    # full quality parity (40k val 33.30 vs 33.17 for flat-32 and 32.89
    # for flat-20, quality_r5_log ngp40k_budget_nc_schedule). The flat
    # nc=20 steady rate stays in detail as phase-1.
    res32 = measure_ngp_train("brick3", n_compact=32)
    # render profile RE-GATED on the full-40k shipped-config checkpoint in
    # round 5 (probe_r4_render --eps2/--eps3 on /tmp/ngp40k_nc20_r5.ckpt;
    # quality_r5_log render_profile_regate): the round-4 (K=20, eps 1e-2)
    # profile — accepted on a 6k ckpt — costs -0.118 dB at the 40k horizon
    # (outside the 0.1 dB gate; the par.18d lesson applies to render
    # profiles too). Shipped instead: K=18, eps=4.5e-3 — -0.06 dB on the
    # 40k ckpt AND faster (371 vs 346 krays/s).
    rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=18,
                           early_stop_eps=4.5e-3)
    rays_o, rays_d = make_rays(RENDER_RAYS)
    bg = jnp.ones((3,))

    # NGP hash render (reference L16F2 config, brick layout)
    ngp = NGPModel(NGPModelConfig(grid=HashGridConfig(), use_bf16=True,
                                  grid_impl="brick3"))
    nparams = ngp.init(jax.random.PRNGKey(0))
    nrender = jax.jit(lambda p, o, d: render_rays_ngp(
        occ_cfg, rcfg, ngp.apply, p, occ_state, o, d, bg).rgb)
    ngp_render_rate = measure_render(nrender, nparams, rays_o, rays_d)

    # TPU-flagship MXU field (zero gathers) render + train
    flagship = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True))
    fparams = flagship.init(jax.random.PRNGKey(0))
    frender = jax.jit(lambda p, o, d: render_rays_ngp(
        occ_cfg, rcfg, flagship.apply, p, occ_state, o, d, bg).rgb)
    flagship_render_rate = measure_render(frender, fparams, rays_o, rays_d)
    # measured in a fresh subprocess: the remote compile helper reliably
    # 500s on the flagship train program after this process's earlier
    # compiles (it compiles fine in a clean process)
    fres = _flagship_train_subprocess()

    try:
        gres = measure_garf_train()
    except Exception as e:
        # a broken path must not masquerade as a slow path (r2 review):
        # rates become null in the JSON, the error string says why
        gres = {"rays_per_s": None, "iters_per_s": None,
                "error": str(e)[:200]}

    try:
        tres = measure_tensorf_train()
    except Exception as e:
        tres = {"rays_per_s": None, "iters_per_s": None,
                "error": str(e)[:200]}

    # budget-weighted average over the reference 40k schedule: 20k steps in
    # each phase of the staged march budget (20 -> 32 at decay_start)
    half = 20000
    t1 = half / res["iters_per_s"]
    t2 = half / res32["iters_per_s"]
    train_rate = (half * res["rays_per_batch"] + half * res32["rays_per_batch"]) \
        / (t1 + t2)
    print(json.dumps({
        "metric": "ngp_hash_train_throughput",
        "value": round(train_rate, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(train_rate / BASELINE_TRAIN_RAYS_PER_S, 3),
        "detail": {
            "headline": "Instant-NGP L16F2 (level-tripled brick) full train step: "
                        "march+encode+MLP+composite+Huber+Adam+EMA+grid "
                        "updates, ray batch adapted to 2^18 samples, STAGED "
                        "march budget n_compact 20->32 at decay_start (the "
                        "shipped default; 40k-horizon val 33.30 vs 33.17 "
                        "flat-32 / 32.89 flat-20 — full quality parity). "
                        "Value = budget-weighted average of both phases "
                        "over the reference 40k schedule; phase rates in "
                        "detail.",
            "n_compact_schedule": "0:20,20000:32",
            "phase1_nc20_rays_per_s": round(
                res["train_rays_per_s"], 1),
            "phase1_iters_per_s": round(res["iters_per_s"], 2),
            "phase2_nc32_rays_per_s": round(
                res32["train_rays_per_s"], 1),
            "phase2_iters_per_s": round(res32["iters_per_s"], 2),
            "iters_per_s": round(
                2 * half / (t1 + t2), 2),
            "rays_per_batch_adapted": res["rays_per_batch"],
            "ngp_hash_render_rays_per_s": round(ngp_render_rate, 1),
            "ngp_hash_render_vs_baseline": round(
                ngp_render_rate / BASELINE_TRAIN_RAYS_PER_S, 3),
            "flagship_mxu_render_rays_per_s": round(flagship_render_rate, 1),
            "flagship_mxu_render_vs_baseline": round(
                flagship_render_rate / BASELINE_TRAIN_RAYS_PER_S, 3),
            "flagship_mxu_train_rays_per_s": (
                round(fres["train_rays_per_s"], 1)
                if fres.get("train_rays_per_s") is not None else None),
            "flagship_mxu_train_vs_baseline": (
                round(fres["train_rays_per_s"] / BASELINE_TRAIN_RAYS_PER_S, 3)
                if fres.get("train_rays_per_s") is not None else None),
            **({"flagship_train_error": fres["error"]}
               if "error" in fres else {}),
            **({"flagship_mxu_train_k64_remat_rays_per_s": round(
                    fres["train_rays_per_s_k64_remat"], 1)}
               if "train_rays_per_s_k64_remat" in fres else {}),
            **({"flagship_k64_remat_error": fres["k64_remat_error"]}
               if "k64_remat_error" in fres else {}),
            "garf_train_rays_per_s": (round(gres["rays_per_s"], 1)
                                      if gres["rays_per_s"] is not None
                                      else None),
            "garf_train_iters_per_s": (round(gres["iters_per_s"], 2)
                                       if gres["iters_per_s"] is not None
                                       else None),
            **({"garf_train_error": gres["error"]} if "error" in gres else {}),
            "tensorf_train_rays_per_s": (round(tres["rays_per_s"], 1)
                                         if tres["rays_per_s"] is not None
                                         else None),
            "tensorf_train_iters_per_s": (round(tres["iters_per_s"], 2)
                                          if tres["iters_per_s"] is not None
                                          else None),
            **({"tensorf_train_error": tres["error"]}
               if "error" in tres else {}),
            "baseline": "0.54 Mrays/s train-side (133 it/s x 4096 rays), "
                        "instant-ngp on RTX 3090",
        },
    }))


if __name__ == "__main__":
    if "--flagship-train" in sys.argv:
        flagship_train_main()
    else:
        main()
