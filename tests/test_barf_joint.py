"""BARF joint pose-refinement mechanics (two-phase, deterministic).

Full joint BARF convergence needs reference-scale budgets (200k iters at
400x400); at CI scale the field/pose coupling random-walks. This test
verifies the trainer's pose-refinement path end-to-end with the gauge fixed:
fit the field on clean poses, then inject per-image se(3) noise with
refinement enabled and a near-frozen field — corrections must recover
noise^-1 (pose error drops >2x without any alignment).
"""
import jax
import jax.numpy as jnp
import pytest

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.evaluation import pose_eval
from myc_nerfs_tpu.geom import lie, pose as pose_lib
from myc_nerfs_tpu.train import nerf_trainer as nt


@pytest.mark.slow
def test_pose_refinement_recovers_noise():
    scene = make_scene(n_views=8, H=20, W=20, textured=True)
    arch = dict(widths_feat=(64,) * 4, widths_rgb=(32, 3), skip=(2,),
                posenc_L3D=6, posenc_Lview=2, depth_range=scene.depth_range,
                sample_intvs=32, rand_rays=1280)
    cfg1 = nt.NeRFTrainConfig(model="nerf", lr=5e-3, lr_end=1e-3, max_iter=350,
                              **arch)
    model, state1 = nt.init_state(cfg1, jax.random.PRNGKey(0), 8)
    step1 = nt.make_train_step(cfg1, model, scene.images, scene.poses, scene.intr)
    key = jax.random.PRNGKey(1)
    for _ in range(350):
        key, k = jax.random.split(key)
        state1, m = step1(state1, k)

    cfg2 = nt.NeRFTrainConfig(model="nerf", lr=1e-5, lr_end=1e-5,
                              refine_pose=True, camera_noise=0.04,
                              lr_pose=5e-3, lr_pose_end=1e-3, max_iter=200,
                              **arch)
    _, state2 = nt.init_state(cfg2, jax.random.PRNGKey(5), 8)
    state2 = state2._replace(params=state1.params)
    step2 = nt.make_train_step(cfg2, model, scene.images, scene.poses, scene.intr)

    def raw_err(state):
        noisy = pose_lib.compose_pair(lie.se3_to_SE3(state.pose_noise), scene.poses)
        refined = pose_lib.compose_pair(lie.se3_to_SE3(state.se3_refine), noisy)
        e = pose_eval.evaluate_camera_alignment(refined, scene.poses)
        return float(e.R.mean()), float(e.t.mean())

    r0, t0 = raw_err(state2)
    for _ in range(200):
        key, k = jax.random.split(key)
        state2, m = step2(state2, k)
    r1, t1 = raw_err(state2)
    assert r1 < 0.5 * r0, f"R err {r0} -> {r1}"
    assert t1 < 0.5 * t0, f"t err {t0} -> {t1}"
