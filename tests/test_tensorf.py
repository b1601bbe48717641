"""TensoRF family tests: factors, staged training, NeRF++, Ref-NeRF."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.models import nerfpp, ref_tensorf, tensorf as tf
from myc_nerfs_tpu.train import tensorf_trainer as tt
from myc_nerfs_tpu.utils.metrics import psnr

AABB = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]])


def small_cfg(**kw):
    base = dict(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                featureC=32, near_far=(1.5, 4.5), distance_scale=25.0,
                density_shift=-5.0, shading_mode="MLP_Fea")
    base.update(kw)
    return tf.TensoRFConfig(**base)


class TestFactors:
    def test_vm_density_feature_separable(self):
        """A rank-1 constructed factor must reproduce its outer product."""
        cfg = small_cfg(density_n_comp=(1, 1, 1))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (9, 9, 9))
        # plane_0 covers (x, y); line_0 covers z — set plane=1, line=linear in z
        params["density_plane"] = tuple(jnp.ones_like(p) for p in params["density_plane"])
        params["density_line"] = tuple(jnp.linspace(0, 1, 9)[None, :] for _ in range(3))
        xyz = jnp.array([[0.0, 0.0, 1.0]])  # z at +1 -> line value 1 on all axes
        f = tf.compute_density_feature(cfg, params, xyz)
        # each of 3 plane/line products contributes line(coord)=...
        # axis order VEC_MODE=(2,1,0): coords z=1->1.0, y=0->0.5, x=0->0.5
        np.testing.assert_allclose(float(f[0]), 1.0 + 0.5 + 0.5, atol=1e-5)

    def test_cp_decomp_runs(self):
        cfg = small_cfg(decomp="cp", density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (9, 9, 9))
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (17, 3), minval=-1, maxval=1)
        f = tf.compute_density_feature(cfg, params, xyz)
        a = tf.compute_app_feature(cfg, params, xyz)
        assert f.shape == (17,) and a.shape == (17, 12)

    def test_upsample_preserves_function(self):
        """Bilinear upsample must keep grid values at matching coords."""
        cfg = small_cfg()
        params, _ = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
        before = tf.compute_density_feature(cfg, params, xyz)
        up = tf.upsample_volume_grid(cfg, params, (15, 15, 15))
        after = tf.compute_density_feature(cfg, up, xyz)
        # 8->15 doubles resolution with aligned corners: lerp is exact at old
        # knots, close elsewhere
        np.testing.assert_allclose(np.asarray(before), np.asarray(after), atol=0.2)
        corners = jnp.array([[-1.0, -1, -1], [1, 1, 1], [-1, 1, -1]])
        np.testing.assert_allclose(
            np.asarray(tf.compute_density_feature(cfg, params, corners)),
            np.asarray(tf.compute_density_feature(cfg, up, corners)), atol=1e-4)

    def test_shrink_slices_grid(self):
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (10, 10, 10))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (10, 10, 10))
        new_aabb = np.array([[-0.8, -0.8, -0.8], [0.8, 0.8, 0.8]])
        p2, b2, new_size = tf.shrink(cfg, geom, params, buffers, new_aabb)
        assert all(s <= 10 for s in new_size) and all(s >= 5 for s in new_size)
        assert p2["density_plane"][0].shape[1:] == (new_size[tf.MAT_MODE[0][1]],
                                                    new_size[tf.MAT_MODE[0][0]])

    def test_regularizers_finite(self):
        cfg = small_cfg()
        params, _ = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        for val in (tf.vector_comp_diffs(params), tf.density_L1(cfg, params),
                    tf.tv_loss_density(cfg, params), tf.tv_loss_app(cfg, params)):
            assert np.isfinite(float(val)) and float(val) >= 0

    def test_alpha_mask_roundtrip(self):
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        new_buffers, new_aabb = tf.update_alpha_mask(cfg, geom, params, buffers,
                                                     (16, 16, 16))
        assert new_buffers["alpha_volume"].shape == (16, 16, 16)
        # sampling the mask anywhere returns finite 0/1
        v = tf.sample_alpha_mask(new_buffers["alpha_volume"],
                                 new_buffers["alpha_aabb"],
                                 jnp.zeros((5, 3)))
        assert np.isfinite(np.asarray(v)).all()

    def test_occupancy_matches_trilinear_predicate(self):
        """Single-gather occupancy == (trilinear of binary volume) > 0.

        The forwards gate samples on `alpha > 0` (tensorBase.py:491-496);
        for interior coords the corner-dilated nearest lookup is the same
        predicate at 1/8 the gather count (PERF_NOTES par.14).
        """
        key = jax.random.PRNGKey(7)
        vol = (jax.random.uniform(key, (9, 7, 5)) < 0.3).astype(jnp.float32)
        aabb = jnp.asarray(AABB, jnp.float32)
        bufs = tf.prepare_alpha_buffers(
            {"alpha_volume": vol, "alpha_aabb": aabb})
        assert bufs["alpha_volume_dil"].shape == vol.shape
        # strictly interior, off the grid planes
        xyz = jax.random.uniform(jax.random.PRNGKey(8), (4096, 3),
                                 minval=-1.19, maxval=1.19)
        fast = np.asarray(tf.alpha_mask_valid(bufs, xyz))
        slow = np.asarray(tf.sample_alpha_mask(vol, aabb, xyz) > 0)
        np.testing.assert_array_equal(fast, slow)

    def test_occupancy_superset_on_borders(self):
        """Out-of-range coords clamp; the dilated gate may only ADD samples
        (extra valid samples get their true density — never drops one)."""
        key = jax.random.PRNGKey(9)
        vol = (jax.random.uniform(key, (6, 6, 6)) < 0.4).astype(jnp.float32)
        aabb = jnp.asarray(AABB, jnp.float32)
        bufs = tf.prepare_alpha_buffers(
            {"alpha_volume": vol, "alpha_aabb": aabb})
        xyz = jax.random.uniform(jax.random.PRNGKey(10), (4096, 3),
                                 minval=-1.6, maxval=1.6)
        fast = np.asarray(tf.alpha_mask_valid(bufs, xyz))
        slow = np.asarray(tf.sample_alpha_mask(vol, aabb, xyz) > 0)
        assert not np.any(slow & ~fast)

    def test_forward_identical_with_and_without_dil(self):
        """A real forward renders identically through either mask path
        (continuous jittered sample coords never land on grid planes)."""
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (16, 16, 16))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (16, 16, 16))
        buffers, _ = tf.update_alpha_mask(cfg, geom, params, buffers,
                                          (16, 16, 16))
        assert buffers.get("alpha_volume_dil") is not None
        from myc_nerfs_tpu.data.synthetic import make_scene as _ms
        from myc_nerfs_tpu.train import tensorf_trainer as _tt
        scene = _ms(n_views=2, H=8, W=8)
        rays = _tt.build_ray_store(scene.poses, scene.intr, 8, 8)[:64]
        out_fast = tf.tensorf_forward(cfg, geom, params, buffers, rays,
                                      key=jax.random.PRNGKey(3))
        slow_bufs = dict(buffers)
        slow_bufs["alpha_volume_dil"] = None
        out_slow = tf.tensorf_forward(cfg, geom, params, slow_bufs, rays,
                                      key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(out_fast.rgb_map),
                                   np.asarray(out_slow.rgb_map), atol=1e-6)


class TestDensityBudget:
    """compact_density_samples: the static ray_valid compaction
    (tensorBase.py:497-504) must be composite-exact under a sufficient
    budget and degrade gracefully when truncating."""

    def _setup(self):
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (16, 16, 16))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (16, 16, 16))
        buffers, _ = tf.update_alpha_mask(cfg, geom, params, buffers,
                                          (16, 16, 16))
        scene = make_scene(n_views=2, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)[:64]
        return cfg, geom, params, buffers, rays

    def _sufficient_budget(self, cfg, geom, buffers, rays, key):
        # replicate the forward's gate to find the true max survivor count
        pts, _, valid = tf.sample_ray(buffers["aabb"], rays[:, :3],
                                      rays[:, 3:6], geom.step_size,
                                      geom.n_samples, cfg.near_far, key)
        occ = tf.alpha_mask_valid(buffers, pts)
        counts = np.asarray(jnp.logical_and(valid, occ).sum(-1))
        bud = int(counts.max())
        assert 0 < bud < geom.n_samples, "scene must gate some samples"
        return bud

    def test_exact_when_budget_sufficient(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        bud = self._sufficient_budget(cfg, geom, buffers, rays, key)
        out_full = tf.tensorf_forward(cfg, geom, params, buffers, rays, key=key)
        cfg_b = replace(cfg, density_sample_budget=bud)
        out_b = tf.tensorf_forward(cfg_b, geom, params, buffers, rays, key=key)
        assert out_b.weight.shape[-1] == bud
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_full.rgb_map), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b.depth_map),
                                   np.asarray(out_full.depth_map), atol=1e-4)

    def test_grads_match_when_budget_sufficient(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        bud = self._sufficient_budget(cfg, geom, buffers, rays, key)
        target = jnp.ones((rays.shape[0], 3)) * 0.5

        def loss(p, c):
            out = tf.tensorf_forward(c, geom, p, buffers, rays, key=key)
            return jnp.mean((out.rgb_map - target) ** 2)

        g_full = jax.grad(loss)(params, cfg)
        g_b = jax.grad(loss)(params, replace(cfg, density_sample_budget=bud))
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_truncation_stays_finite_and_bounded(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        cfg_t = replace(cfg, density_sample_budget=2)
        out = tf.tensorf_forward(cfg_t, geom, params, buffers, rays, key=key)
        assert bool(jnp.isfinite(out.rgb_map).all())
        assert float(out.rgb_map.min()) >= 0.0
        assert float(out.rgb_map.max()) <= 1.0

    def test_inactive_without_alpha_mask(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        no_mask = {k: v for k, v in buffers.items()
                   if not k.startswith("alpha_")}
        no_mask["alpha_volume"] = None
        key = jax.random.PRNGKey(3)
        cfg_b = replace(cfg, density_sample_budget=4)
        out = tf.tensorf_forward(cfg_b, geom, params, no_mask, rays, key=key)
        # budget must NOT activate pre-mask: full sample axis retained
        assert out.weight.shape[-1] == geom.n_samples

    def test_ref_and_nerfpp_exact(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        bud = self._sufficient_budget(cfg, geom, buffers, rays, key)
        rparams = ref_tensorf.init_ref_heads(jax.random.PRNGKey(1), cfg,
                                             dict(params))
        r_full = ref_tensorf.ref_tensorf_forward(cfg, geom, rparams, buffers,
                                                 rays, key=key)
        r_b = ref_tensorf.ref_tensorf_forward(
            replace(cfg, density_sample_budget=bud), geom, rparams, buffers,
            rays, key=key)
        np.testing.assert_allclose(np.asarray(r_b.rgb_map),
                                   np.asarray(r_full.rgb_map), atol=1e-5)
        # NeRF++ samples its own fg depths (uniform to sphere exit), so a
        # budget of S-1 may truncate at most the deepest gated sample —
        # assert the generous-budget output tracks the exact path closely.
        pp_cfg = nerfpp.NerfPPConfig(radii=6.0, bg_samples=16)
        pparams = dict(params)
        pparams["bg_net"] = nerfpp.init_nerfpp(jax.random.PRNGKey(2), pp_cfg)
        n_full = nerfpp.nerfpp_forward(cfg, pp_cfg, geom, pparams, buffers,
                                       rays, key=key)
        n_b = nerfpp.nerfpp_forward(
            replace(cfg, density_sample_budget=geom.n_samples - 1), pp_cfg,
            geom, pparams, buffers, rays, key=key)
        diff = float(jnp.abs(n_b.rgb_map - n_full.rgb_map).max())
        assert diff < 0.05  # tail truncation of at most one gated sample


@pytest.mark.slow
class TestTensoRFTrain:
    def test_staged_overfit(self):
        scene = make_scene(n_views=10, H=20, W=20)
        idx = jnp.array([i for i in range(10) if i != 5])
        rays = tt.build_ray_store(scene.poses[idx], scene.intr[idx], 20, 20)
        rgbs = scene.images[idx].reshape(-1, 3)
        cfg = tt.TensoRFTrainConfig(
            n_iters=500, batch_size=1024, n_voxel_init=16**3, n_voxel_final=32**3,
            upsamp_list=(200, 400), update_alphamask_list=(300,),
            l1_weight_initial=8e-5, l1_weight_rest=4e-5,
            alpha_mask_reso_cap=48, n_samples_cap=64)
        trainer = tt.TensoRFTrainer(small_cfg(), cfg, AABB, jax.random.PRNGKey(0))
        m = trainer.train(rays, rgbs)
        assert float(m["psnr"]) > 28.0, f"train psnr {float(m['psnr'])}"
        val_rays = tt.build_ray_store(scene.poses[5:6], scene.intr[5:6], 20, 20)
        rgb, _ = trainer.render_rays(val_rays, chunk=400)
        val = float(psnr(rgb.reshape(20, 20, 3), scene.images[5]))
        assert val > 14.0, f"val psnr {val}"


class TestNerfPP:
    def test_forward_shapes_and_gating(self):
        cfg = small_cfg()
        pp = nerfpp.NerfPPConfig(radii=6.0, bg_samples=32)
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8), n_samples_cap=16)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        params["bg_net"] = nerfpp.init_nerfpp(jax.random.PRNGKey(1), pp)
        rays = jnp.concatenate([jnp.zeros((7, 3)),
                                jax.random.normal(jax.random.PRNGKey(2), (7, 3))], -1)
        rays = rays.at[:, 3:].set(rays[:, 3:] / jnp.linalg.norm(rays[:, 3:], axis=-1, keepdims=True))
        out = nerfpp.nerfpp_forward(cfg, pp, geom, params, buffers, rays,
                                    key=jax.random.PRNGKey(3))
        assert out.rgb_map.shape == (7, 3)
        assert np.isfinite(np.asarray(out.rgb_map)).all()
        # untrained fg is near-transparent -> bg_lambda ~1 -> bg contributes
        assert float(out.bg_weight.min()) > 0.5

    def test_intersect_sphere(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        t = nerfpp.intersect_sphere(o, d, 4.0)  # radius 2 squared
        np.testing.assert_allclose(float(t[0]), 2.0, atol=1e-5)

    def test_depth2pts_outside_on_sphere(self):
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        # depth == radii -> point stays at sphere intersection with 1/r = radii
        pts, depth_real = nerfpp.depth2pts_outside(o, d, jnp.array([[3.0]]), 3.0)
        np.testing.assert_allclose(np.asarray(pts[0, 0, :3]), [0, 0, 3.0], atol=1e-4)

    def test_bg_gradients_flow(self):
        cfg = small_cfg()
        pp = nerfpp.NerfPPConfig(radii=6.0, bg_samples=16)
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8), n_samples_cap=8)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        params["bg_net"] = nerfpp.init_nerfpp(jax.random.PRNGKey(1), pp)
        rays = jnp.concatenate([jnp.zeros((4, 3)), jnp.tile(jnp.array([[0.0, 0, 1]]), (4, 1))], -1)

        def loss(p):
            out = nerfpp.nerfpp_forward(cfg, pp, geom, p, buffers, rays)
            return (out.rgb_map**2).sum()

        g = jax.grad(loss)(params)
        gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g["bg_net"]))
        assert gnorm > 0


class TestRefTensoRF:
    def test_forward_and_penalty(self):
        cfg = small_cfg(shading_mode="MLP_Fea")
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8), n_samples_cap=16)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        params = ref_tensorf.init_ref_heads(jax.random.PRNGKey(1), cfg, params)
        rays = jnp.concatenate([jnp.full((5, 3), -2.0),
                                jnp.tile(jnp.array([[0.577, 0.577, 0.577]]), (5, 1))], -1)
        out = ref_tensorf.ref_tensorf_forward(cfg, geom, params, buffers, rays)
        assert out.rgb_map.shape == (5, 3)
        assert np.isfinite(float(out.extras["penalty"]))
        # normals are unit where defined
        n = np.asarray(out.extras["normal"])
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)

    def test_sh_variant_runs(self):
        cfg = small_cfg(shading_mode="SH", view_pe=3)
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8), n_samples_cap=8)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB, (8, 8, 8))
        # SH shading_mode skips the MLP in init_tensorf; Ref variant needs one
        params = ref_tensorf.init_ref_heads(jax.random.PRNGKey(1), cfg, params)
        rays = jnp.concatenate([jnp.full((3, 3), -2.0),
                                jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))], -1)
        out = ref_tensorf.ref_tensorf_forward(cfg, geom, params, buffers, rays)
        assert np.isfinite(np.asarray(out.rgb_map)).all()

    def test_penalty_in_trainer(self):
        """Ref penalty plugs into the trainer via extra_loss_fn."""
        scene = make_scene(n_views=4, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)
        rgbs = scene.images.reshape(-1, 3)
        cfg_m = small_cfg()
        cfg_t = tt.TensoRFTrainConfig(n_iters=5, batch_size=64,
                                      n_voxel_init=8**3, n_voxel_final=8**3,
                                      upsamp_list=(), update_alphamask_list=(),
                                      n_samples_cap=8)
        trainer = tt.TensoRFTrainer(cfg_m, cfg_t, AABB, jax.random.PRNGKey(0))
        trainer.params = ref_tensorf.init_ref_heads(jax.random.PRNGKey(1), cfg_m,
                                                    trainer.params)
        mlp_apply = ref_tensorf.make_ref_mlp(cfg_m).apply

        # swap the step to use the ref forward
        import optax
        tx, lr_factor = tt.make_optimizer(cfg_t, trainer.params)
        opt_state = tx.init(trainer.params)

        @jax.jit
        def step(params, opt_state, r, c, key):
            def loss_fn(p):
                out = ref_tensorf.ref_tensorf_forward(cfg_m, trainer.geom, p,
                                                      trainer.buffers, r, key,
                                                      mlp_apply=mlp_apply)
                return jnp.mean((out.rgb_map - c) ** 2) + 0.5 * out.extras["penalty"]
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state2 = tx.update(g, opt_state, params)
            return optax.apply_updates(params, up), opt_state2, loss

        p, s, l0 = step(trainer.params, opt_state, rays[:64], rgbs[:64],
                        jax.random.PRNGKey(2))
        for _ in range(4):
            p, s, l = step(p, s, rays[:64], rgbs[:64], jax.random.PRNGKey(3))
        assert np.isfinite(float(l))


class TestDensityBatchBudget:
    """density_batch_budget: the cross-ray static compaction (the closest
    analog of the reference's flattened ray_valid indexing,
    tensorBase.py:497-504). Exact when total batch survivors fit; overflow
    drops deepest-RANK samples uniformly (sample-major packing), not whole
    thick rays."""

    def _setup(self):
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (16, 16, 16))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (16, 16, 16))
        buffers, _ = tf.update_alpha_mask(cfg, geom, params, buffers,
                                          (16, 16, 16))
        scene = make_scene(n_views=2, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)[:64]
        return cfg, geom, params, buffers, rays

    def _total_survivors(self, cfg, geom, buffers, rays, key):
        pts, _, valid = tf.sample_ray(buffers["aabb"], rays[:, :3],
                                      rays[:, 3:6], geom.step_size,
                                      geom.n_samples, cfg.near_far, key)
        occ = tf.alpha_mask_valid(buffers, pts)
        return int(np.asarray(jnp.logical_and(valid, occ).sum()))

    def test_exact_when_batch_budget_sufficient(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        tot = self._total_survivors(cfg, geom, buffers, rays, key)
        assert tot > 0
        out_full = tf.tensorf_forward(cfg, geom, params, buffers, rays,
                                      key=key)
        cfg_b = replace(cfg, density_batch_budget=tot + 8)
        out_b = tf.tensorf_forward(cfg_b, geom, params, buffers, rays,
                                   key=key)
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_full.rgb_map), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b.sigma),
                                   np.asarray(out_full.sigma), atol=1e-5)

    def test_grads_match_when_batch_budget_sufficient(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        tot = self._total_survivors(cfg, geom, buffers, rays, key)
        target = jnp.ones((rays.shape[0], 3)) * 0.5

        def loss(p, c):
            out = tf.tensorf_forward(c, geom, p, buffers, rays, key=key)
            return jnp.mean((out.rgb_map - target) ** 2)

        g_full = jax.grad(loss)(params, cfg)
        g_b = jax.grad(loss)(params, replace(cfg, density_batch_budget=tot + 8))
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)

    def test_overflow_drops_deep_ranks_uniformly(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        tot = self._total_survivors(cfg, geom, buffers, rays, key)
        half = max(1, tot // 2)
        cfg_b = replace(cfg, density_batch_budget=half)
        out = tf.tensorf_forward(cfg_b, geom, params, buffers, rays, key=key)
        assert bool(jnp.isfinite(out.rgb_map).all())
        # sample-major packing: every nonzero sigma must sit at a sample
        # rank <= the rank where the budget ran out on the FULL gate
        pts, _, valid = tf.sample_ray(buffers["aabb"], rays[:, :3],
                                      rays[:, 3:6], geom.step_size,
                                      geom.n_samples, cfg.near_far, key)
        occ = tf.alpha_mask_valid(buffers, pts)
        gate = np.asarray(jnp.logical_and(valid, occ))
        per_rank = gate.sum(0)          # survivors per sample rank
        cum = np.cumsum(per_rank)
        cutoff_rank = int(np.searchsorted(cum, half))
        sig = np.asarray(out.sigma)
        nz_ranks = np.nonzero((sig > 0).any(0))[0]
        assert nz_ranks.size == 0 or nz_ranks.max() <= cutoff_rank

    def test_inactive_without_alpha_mask(self):
        from dataclasses import replace
        cfg, geom, params, buffers, rays = self._setup()
        no_mask = {k: v for k, v in buffers.items()
                   if not k.startswith("alpha_")}
        no_mask["alpha_volume"] = None
        key = jax.random.PRNGKey(3)
        cfg_b = replace(cfg, density_batch_budget=4)
        out_b = tf.tensorf_forward(cfg_b, geom, params, no_mask, rays,
                                   key=key)
        out_f = tf.tensorf_forward(cfg, geom, params, no_mask, rays, key=key)
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_f.rgb_map), atol=1e-6)


class TestFactorGatherBf16:
    """factor_gather_bf16: bf16 factor-tensor gathers (half row bytes at
    the gather bandwidth wall, PERF_NOTES r5) with f32 master params —
    forward within bf16 rounding of the f32 path, grads land on the f32
    master leaves."""

    def _setup(self):
        from dataclasses import replace
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (16, 16, 16))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (16, 16, 16))
        scene = make_scene(n_views=2, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)[:64]
        return cfg, replace(cfg, factor_gather_bf16=True), geom, params, \
            buffers, rays

    def test_forward_close_to_f32(self):
        cfg, cfg_b, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        out_f = tf.tensorf_forward(cfg, geom, params, buffers, rays, key=key)
        out_b = tf.tensorf_forward(cfg_b, geom, params, buffers, rays, key=key)
        # bf16 has ~3 significant decimal digits; rgb is in [0, 1]
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_f.rgb_map), atol=2e-2)
        assert out_b.rgb_map.dtype == jnp.float32

    def test_grads_flow_to_f32_master(self):
        cfg, cfg_b, geom, params, buffers, rays = self._setup()
        key = jax.random.PRNGKey(3)
        target = jnp.ones((rays.shape[0], 3)) * 0.5

        def loss(p):
            out = tf.tensorf_forward(cfg_b, geom, p, buffers, rays, key=key)
            return jnp.mean((out.rgb_map - target) ** 2)

        g = jax.grad(loss)(params)
        gp = g["density_plane"][0]
        assert gp.dtype == params["density_plane"][0].dtype  # f32 master
        assert float(jnp.abs(gp).sum()) > 0


class TestBatchBudgetEvalPath:
    def test_inactive_at_eval_key_none(self):
        """density_batch_budget is TRAIN-only: eval renders (key=None,
        whole-image chunks of arbitrary ray count) must run the exact
        path — the budget is sized for the train batch and would truncate
        wholesale at other chunk shapes (caught as a -10 dB val collapse
        with healthy train PSNR on the Coffee trajectory gate)."""
        from dataclasses import replace
        cfg = small_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (16, 16, 16))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (16, 16, 16))
        buffers, _ = tf.update_alpha_mask(cfg, geom, params, buffers,
                                          (16, 16, 16))
        scene = make_scene(n_views=2, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)[:64]
        cfg_b = replace(cfg, density_batch_budget=4)  # absurdly small
        out_b = tf.tensorf_forward(cfg_b, geom, params, buffers, rays,
                                   key=None)
        out_f = tf.tensorf_forward(cfg, geom, params, buffers, rays,
                                   key=None)
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_f.rgb_map), atol=1e-6)
