"""TensorVM (non-split) decomposition + NDC sampling tests."""
import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.models import tensorf as tf

AABB = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]])


def vm_cfg():
    return tf.TensoRFConfig(decomp="vm", density_n_comp=(4,), app_n_comp=(8,),
                            app_dim=12, featureC=32, near_far=(1.5, 4.5),
                            density_shift=-5.0)


class TestTensorVM:
    def test_init_and_features(self):
        cfg = vm_cfg()
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (9, 9, 9))
        assert params["vm_plane"][0].shape == (12, 9, 9)  # D+A
        assert params["vm_line"][0].shape == (12, 9)
        assert params["basis_mat"].shape == (24, 12)  # 3*A -> app_dim
        xyz = jax.random.uniform(jax.random.PRNGKey(1), (11, 3), minval=-1,
                                 maxval=1)
        f = tf.compute_density_feature(cfg, params, xyz)
        a = tf.compute_app_feature(cfg, params, xyz)
        assert f.shape == (11,) and a.shape == (11, 12)

    def test_forward_and_regs(self):
        cfg = vm_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (9, 9, 9), n_samples_cap=16)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (9, 9, 9))
        rays = jnp.concatenate([jnp.full((5, 3), -2.0),
                                jnp.tile(jnp.array([[0.577, 0.577, 0.577]]),
                                         (5, 1))], -1)
        out = tf.tensorf_forward(cfg, geom, params, buffers, rays)
        assert np.isfinite(np.asarray(out.rgb_map)).all()
        for v in (tf.vector_comp_diffs(params), tf.density_L1(cfg, params),
                  tf.tv_loss_density(cfg, params), tf.tv_loss_app(cfg, params)):
            assert np.isfinite(float(v))

    def test_upsample_and_shrink(self):
        cfg = vm_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8))
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (8, 8, 8))
        up = tf.upsample_volume_grid(cfg, params, (12, 12, 12))
        assert up["vm_plane"][0].shape == (12, 12, 12)
        p2, b2, new_size = tf.shrink(cfg, geom, params, buffers,
                                     np.array([[-0.8] * 3, [0.8] * 3]))
        assert p2["vm_plane"][0].shape[1] == new_size[tf.MAT_MODE[0][1]]


class TestNDC:
    def test_ndc_sampling_uniform_near_far(self):
        aabb = jnp.asarray(AABB)
        o = jnp.zeros((3, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
        pts, z, valid = tf.sample_ray_ndc(aabb, o, d, 8, (0.0, 1.0), None)
        np.testing.assert_allclose(np.asarray(z[0]), np.linspace(0, 1, 8),
                                   atol=1e-6)

    def test_ndc_forward(self):
        cfg = vm_cfg()
        geom = tf.compute_stage_geom(cfg, AABB, (8, 8, 8), n_samples_cap=8)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, AABB,
                                          (8, 8, 8))
        rays = jnp.concatenate([jnp.zeros((4, 3)),
                                jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (4, 1))],
                               -1)  # unnormalised dirs: NDC branch normalises
        out = tf.tensorf_forward(cfg, geom, params, buffers, rays,
                                 ndc_ray=True)
        assert np.isfinite(np.asarray(out.rgb_map)).all()


class TestAppSampleBudget:
    """The static app_sample_budget compaction must equal the exact
    full-sample path whenever per-ray survivors fit the budget (all three
    forwards), and stays OFF without an alpha mask."""

    def _setup(self, budget):
        import dataclasses

        import jax
        import jax.numpy as jnp
        import numpy as np

        from myc_nerfs_tpu.models import tensorf as tf

        cfg = tf.TensoRFConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4),
                               app_dim=9, featureC=16, fea_pe=2, view_pe=2,
                               app_sample_budget=budget)
        aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
        geom = tf.compute_stage_geom(cfg, aabb, (16, 16, 16),
                                     n_samples_cap=24)
        params, buffers = tf.init_tensorf(jax.random.PRNGKey(0), cfg, aabb,
                                          (16, 16, 16))
        # give the density planes real structure so app_mask is sparse
        params["density_plane"] = tuple(p * 5.0
                                        for p in params["density_plane"])
        # an all-pass alpha volume: enables the budget without changing
        # validity
        buffers = dict(buffers)
        buffers["alpha_volume"] = jnp.ones((8, 8, 8))
        buffers["alpha_aabb"] = jnp.asarray(aabb)
        rng = np.random.default_rng(3)
        o = jnp.asarray(rng.uniform(-2.2, -1.8, (6, 3)), jnp.float32)
        d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        rays = jnp.concatenate([o, d], -1)
        return cfg, geom, params, buffers, rays

    def test_tensorf_budget_matches_exact(self):
        import dataclasses

        import numpy as np

        from myc_nerfs_tpu.models import tensorf as tf

        cfg_b, geom, params, buffers, rays = self._setup(budget=16)
        cfg_e = dataclasses.replace(cfg_b, app_sample_budget=0)
        out_b = tf.tensorf_forward(cfg_b, geom, params, buffers, rays)
        out_e = tf.tensorf_forward(cfg_e, geom, params, buffers, rays)
        # survivors fit the 16-slot budget on every ray?
        surv = np.asarray(out_e.extras["app_mask"]).sum(-1)
        assert (surv <= 16).all(), f"test scene too dense: {surv}"
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_e.rgb_map), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_b.depth_map),
                                   np.asarray(out_e.depth_map), atol=1e-5)

    def test_ref_tensorf_budget_matches_exact(self):
        import dataclasses

        import jax
        import numpy as np

        from myc_nerfs_tpu.models import ref_tensorf as rt
        from myc_nerfs_tpu.models import tensorf as tf

        cfg_b, geom, params, buffers, rays = self._setup(budget=16)
        params = rt.init_ref_heads(jax.random.PRNGKey(1), cfg_b, params)
        cfg_e = dataclasses.replace(cfg_b, app_sample_budget=0)
        out_b = rt.ref_tensorf_forward(cfg_b, geom, params, buffers, rays)
        out_e = rt.ref_tensorf_forward(cfg_e, geom, params, buffers, rays)
        np.testing.assert_allclose(np.asarray(out_b.rgb_map),
                                   np.asarray(out_e.rgb_map), atol=1e-5)
        np.testing.assert_allclose(float(out_b.extras["penalty"]),
                                   float(out_e.extras["penalty"]), atol=1e-5)

    def test_budget_off_without_alpha_mask(self):
        import numpy as np

        from myc_nerfs_tpu.models import tensorf as tf

        cfg, geom, params, buffers, rays = self._setup(budget=4)
        buffers = dict(buffers)
        buffers["alpha_volume"] = None
        out = tf.tensorf_forward(cfg, geom, params, buffers, rays)
        # with no alpha mask the exact path runs: rgb at every app_mask
        # sample contributes — a 4-slot budget would drop most of them
        assert "app_valid" not in out.extras
