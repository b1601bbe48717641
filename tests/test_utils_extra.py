"""Tests: sRGB converters, profiling utils, fine-sampling trainer path."""
import jax
import jax.numpy as jnp
import numpy as np

from myc_nerfs_tpu.utils.color import linear_to_srgb, srgb_to_linear
from myc_nerfs_tpu.utils.profiling import Throughput, checkify_nan


class TestColor:
    def test_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 64)
        np.testing.assert_allclose(np.asarray(srgb_to_linear(linear_to_srgb(x))),
                                   np.asarray(x), atol=1e-5)

    def test_known_values(self):
        # linear 0.5 -> sRGB ~0.7354
        np.testing.assert_allclose(float(linear_to_srgb(jnp.float32(0.5))),
                                   0.7354, atol=1e-3)
        # below the linear segment breakpoint
        np.testing.assert_allclose(float(srgb_to_linear(jnp.float32(0.04))),
                                   0.04 / 12.92, atol=1e-6)


class TestProfiling:
    def test_throughput_meter(self):
        t = Throughput()
        x = jnp.ones((8,))
        t.start(x)
        t.add(100)
        rate = t.stop(x * 2)
        assert rate > 0

    def test_checkify_nan_raises(self):
        def bad(x):
            return jnp.log(x)  # NaN for negative input

        f = checkify_nan(jax.jit(bad))
        ok = f(jnp.asarray(2.0))
        assert np.isfinite(float(ok))
        try:
            f(jnp.asarray(-1.0))
            raised = False
        except Exception:
            raised = True
        assert raised


class TestFineSampling:
    def test_fine_trainer_path(self):
        from myc_nerfs_tpu.data.synthetic import make_scene
        from myc_nerfs_tpu.train import nerf_trainer as nt

        scene = make_scene(n_views=4, H=10, W=10)
        cfg = nt.NeRFTrainConfig(
            model="nerf", widths_feat=(16,) * 2, widths_rgb=(8, 3), skip=(),
            posenc_L3D=2, posenc_Lview=2, depth_range=scene.depth_range,
            sample_intvs=8, sample_intvs_fine=8, fine_sampling=True,
            rand_rays=128, max_iter=10, density_noise_reg=0.1)
        model, state = nt.init_state(cfg, jax.random.PRNGKey(0), 4)
        assert "fine" in state.params and "coarse" in state.params
        step = nt.make_train_step(cfg, model, scene.images, scene.poses,
                                  scene.intr)
        state, m = step(state, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        rgb, _ = nt.render_validation(cfg, model, state.params, scene.poses[0],
                                      scene.intr[0], 10, 10, chunk=100)
        assert np.isfinite(np.asarray(rgb)).all()
