"""End-to-end integration: overfit vanilla NeRF on a synthetic scene.

Mirrors the reference's metric-in-the-loop validation strategy
(SURVEY.md §4): train PSNR must rise far above random-init (~6 dB) and a
held-out orbit view must render above 19 dB.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.models.nerf_mlp import NeRFMLP, garf_mlp
from myc_nerfs_tpu.train import nerf_trainer as nt
from myc_nerfs_tpu.utils.metrics import psnr


class TestNeRFMLPUnit:
    def test_shapes_and_finite(self):
        model = NeRFMLP(widths_feat=(32, 32), widths_rgb=(16, 3), skip=(1,),
                        posenc_L3D=4, posenc_Lview=2)
        pts = jnp.zeros((2, 5, 7, 3))
        dirs = jnp.zeros((2, 5, 7, 3))
        params = model.init(jax.random.PRNGKey(0), pts, dirs)
        rgb, sigma = model.apply(params, pts, dirs)
        assert rgb.shape == (2, 5, 7, 3) and sigma.shape == (2, 5, 7)
        assert np.isfinite(np.asarray(rgb)).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()

    def test_garf_preset_no_posenc(self):
        model = garf_mlp(widths_feat=(16,) * 3, widths_rgb=(8, 3), skip=(1,))
        pts = jnp.ones((4, 3))
        dirs = jnp.ones((4, 3))
        params = model.init(jax.random.PRNGKey(0), pts, dirs)
        # input layer must consume raw 3-dim points (no PE)
        kernel = jax.tree_util.tree_leaves(params)[0]
        rgb, sigma = model.apply(params, pts, dirs)
        assert rgb.shape == (4, 3)

    def test_c2f_progress_changes_output(self):
        model = NeRFMLP(widths_feat=(16, 16), widths_rgb=(8, 3), skip=(),
                        posenc_L3D=4, posenc_Lview=2)
        pts = jnp.ones((4, 3)) * 0.3
        dirs = jnp.ones((4, 3)) * 0.5
        params = model.init(jax.random.PRNGKey(0), pts, dirs)
        r0, _ = model.apply(params, pts, dirs, progress=jnp.float32(0.0), c2f=(0.1, 0.5))
        r1, _ = model.apply(params, pts, dirs, progress=jnp.float32(1.0), c2f=(0.1, 0.5))
        assert not np.allclose(np.asarray(r0), np.asarray(r1))


@pytest.mark.slow
class TestNeRFOverfit:
    def test_overfit_synthetic(self):
        scene = make_scene(n_views=10, H=20, W=20)
        idx = jnp.array([i for i in range(10) if i != 5])
        cfg = nt.NeRFTrainConfig(
            model="nerf", widths_feat=(48,) * 4, widths_rgb=(32, 3), skip=(2,),
            posenc_L3D=6, posenc_Lview=2, depth_range=scene.depth_range,
            sample_intvs=32, rand_rays=1152, lr=5e-3, lr_end=1e-3, max_iter=300,
            setbg_opaque=True, bgcolor=1.0)
        model, state = nt.init_state(cfg, jax.random.PRNGKey(0), 9)
        step = nt.make_train_step(cfg, model, scene.images[idx], scene.poses[idx],
                                  scene.intr[idx])
        key = jax.random.PRNGKey(1)
        for _ in range(300):
            key, k = jax.random.split(key)
            state, m = step(state, k)
        assert float(m["psnr"]) > 24.0, f"train psnr {float(m['psnr'])}"
        rgb, depth = nt.render_validation(cfg, model, state.params, scene.poses[5],
                                          scene.intr[5], 20, 20, chunk=400)
        val = float(psnr(rgb, scene.images[5]))
        assert val > 19.0, f"val psnr {val}"
        assert depth.shape == (20, 20)
