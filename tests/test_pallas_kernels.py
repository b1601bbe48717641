"""Pallas kernel tests vs pure-XLA references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from myc_nerfs_tpu.ops.pallas.fused_mlp import fused_mlp, fused_mlp_reference


def make_net(widths, dtype=jnp.float32, seed=0):
    ws = tuple(
        jax.random.normal(jax.random.PRNGKey(seed + i),
                          (widths[i], widths[i + 1]), dtype) * 0.2
        for i in range(len(widths) - 1))
    return ws


class TestFusedMLP:
    def test_forward_matches_reference(self):
        ws = make_net([32, 64, 64, 16])
        x = jax.random.normal(jax.random.PRNGKey(9), (300, 32))
        with pltpu.force_tpu_interpret_mode():
            out = fused_mlp(x, ws, 128)
        ref = fused_mlp_reference(x, ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_row_padding(self):
        """Non-multiple-of-tile rows must render identically."""
        ws = make_net([16, 32, 8])
        x = jax.random.normal(jax.random.PRNGKey(1), (77, 16))
        with pltpu.force_tpu_interpret_mode():
            out = fused_mlp(x, ws, 64)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(fused_mlp_reference(x, ws)),
                                   atol=1e-5)

    def test_gradients_match_reference(self):
        ws = make_net([16, 32, 32, 8])
        x = jax.random.normal(jax.random.PRNGKey(2), (128, 16))

        def loss_fused(ws, x):
            return (fused_mlp(x, ws, 64) ** 2).sum()

        def loss_ref(ws, x):
            return (fused_mlp_reference(x, ws) ** 2).sum()

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused)(ws, x)
            gx_fused = jax.grad(loss_fused, argnums=1)(ws, x)
        g_ref = jax.grad(loss_ref)(ws, x)
        gx_ref = jax.grad(loss_ref, argnums=1)(ws, x)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-4)

    def test_relu_mask_correct(self):
        """Grad through a dead relu unit must be zero."""
        w0 = -jnp.eye(8)  # all pre-activations negative for positive x
        w1 = jnp.eye(8)
        x = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (16, 8))) + 0.1

        def loss(ws):
            return fused_mlp(x, ws, 16).sum()

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)((w0, w1))
        # d/dw1 = relu(x@w0)^T @ 1 = 0 since all activations are dead
        np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-6)


class TestFusedOriginNeRF:
    def test_fused_path_matches_flax(self):
        """use_fused backbone must match the stock flax forward exactly."""
        import jax
        from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel

        cfg = OriginNeRFConfig(D=3, W=32, skips=(), multires_pos=4,
                               multires_dir=2)
        ref = OriginNeRFModel(cfg)
        fused = OriginNeRFModel(OriginNeRFConfig(D=3, W=32, skips=(),
                                                 multires_pos=4, multires_dir=2,
                                                 use_fused=True))
        params = ref.init(jax.random.PRNGKey(0))
        pos = jax.random.uniform(jax.random.PRNGKey(1), (70, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(2), (70, 3))
        out_ref = ref.apply(params, pos, dirs)
        with pltpu.force_tpu_interpret_mode():
            out_fused = fused.apply(params, pos, dirs)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                                   atol=2e-4)

    def test_fused_gradients_flow(self):
        import jax
        from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel

        model = OriginNeRFModel(OriginNeRFConfig(D=2, W=16, skips=(),
                                                 multires_pos=2, multires_dir=2,
                                                 use_fused=True))
        params = model.init(jax.random.PRNGKey(0))
        pos = jax.random.uniform(jax.random.PRNGKey(1), (20, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(2), (20, 3))

        def loss(p):
            return (model.apply(p, pos, dirs) ** 2).sum()

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g))
        assert total > 0 and np.isfinite(total)


class TestOriginNeRFTiledApply:
    """The internal [32, m, 3] MLP batch split (PERF_NOTES §9c) must be
    numerically transparent for any sample count and leading shape."""

    def test_tiled_apply_matches_direct_net(self):
        from myc_nerfs_tpu.models.ori_nerf import (OriginNeRFConfig,
                                                   OriginNeRFModel)

        m = OriginNeRFModel(OriginNeRFConfig(D=2, W=32))
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (100, 3))
        d = jax.random.uniform(jax.random.PRNGKey(2), (100, 3))
        out = m.apply(p, x, d)                       # 100 % 32 != 0 -> pad
        raw = m.net.apply(p["mlp"], x, d * 2.0 - 1.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(raw),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.density_raw(p, x)),
            np.asarray(m.net.apply(p["mlp"], x, method=type(m.net).density)),
            atol=1e-6)
        out3 = m.apply(p, x.reshape(4, 25, 3), d.reshape(4, 25, 3))
        assert out3.shape == (4, 25, 4)
        np.testing.assert_allclose(np.asarray(out3.reshape(100, 4)),
                                   np.asarray(out), atol=1e-6)
