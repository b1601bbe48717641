"""Tests for sampling, compositing, encodings, grid_sample, SH."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.ops import encoding, grid_sample, sh
from myc_nerfs_tpu.render import composite, sampling


class TestSampling:
    def test_stratified_in_range_and_ordered(self):
        key = jax.random.PRNGKey(0)
        d = sampling.sample_depth(key, (4, 16), 32, (2.0, 6.0))
        assert d.shape == (4, 16, 32, 1)
        assert float(d.min()) >= 2.0 and float(d.max()) <= 6.0
        assert np.all(np.diff(np.asarray(d)[..., 0], axis=-1) > 0)

    def test_deterministic_midpoints(self):
        d = sampling.sample_depth(None, (1, 1), 4, (0.0, 4.0), stratified=False)
        np.testing.assert_allclose(np.asarray(d)[0, 0, :, 0], [0.5, 1.5, 2.5, 3.5])

    def test_inverse_param(self):
        d = sampling.sample_depth(None, (1, 1), 4, (1.0, 5.0), stratified=False, param="inverse")
        np.testing.assert_allclose(np.asarray(d)[0, 0, :, 0], 1.0 / np.array([1.5, 2.5, 3.5, 4.5]), rtol=1e-5)

    def test_pdf_sampling_concentrates(self):
        # all mass in bin 5 of 8 -> fine samples all inside that bin's depth range
        pdf = jnp.zeros((1, 1, 8)).at[..., 5].set(1.0)
        d = sampling.sample_depth_from_pdf(pdf, 16, (0.0, 8.0))
        d = np.asarray(d)[0, 0, :, 0]
        assert d.min() >= 5.0 - 1e-4 and d.max() <= 6.0 + 1e-4

    def test_sample_pdf_bins(self):
        bins = jnp.linspace(0.0, 1.0, 9)[None]
        weights = jnp.zeros((1, 8)).at[0, 2].set(1.0)
        s = sampling.sample_pdf(bins, weights, 8)
        s = np.asarray(s)[0]
        assert s.min() >= 0.25 - 1e-4 and s.max() <= 0.375 + 1e-4


class TestComposite:
    def test_constant_density_analytic(self):
        # homogeneous medium: opacity = 1 - exp(-sigma * (far-near)) for unit-norm ray
        sigma = 0.7
        N = 256
        depth = jnp.linspace(0.0, 4.0, N)[None, None, :, None]
        density = jnp.full((1, 1, N), sigma)
        rgbs = jnp.ones((1, 1, N, 3)) * 0.5
        ray = jnp.array([[[0.0, 0.0, 1.0]]])
        rgb, d, opacity, prob = composite.composite_nerf(ray, rgbs, density, depth)
        # last interval is 1e10 -> full absorption; opacity ~ 1
        np.testing.assert_allclose(float(opacity[0, 0, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb[0, 0]), 0.5, atol=1e-4)

    def test_zero_density_hits_background(self):
        N = 8
        depth = jnp.linspace(1.0, 2.0, N)[None, None, :, None]
        density = jnp.zeros((1, 1, N))
        rgbs = jnp.ones((1, 1, N, 3))
        ray = jnp.array([[[0.0, 0.0, 1.0]]])
        bg = jnp.array([0.2, 0.4, 0.6])
        rgb, _, opacity, _ = composite.composite_nerf(ray, rgbs, density, depth, bg_color=bg)
        np.testing.assert_allclose(np.asarray(opacity), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb[0, 0]), np.asarray(bg), atol=1e-6)

    def test_raw2alpha_weights_sum(self):
        sigma = jnp.array([[1.0, 2.0, 0.5, 3.0]])
        dist = jnp.full((1, 4), 0.25)
        alpha, weights, bg_w = composite.raw2alpha(sigma, dist)
        np.testing.assert_allclose(np.asarray(weights.sum(-1) + bg_w[..., 0]), 1.0, atol=1e-5)

    def test_composite_weights_matches_raw2alpha(self):
        sigma = jnp.array([[0.3, 1.0, 2.0, 0.1]])
        dt = jnp.full((1, 4), 0.5)
        _, w_ref, bg_ref = composite.raw2alpha(sigma, dt)
        w, T_left = composite.composite_weights(sigma, dt, early_stop_eps=0.0)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(T_left), np.asarray(bg_ref), atol=1e-5)

    def test_composite_weights_invalid_masked(self):
        sigma = jnp.ones((1, 6))
        dt = jnp.ones((1, 6))
        valid = jnp.array([[True, True, False, True, False, True]])
        w, _ = composite.composite_weights(sigma, dt, valid=valid)
        assert np.all(np.asarray(w)[0, [2, 4]] == 0)

    def test_composite_rgb_background(self):
        rgbs = jnp.zeros((1, 4, 3))
        w = jnp.zeros((1, 4))
        out = composite.composite_rgb(rgbs, w, jnp.ones((1, 1)), jnp.array([1.0, 0.5, 0.25]))
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, 0.5, 0.25], atol=1e-6)


class TestEncoding:
    def test_pe_shape_and_values(self):
        x = jnp.array([[0.5, -0.25, 1.0]])
        enc = encoding.positional_encoding(x, L=4)
        assert enc.shape == (1, 3 * 2 * 4)
        # first element: sin(0.5 * pi * 2^0)
        np.testing.assert_allclose(float(enc[0, 0]), np.sin(0.5 * np.pi), atol=1e-6)

    def test_c2f_mask_limits(self):
        L = 6
        w0 = encoding.barf_c2f_weights(jnp.array(0.0), L, (0.0, 1.0))
        w1 = encoding.barf_c2f_weights(jnp.array(1.0), L, (0.0, 1.0))
        np.testing.assert_allclose(np.asarray(w0), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w1), 1.0, atol=1e-6)
        # mid-progress: low freqs on, high freqs off
        wm = np.asarray(encoding.barf_c2f_weights(jnp.array(0.5), L, (0.0, 1.0)))
        assert wm[0] == 1.0 and wm[-1] == 0.0

    def test_apply_mask_zero_progress_kills_pe(self):
        x = jnp.ones((2, 3))
        enc = encoding.positional_encoding(x, L=4)
        w = encoding.barf_c2f_weights(jnp.array(0.0), 4, (0.0, 1.0))
        out = encoding.apply_c2f_mask(enc, w, n_dims=3)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestGridSample:
    def test_matches_torch_2d(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        grid_np = rng.standard_normal((5, 7, 9)).astype(np.float32)  # C,H,W
        coords_np = rng.uniform(-1, 1, (64, 2)).astype(np.float32)
        ours = grid_sample.grid_sample_2d(jnp.asarray(grid_np), jnp.asarray(coords_np))
        theirs = F.grid_sample(
            torch.from_numpy(grid_np)[None],
            torch.from_numpy(coords_np)[None, None],
            mode="bilinear", align_corners=True,
        )[0, :, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_matches_torch_3d(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(1)
        grid_np = rng.standard_normal((4, 5, 6, 7)).astype(np.float32)  # C,D,H,W
        coords_np = rng.uniform(-1, 1, (32, 3)).astype(np.float32)
        ours = grid_sample.grid_sample_3d(jnp.asarray(grid_np), jnp.asarray(coords_np))
        theirs = F.grid_sample(
            torch.from_numpy(grid_np)[None],
            torch.from_numpy(coords_np)[None, None, None],
            mode="bilinear", align_corners=True,
        )[0, :, 0, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_out_of_range_clamps(self):
        grid_np = jnp.arange(12.0).reshape(1, 3, 4)
        v = grid_sample.grid_sample_2d(grid_np, jnp.array([[5.0, 5.0]]))
        np.testing.assert_allclose(float(v[0, 0]), 11.0)


class TestSH:
    def test_dc_term(self):
        b = sh.eval_sh_bases(0, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(float(b[0, 0]), 0.28209479, atol=1e-6)

    def test_addition_theorem(self):
        # sum_m Y_lm^2 = (2l+1)/(4pi) for any unit dir
        rng = np.random.default_rng(2)
        d = rng.standard_normal((100, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        b = np.asarray(sh.eval_sh_bases(4, jnp.asarray(d, dtype=jnp.float32)))
        offsets = [0, 1, 4, 9, 16, 25]
        for l in range(5):
            s = (b[:, offsets[l]:offsets[l + 1]] ** 2).sum(-1)
            np.testing.assert_allclose(s, (2 * l + 1) / (4 * np.pi), atol=1e-4)

    def test_sh_encode_padding(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        e = sh.sh_encode(d, degree=4, pad_to=16)
        assert e.shape == (1, 16)

    def test_eval_sh_contraction(self):
        rng = np.random.default_rng(3)
        coeffs = jnp.asarray(rng.standard_normal((10, 3, 9)), jnp.float32)
        d = rng.standard_normal((10, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)
        out = sh.eval_sh(2, coeffs, d)
        ref = (np.asarray(coeffs) * np.asarray(sh.eval_sh_bases(2, d))[:, None, :]).sum(-1)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestMLPTiling:
    """Round-4 ray re-tiling (PERF_NOTES §9): the [B, R] split is internal;
    outputs must be exactly the un-tiled math."""

    def test_tile_dims_non_pow2(self):
        from myc_nerfs_tpu.render.mlp_renderer import _mlp_tile_dims

        for n in [1, 7, 128, 2040, 2048, 2052, 65536]:
            g1, g2, pad = _mlp_tile_dims(n)
            assert g1 * g2 == n + pad and pad >= 0
            assert g1 & (g1 - 1) != 0     # 12
            assert g2 & (g2 - 1) != 0 or g2 == 0

    def test_tile_untile_roundtrip(self):
        from myc_nerfs_tpu.render.mlp_renderer import (_mlp_tile_dims,
                                                       _tile_rays,
                                                       _untile_rays)

        x = jnp.arange(8 * 16 * 3, dtype=jnp.float32).reshape(8, 16, 3)
        g1, g2, pad = _mlp_tile_dims(8 * 16)
        t = _tile_rays(x, g1, g2, pad)
        assert t.shape == (g1, g2, 3)
        np.testing.assert_array_equal(np.asarray(_untile_rays(t, 8, 16)),
                                      np.asarray(x))

    def test_render_rays_tiled_matches_untiled(self):
        from myc_nerfs_tpu.render.mlp_renderer import render_rays_mlp

        def apply_fn(points, ray_unit):
            rgb = jnp.tanh(points * 3.0)
            sigma = jnp.abs(points.sum(-1))
            return rgb, sigma

        key = jax.random.PRNGKey(0)
        center = jax.random.uniform(key, (4, 8, 3))
        ray = jax.random.normal(jax.random.fold_in(key, 1), (4, 8, 3))
        a = render_rays_mlp(apply_fn, center, ray, None, 16, (1.0, 3.0),
                            stratified=False, tile=True)
        b = render_rays_mlp(apply_fn, center, ray, None, 16, (1.0, 3.0),
                            stratified=False, tile=False)
        np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   atol=1e-6)
