"""Tests: native mesh extraction, camera paths, planar warps, OriginNeRF, vis."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.evaluation import mesh, visualization
from myc_nerfs_tpu.geom import camera_path, warp2d
from myc_nerfs_tpu.models.ori_nerf import OriginNeRFConfig, OriginNeRFModel
from myc_nerfs_tpu.ops.native import (marching_tets, marching_tets_numpy,
                                      native_available)


class TestMarchingTets:
    def _sphere(self, n=16, r=0.5):
        x = np.linspace(-1, 1, n)
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        return (r - np.sqrt(X**2 + Y**2 + Z**2)).astype(np.float32)

    def test_native_matches_numpy(self):
        if not native_available():
            pytest.skip("no compiler")
        grid = self._sphere()
        v1, t1 = marching_tets(grid, 0.0)
        v2, t2 = marching_tets_numpy(grid, 0.0)
        assert v1.shape == v2.shape and t1.shape == t2.shape
        np.testing.assert_allclose(np.sort(v1.ravel()), np.sort(v2.ravel()),
                                   atol=1e-4)

    def test_sphere_radius(self):
        n = 24
        grid = self._sphere(n, 0.6)
        v, t = marching_tets(grid, 0.0)
        w = v / (n - 1) * 2 - 1
        r = np.linalg.norm(w, axis=1)
        assert abs(r.mean() - 0.6) < 0.01 and r.std() < 0.01
        # all triangle indices valid
        assert t.min() >= 0 and t.max() < len(v)

    def test_empty_grid(self):
        v, t = marching_tets(np.zeros((4, 4, 4), np.float32), 0.5)
        assert len(v) == 0 and len(t) == 0

    def test_extract_and_save(self, tmp_path):
        def density_fn(pts):
            return 30.0 * jnp.exp(-((pts**2).sum(-1)) / 0.1)

        verts, tris = mesh.extract_mesh(density_fn, res=16, vrange=(-1.0, 1.0),
                                        thresh=15.0, chunk=512)
        assert len(verts) > 0
        obj = str(tmp_path / "m.obj")
        ply = str(tmp_path / "m.ply")
        mesh.save_obj(obj, verts, tris)
        mesh.save_ply(ply, verts, tris)
        assert os.path.getsize(obj) > 0
        head = open(ply).read(200)
        assert head.startswith("ply") and f"element vertex {len(verts)}" in head

    def test_convert_density_to_ply(self, tmp_path):
        grid = self._sphere(12, 0.5)
        path = str(tmp_path / "d.ply")
        mesh.convert_density_samples_to_ply(grid, path,
                                            np.array([[-1, -1, -1], [1, 1, 1.0]]),
                                            level=0.0)
        assert os.path.getsize(path) > 0


class TestCameraPath:
    def test_spherical_radius_and_count(self):
        poses = camera_path.path_spherical(8)
        assert len(poses) == 8
        for p in poses:
            center = p[:, 3]
            np.testing.assert_allclose(np.linalg.norm(center), 4.0, rtol=1e-5)

    def test_looks_at_origin(self):
        p = camera_path.pose_spherical(30.0, -30.0, 4.0)
        fwd = -p[:, 2]  # NeRF convention: -z forward
        to_origin = -p[:, 3] / np.linalg.norm(p[:, 3])
        np.testing.assert_allclose(fwd / np.linalg.norm(fwd), to_origin, atol=1e-5)


class TestWarp2D:
    def test_so2_roundtrip(self):
        theta = jnp.asarray([[0.3], [-0.7]])
        R = warp2d.so2_to_SO2(theta)
        np.testing.assert_allclose(np.asarray(warp2d.SO2_to_so2(R)),
                                   np.asarray(theta), atol=1e-6)

    def test_se2_roundtrip(self):
        delta = jnp.asarray([[0.1, -0.2, 0.4], [0.5, 0.3, -0.9]])
        Rt = warp2d.se2_to_SE2(delta)
        np.testing.assert_allclose(np.asarray(warp2d.SE2_to_se2(Rt)),
                                   np.asarray(delta), atol=1e-5)

    def test_sl3_identity(self):
        H = warp2d.sl3_to_SL3(jnp.zeros((1, 8)))
        np.testing.assert_allclose(np.asarray(H[0]), np.eye(3), atol=1e-6)
        # unit determinant (SL(3))
        H2 = warp2d.sl3_to_SL3(jnp.asarray([[0.1, -0.05, 0.2, 0.1, 0.05, -0.1, 0.02, 0.03]]))
        np.testing.assert_allclose(float(jnp.linalg.det(H2[0])), 1.0, rtol=1e-5)

    def test_warp_grid_types(self):
        grid = warp2d.normalized_pixel_grid(4, 6, batch=2)
        assert grid.shape == (2, 24, 2)
        out_t = warp2d.warp_grid(grid, jnp.ones((2, 2)) * 0.1, "translation")
        np.testing.assert_allclose(np.asarray(out_t - grid), 0.1, atol=1e-6)
        out_r = warp2d.warp_grid(grid, jnp.zeros((2, 1)), "rotation")
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(grid), atol=1e-6)
        out_h = warp2d.warp_grid(grid, jnp.zeros((2, 8)), "homography")
        np.testing.assert_allclose(np.asarray(out_h), np.asarray(grid), atol=1e-5)

    def test_corners_in_range(self):
        ok = warp2d.check_corners_in_range(16, 16, 8, 8, jnp.zeros((1, 2)),
                                           "translation")
        assert bool(ok)
        bad = warp2d.check_corners_in_range(16, 16, 8, 8, jnp.ones((1, 2)) * 10,
                                            "translation")
        assert not bool(bad)


class TestOriginNeRF:
    def test_apply_contract(self):
        model = OriginNeRFModel(OriginNeRFConfig(D=3, W=32, skips=(1,),
                                                 multires_pos=4, multires_dir=2))
        params = model.init(jax.random.PRNGKey(0))
        pos = jax.random.uniform(jax.random.PRNGKey(1), (9, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(2), (9, 3))
        out = model.apply(params, pos, dirs)
        assert out.shape == (9, 4)
        d = model.density_raw(params, pos)
        assert d.shape == (9, 1)
        np.testing.assert_allclose(np.asarray(out[:, 3:]), np.asarray(d), atol=1e-5)

    def test_works_with_ngp_renderer(self):
        from myc_nerfs_tpu.render import occupancy as occ
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, render_rays_ngp

        model = OriginNeRFModel(OriginNeRFConfig(D=2, W=32, skips=(),
                                                 multires_pos=2, multires_dir=2))
        params = model.init(jax.random.PRNGKey(0))
        occ_cfg = occ.OccupancyConfig(grid_size=16, n_cascades=2, max_cascade=0)
        state = occ.init_occupancy(occ_cfg)._replace(
            bitfield=jnp.ones((2, 16, 16, 16), bool))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=16, n_samples=8)
        out = render_rays_ngp(occ_cfg, rcfg, model.apply, params, state,
                              jnp.array([[0.5, 0.5, -1.0]]),
                              jnp.array([[0.0, 0.0, 1.0]]), jnp.ones(3))
        assert np.isfinite(np.asarray(out.rgb)).all()


class TestVisualization:
    def test_depth_colormap(self):
        depth = np.linspace(1, 5, 64).reshape(8, 8)
        img, (mi, ma) = visualization.visualize_depth(depth)
        assert img.shape == (8, 8, 3) and mi == 1.0 and ma == 5.0

    def test_tiling(self):
        imgs = np.random.rand(5, 4, 4, 3).astype(np.float32)
        tiled = visualization.tile_images(imgs, cols=3)
        assert tiled.shape == (8, 12, 3)
        np.testing.assert_allclose(tiled[:4, :4], imgs[0])

    def test_pose_plot(self, tmp_path):
        from myc_nerfs_tpu.data.synthetic import orbit_poses

        poses = np.asarray(orbit_poses(6))
        path = visualization.plot_poses(poses, poses, str(tmp_path / "p.png"))
        assert os.path.getsize(path) > 0

    def test_write_video_or_frames(self, tmp_path):
        frames = [np.random.rand(16, 16, 3).astype(np.float32) for _ in range(4)]
        out = visualization.write_video(str(tmp_path / "v.mp4"), frames, fps=4)
        # either a video or the PNG-frames fallback must exist
        if out is None:
            assert os.path.exists(str(tmp_path / "v" / "0000.png"))
        else:
            assert os.path.getsize(out) > 0


class TestLogging:
    def test_metric_writer(self, tmp_path):
        from myc_nerfs_tpu.utils.logging import ETATimer, MetricWriter, log

        w = MetricWriter(str(tmp_path))
        w.scalar("train/psnr", 30.0, 1)
        w.scalar("train/psnr", 31.0, 2)
        lines = open(tmp_path / "train_psnr.txt").read().strip().split("\n")
        assert len(lines) == 2 and lines[1] == "2 31.0"
        w.quant_line("quant.txt", 0, 31.5)
        assert "31.5" in open(tmp_path / "quant.txt").read()
        t = ETATimer()
        eta = t.update(1, 100)
        assert eta >= 0
        log.info("hello")  # smoke


class TestNativeRayStore:
    def test_matches_jnp_path(self):
        """csrc/ray_store.cpp vs geom.rays — identical rays (the native
        builder is the data-loader hot path, dataLoader/blender.py:63-129)."""
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from myc_nerfs_tpu.geom import rays as rays_lib
        from myc_nerfs_tpu.ops import native

        rng = np.random.default_rng(0)
        c2ws = []
        for _ in range(3):
            q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
            c2ws.append(np.concatenate([q, rng.normal(size=(3, 1))], 1))
        c2w = np.stack(c2ws).astype(np.float32)
        out = native.build_ray_store_native(c2w, 8, 10, 9.0, 9.0)
        if out is None:
            pytest.skip("native lib unavailable")
        dirs = rays_lib.get_ray_directions(8, 10, 9.0)
        ref = []
        for i in range(3):
            o, d = rays_lib.get_rays_from_directions(dirs, jnp.asarray(c2w[i]))
            ref.append(np.concatenate([np.asarray(o), np.asarray(d)], -1))
        np.testing.assert_allclose(out, np.concatenate(ref), atol=1e-5)


class TestOriginNeRFRemat:
    def test_remat_grads_match(self):
        """jax.checkpoint on the flagship backbone (OriginNeRFConfig.remat)
        must not change values or gradients — only memory behavior."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from myc_nerfs_tpu.models.ori_nerf import (OriginNeRFConfig,
                                                   OriginNeRFModel)

        m0 = OriginNeRFModel(OriginNeRFConfig(D=2, W=32, skips=()))
        m1 = OriginNeRFModel(OriginNeRFConfig(D=2, W=32, skips=(), remat=True))
        params = m0.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        d = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

        def loss(m):
            return lambda p: (m.apply(p, x, d) ** 2).sum()

        np.testing.assert_allclose(np.asarray(m0.apply(params, x, d)),
                                   np.asarray(m1.apply(params, x, d)),
                                   atol=1e-6)
        g0 = jax.grad(loss(m0))(params)
        g1 = jax.grad(loss(m1))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
