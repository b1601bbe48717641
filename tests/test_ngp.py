"""Instant-NGP stack tests: hash grid, occupancy, marcher, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.data.synthetic import make_scene
from myc_nerfs_tpu.geom import rays as rays_lib
from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.render import occupancy as occ
from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, march_rays, ray_aabb_range
from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig, NGPTrainer,
                                             huber_loss, make_lr_schedule)
from myc_nerfs_tpu.utils.metrics import psnr


class TestHashGrid:
    def test_level_geometry_matches_reference_math(self):
        """Level scales/offsets reproduce grid_encode.py:18-46 exactly."""
        cfg = ngp.HashGridConfig(aabb_scale=1)
        lv = ngp.compute_levels(cfg)
        # base level: scale = 16 - 1 = 15, res = 16, params = round8(4096)
        assert lv.resolutions[0] == 16
        assert lv.hashmap_sizes[0] == 4096
        assert lv.offsets[0] == 0
        # top level: res ~ 2048, capped at 2^19
        assert lv.resolutions[-1] >= 2048
        assert lv.hashmap_sizes[-1] == 1 << 19
        assert not lv.dense[-1] and lv.dense[0]

    def test_dense_level_interpolates_exactly(self):
        """On a dense level, encode must equal trilinear interpolation."""
        cfg = ngp.HashGridConfig(n_levels=1, base_resolution=4,
                                 desired_resolution=4.0, n_features=1)
        levels = ngp.compute_levels(cfg)
        assert levels.dense[0] and levels.resolutions[0] == 4
        # table value = x-index so interp of position is linear in x
        res = 4
        vals = np.zeros((levels.n_params, 1), np.float32)
        for x in range(res):
            for y in range(res):
                for z in range(res):
                    vals[x + y * res + z * res * res] = x
        table = jnp.asarray(vals)
        # scale = 3; pos*3 + 0.5 -> at pos p, continuous x-index = 3p + 0.5
        pos = jnp.array([[0.5, 0.2, 0.7], [0.0, 0.0, 0.0], [0.3, 0.9, 0.1]])
        out = ngp.hash_encode(table, pos, cfg, levels)
        np.testing.assert_allclose(np.asarray(out[:, 0]),
                                   np.asarray(pos[:, 0]) * 3.0 + 0.5, atol=1e-5)

    def test_gradients_scatter_to_table(self):
        cfg = ngp.HashGridConfig(n_levels=4, desired_resolution=128.0)
        levels = ngp.compute_levels(cfg)
        table = ngp.init_hash_table(jax.random.PRNGKey(0), cfg, levels)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

        g = jax.grad(lambda t: ngp.hash_encode(t, pos, cfg, levels).sum())(table)
        assert float(jnp.abs(g).sum()) > 0
        # only gathered rows receive gradient
        touched = (jnp.abs(g).sum(-1) > 0).sum()
        assert int(touched) <= 16 * 8 * 4

    def test_encode_shape_and_jit(self):
        cfg = ngp.HashGridConfig()
        levels = ngp.compute_levels(cfg)
        table = ngp.init_hash_table(jax.random.PRNGKey(0), cfg, levels)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (7, 3))
        out = jax.jit(lambda t, p: ngp.hash_encode(t, p, cfg, levels))(table, pos)
        assert out.shape == (7, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_model_apply(self):
        model = ngp.NGPModel(ngp.NGPModelConfig(
            grid=ngp.HashGridConfig(n_levels=4, desired_resolution=64.0)))
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.full((5, 3), 0.5), jnp.full((5, 3), 0.5))
        assert out.shape == (5, 4)
        d = model.density_raw(params, jnp.full((5, 3), 0.5))
        assert d.shape == (5, 1)


class TestOccupancy:
    def cfg(self, G=32, C=3):
        return occ.OccupancyConfig(grid_size=G, n_cascades=C, max_cascade=1)

    def test_bitfield_threshold_and_mean(self):
        cfg = self.cfg()
        grid = jnp.zeros((3, 32, 32, 32)).at[0, 1, 2, 3].set(5.0)
        bits, mean = occ.update_bitfield(cfg, grid)
        assert bool(bits[0, 1, 2, 3])
        assert int(bits[0].sum()) == 1
        np.testing.assert_allclose(float(mean), 5.0 / 32**3, rtol=1e-5)

    def test_maxpool_propagates_to_next_cascade_center(self):
        cfg = self.cfg()
        # occupied cell at level 0 position (16,16,16) -> next level sees it
        # at centre octant offset: 16//2 + 8 = 16
        grid = jnp.zeros((3, 32, 32, 32)).at[0, 16, 16, 16].set(5.0)
        bits, _ = occ.update_bitfield(cfg, grid)
        assert bool(bits[1, 16, 16, 16])

    def test_ema_keeps_untrained(self):
        cfg = self.cfg()
        grid = jnp.full((3, 32, 32, 32), -1.0)
        tmp = jnp.ones_like(grid) * 9.0
        out = occ.ema_update(cfg, grid, tmp)
        np.testing.assert_allclose(np.asarray(out), -1.0)

    def test_ema_max_decay(self):
        cfg = self.cfg()
        grid = jnp.full((3, 4, 4, 4), 2.0)
        g2 = occ.ema_update(occ.OccupancyConfig(grid_size=4, n_cascades=3),
                            grid, jnp.zeros_like(grid))
        np.testing.assert_allclose(np.asarray(g2), 2.0 * 0.95)

    def test_occupied_at_lookup(self):
        cfg = self.cfg()
        bits = jnp.zeros((3, 32, 32, 32), bool).at[0, 16, 16, 16].set(True)
        pos = jnp.array([[0.515, 0.515, 0.515]])  # cell 16 at G=32
        mip = jnp.array([0])
        assert bool(occ.occupied_at(cfg, bits, pos, mip)[0])
        assert not bool(occ.occupied_at(cfg, bits, jnp.array([[0.1, 0.1, 0.1]]), mip)[0])

    def test_mip_from_pos(self):
        cfg = occ.OccupancyConfig()
        mips = occ.mip_from_pos(cfg, jnp.array(
            [[0.5, 0.5, 0.5], [0.8, 0.5, 0.5], [1.4, 0.5, 0.5], [2.4, 0.5, 0.5]]))
        assert list(np.asarray(mips)) == [0, 0, 1, 2]

    def test_mark_untrained_frustum(self):
        cfg = self.cfg()
        # one camera at z=-2 in NGP space looking at +z: cells behind it unseen
        c2w = jnp.array([[[1.0, 0, 0, 0.5], [0, 1.0, 0, 0.5], [0, 0, 1.0, -2.0]]])
        focal = jnp.array([[200.0, 200.0]])  # narrow FOV (~18 deg full)
        grid = occ.mark_untrained(cfg, c2w, focal, 64, 64)
        # scene centre is on-axis in front -> trained (0)
        assert float(grid[0, 16, 16, 16]) == 0.0
        # a level-1 corner cell is far off-axis -> unseen (-1)
        assert float(grid[1, 0, 0, 0]) == -1.0

    def test_splat_and_generate(self):
        cfg = self.cfg()
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.zeros((3, 32, 32, 32)))
        pos, idx = occ.generate_grid_samples(cfg, state, jax.random.PRNGKey(0),
                                             64, -0.01)
        assert pos.shape == (64, 3) and idx.shape == (64,)
        assert (np.asarray(idx) >= 0).all()
        assert (np.asarray(idx) < 2 * 32**3).all()  # max_cascade=1 -> levels 0,1
        tmp = occ.splat_max(cfg, jnp.zeros((3, 32, 32, 32)), idx,
                            jnp.zeros((64,)))
        # exp(0) * min_cone_stepsize splatted
        assert float(tmp.max()) > 0


class TestMarcher:
    def test_aabb_range(self):
        rcfg = NGPRenderConfig(aabb_scale=1, near_distance=0.0)
        o = jnp.array([[0.5, 0.5, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        tmin, tmax = ray_aabb_range(rcfg, o, d)
        np.testing.assert_allclose(float(tmin[0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(float(tmax[0]), 2.0, atol=1e-5)

    def test_march_finds_occupied_span(self):
        ocfg = occ.OccupancyConfig(grid_size=32, n_cascades=2, max_cascade=0)
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=64, n_samples=16,
                               near_distance=0.0)
        # occupy a slab z in [0.5, 0.53125] (cell 16 of 32)
        bits = jnp.zeros((2, 32, 32, 32), bool).at[0, :, :, 16].set(True)
        o = jnp.array([[0.5, 0.5, -1.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        m = march_rays(ocfg, rcfg, bits, o, d)
        # all fine samples concentrated near t = 1.5 (z=0.5)
        t_valid = np.asarray(m.t)[np.asarray(m.valid)]
        assert t_valid.size > 0
        assert np.all(np.abs(t_valid - 1.515) < 0.08)

    def test_march_empty_grid_no_valid(self):
        ocfg = occ.OccupancyConfig(grid_size=32, n_cascades=2, max_cascade=0)
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8)
        bits = jnp.zeros((2, 32, 32, 32), bool)
        m = march_rays(ocfg, rcfg, bits, jnp.array([[0.5, 0.5, -1.0]]),
                       jnp.array([[0.0, 0.0, 1.0]]))
        assert not bool(m.valid.any())


class TestNGPTrainUnits:
    def test_huber(self):
        x = jnp.array([0.0, 1.0])
        y = jnp.array([0.05, 0.0])
        h = huber_loss(x, y, delta=0.1)
        np.testing.assert_allclose(float(h[0]), 0.5 * 0.05**2 / 0.1, atol=1e-7)
        np.testing.assert_allclose(float(h[1]), 1.0 - 0.05, atol=1e-7)

    def test_expdecay_schedule(self):
        cfg = NGPTrainConfig(lr=0.1, decay_start=100, decay_interval=50,
                             decay_base=0.33)
        s = make_lr_schedule(cfg)
        np.testing.assert_allclose(float(s(0)), 0.1)
        np.testing.assert_allclose(float(s(99)), 0.1)
        np.testing.assert_allclose(float(s(100)), 0.1 * 0.33, rtol=1e-6)
        np.testing.assert_allclose(float(s(150)), 0.1 * 0.33**2, rtol=1e-6)


@pytest.mark.slow
class TestNGPTrainE2E:
    def test_overfit_synthetic(self):
        SCALE, OFF = 0.33, 0.5
        scene = make_scene(n_views=10, H=24, W=24)
        idx = jnp.array([i for i in range(10) if i != 5])

        c, r = rays_lib.get_center_and_ray(scene.poses[idx], scene.intr[idx],
                                           24, 24)
        d = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
        tr_o = (c * SCALE + OFF).reshape(-1, 3)
        tr_d = d.reshape(-1, 3)
        tr_rgb = scene.images[idx].reshape(-1, 3)

        mcfg = ngp.NGPModelConfig(grid=ngp.HashGridConfig(
            n_levels=8, log2_hashmap_size=15, desired_resolution=256.0))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=128, n_samples=32,
                               near_distance=0.05)
        tcfg = NGPTrainConfig(lr=2e-2, n_rays_per_batch=1024,
                              target_batch_size=1 << 14,
                              n_grid_uniform=1 << 14, n_grid_nonuniform=1 << 14,
                              decay_start=10**6)
        trainer = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        rng = np.random.default_rng(0)
        for _ in range(300):
            key, k = jax.random.split(key)
            ids = rng.integers(0, tr_o.shape[0], 1024)
            m = trainer.train_step(tr_o[ids], tr_d[ids], tr_rgb[ids], k)
        assert float(m["psnr"]) > 15.0, f"train psnr {float(m['psnr'])}"
        # batch adaptation engaged
        assert trainer.n_rays_per_batch != 1024

        pose = scene.poses[5]
        R, t = pose[:, :3], pose[:, 3]
        c2w = jnp.concatenate([R.T, (-R.T @ t[:, None]) * SCALE + OFF], axis=1)
        rgb, depth = trainer.render_image(c2w, scene.intr[5], 24, 24, chunk=576)
        val = float(psnr(rgb, scene.images[5]))
        assert val > 14.0, f"val psnr {val}"


class TestMultiSpanMarch:
    def test_two_cluster_samples_land_in_occupied_cells(self):
        """A ray crossing two separated occupied clusters must place >=90%
        of its valid samples in occupied cells and hit BOTH clusters
        (VERDICT march-fidelity criterion; replaces the single-span
        [t_lo, t_hi] approximation)."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        from myc_nerfs_tpu.render import occupancy as occ
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, march_rays

        cfg = occ.OccupancyConfig(grid_size=64, n_cascades=1)
        G = cfg.grid_size
        bf = np.zeros((1, G, G, G), bool)
        # two slabs along x: x in [0.15, 0.25] and [0.70, 0.80], full y/z
        bf[0, int(0.15 * G):int(0.25 * G)] = True
        bf[0, int(0.70 * G):int(0.80 * G)] = True
        state = occ.init_occupancy(cfg)._replace(bitfield=jnp.asarray(bf))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=256, n_samples=64,
                               near_distance=0.0)
        # ray along +x through the box center
        rays_o = jnp.asarray([[-0.5, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m = march_rays(cfg, rcfg, state.bitfield, rays_o, rays_d,
                       jax.random.PRNGKey(0))
        valid = np.asarray(m.valid[0])
        xs = np.asarray(m.positions[0, :, 0])  # warped == world (scale 1)
        assert valid.sum() >= 0.9 * rcfg.n_samples
        in_slab1 = ((xs >= 0.14) & (xs <= 0.26)) & valid
        in_slab2 = ((xs >= 0.69) & (xs <= 0.81)) & valid
        # every valid sample is inside one of the slabs (small tolerance for
        # coarse-bin edges)
        assert (in_slab1 | in_slab2)[valid].mean() >= 0.9
        # both clusters get sampled, roughly equally
        assert in_slab1.sum() >= 0.3 * valid.sum()
        assert in_slab2.sum() >= 0.3 * valid.sum()

    def test_short_arc_respects_step_budget(self):
        """A tiny occupied arc must not be oversampled below the reference's
        calc_dt floor (const_dt -> 0.5 * SQRT3/1024): extra samples are
        marked invalid instead (ray_sampler_header.h:106)."""
        import jax.numpy as jnp
        import numpy as np

        from myc_nerfs_tpu.render import occupancy as occ
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig, march_rays

        cfg = occ.OccupancyConfig(grid_size=128, n_cascades=1)
        G = cfg.grid_size
        bf = np.zeros((1, G, G, G), bool)
        bf[0, G // 2]  = True  # one voxel-thin slab
        state = occ.init_occupancy(cfg)._replace(bitfield=jnp.asarray(bf))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=512, n_samples=64,
                               near_distance=0.0, const_dt=True)
        rays_o = jnp.asarray([[-0.5, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m = march_rays(cfg, rcfg, state.bitfield, rays_o, rays_d, None)
        # arc ~ 1/128 = 7.8e-3; dt floor = 8.66e-4 -> at most ~10 samples
        assert int(np.asarray(m.valid).sum()) <= 12
        # dt equals the floor, not arc/K
        np.testing.assert_allclose(float(m.dt[0, 0]), 0.5 * 1.7320508 / 1024,
                                   rtol=1e-3)


class TestCompaction:
    def test_compact_marched_semantics(self):
        """CompactedCoord parity (compacted_coord.h:39-77): truncate at
        T < eps from a detached density pass, keep the first n_compact
        survivors per ray, preserve sample payloads."""
        import jax.numpy as jnp
        import numpy as np

        from myc_nerfs_tpu.render.ngp_render import (MarchedRays,
                                                     compact_marched)

        N, K, M = 4, 16, 8
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
        dirs = rng.uniform(0, 1, (N, K, 3)).astype(np.float32)
        dt = np.full((N, K), 0.05, np.float32)
        t = np.cumsum(dt, 1)
        valid = np.ones((N, K), bool)
        valid[1, ::2] = False
        sigma = np.zeros((N, K), np.float32)
        sigma[0, 4] = 1000.0  # opaque wall at sample 4
        m = MarchedRays(*(jnp.asarray(x) for x in (pos, dirs, dt, t, valid)))
        out = compact_marched(m, jnp.asarray(sigma), M)
        v = np.asarray(out.valid)
        assert v[0].sum() == 5  # samples 0..4, tail killed by T < eps
        np.testing.assert_allclose(np.asarray(out.positions)[0, :5],
                                   pos[0, :5])
        assert v[1].sum() == 8  # invalid evens dropped, odds kept
        np.testing.assert_allclose(np.asarray(out.positions)[1, :8],
                                   pos[1, 1::2])
        assert v[2].sum() == 8  # all survive, capped at M


class TestFusedMarch:
    """march_rays_fused: density-grid probing + in-march truncation
    (RaySampler ray_sampler.h + CompactedCoord compacted_coord.h folded
    into one static-shape pass)."""

    def _slab_state(self, G=64, slabs=((0.15, 0.25), (0.70, 0.80)), val=0.05):
        cfg = occ.OccupancyConfig(grid_size=G, n_cascades=1)
        grid = np.zeros((1, G, G, G), np.float32)
        for lo, hi in slabs:
            grid[0, int(lo * G):int(hi * G)] = val
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.asarray(grid),
            bitfield=jnp.asarray(grid > 0.0),
            mean_density=jnp.asarray(grid[0].mean()))
        return cfg, state

    def test_matches_bitfield_occupancy_decision(self):
        """gval > thresh == the bitfield bit for mip_from_pos lookups."""
        from myc_nerfs_tpu.render.ngp_render import march_rays_fused

        cfg, state = self._slab_state(val=1e-4)  # thin density: no truncation
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=256, n_samples=64,
                               near_distance=0.0)
        rays_o = jnp.asarray([[-0.5, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m_bit = march_rays(cfg, rcfg, state.bitfield, rays_o, rays_d, None)
        m_fus = march_rays_fused(cfg, rcfg, state, rays_o, rays_d, None)
        # with negligible optical depth the fused placement equals the
        # bitfield placement
        np.testing.assert_allclose(np.asarray(m_fus.t), np.asarray(m_bit.t),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(m_fus.valid),
                                      np.asarray(m_bit.valid))

    def test_truncation_kills_second_slab(self):
        """An optically thick first slab leaves T < eps: no samples in the
        second slab (the reference's early termination, compacted_coord.h)."""
        from myc_nerfs_tpu.render.ngp_render import march_rays_fused

        cfg, state = self._slab_state(val=1.0)  # huge optical depth
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=256, n_samples=32,
                               near_distance=0.0)
        rays_o = jnp.asarray([[-0.5, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m = march_rays_fused(cfg, rcfg, state, rays_o, rays_d)
        valid = np.asarray(m.valid[0])
        xs = np.asarray(m.positions[0, :, 0])
        assert valid.any()
        # all valid samples in the first slab's entry region
        assert (xs[valid] < 0.30).all()

    def test_two_cluster_coverage_thin_density(self):
        """Thin density -> both slabs sampled (multi-span fidelity kept)."""
        from myc_nerfs_tpu.render.ngp_render import march_rays_fused

        cfg, state = self._slab_state(val=1e-4)
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=256, n_samples=64,
                               near_distance=0.0)
        rays_o = jnp.asarray([[-0.5, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m = march_rays_fused(cfg, rcfg, state, rays_o, rays_d,
                             jax.random.PRNGKey(0))
        valid = np.asarray(m.valid[0])
        xs = np.asarray(m.positions[0, :, 0])
        in1 = ((xs >= 0.14) & (xs <= 0.26)) & valid
        in2 = ((xs >= 0.69) & (xs <= 0.81)) & valid
        assert in1.sum() >= 0.3 * valid.sum()
        assert in2.sum() >= 0.3 * valid.sum()

    def test_multi_cascade_outer_shell(self):
        """aabb_scale=4 (3 cascades): occupancy in cascade 1's outer shell
        (|x-0.5| in (0.5, 1.0]) must be found by the fused march through
        mip_from_pos lookups, matching the bitfield march's decision."""
        from myc_nerfs_tpu.render.ngp_render import march_rays_fused

        cfg = occ.OccupancyConfig(grid_size=32, n_cascades=3, max_cascade=2)
        G = cfg.grid_size
        grid = np.zeros((3, G, G, G), np.float32)
        # cascade 1 spans [-0.5, 1.5]; occupy slab x in [1.0, 1.25] which is
        # OUTSIDE cascade 0 ([0,1]) -> only reachable via mip 1 lookups.
        # cell index: x = ((i+0.5)/G - 0.5)*2 + 0.5 -> i = ((x-0.5)/2+0.5)*G
        lo = int(((1.00 - 0.5) / 2 + 0.5) * G)
        hi = int(((1.25 - 0.5) / 2 + 0.5) * G) + 1
        grid[1, lo:hi] = 0.05
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.asarray(grid),
            mean_density=jnp.asarray(np.maximum(grid[0], 0).mean()))
        rcfg = NGPRenderConfig(aabb_scale=4, n_coarse=256, n_samples=32,
                               near_distance=0.0)
        rays_o = jnp.asarray([[-2.0, 0.5, 0.5]])
        rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
        m = march_rays_fused(cfg, rcfg, state, rays_o, rays_d,
                             jax.random.PRNGKey(0))
        valid = np.asarray(m.valid[0])
        assert valid.any()
        lo_a, hi_a = rcfg.aabb
        xs = np.asarray(m.positions[0, :, 0]) * (hi_a - lo_a) + lo_a  # unwarp
        assert (xs[valid] >= 0.97).all() and (xs[valid] <= 1.33).all()

    def test_miss_ray_stays_finite_through_render(self):
        """A ray that misses the AABB entirely must produce FINITE
        positions (span=0 previously made r=inf -> NaN t/positions, and the
        NaN leaked through the MLP into the composite at zero weight)."""
        from myc_nerfs_tpu.render.ngp_render import (NGPRenderConfig,
                                                     march_rays,
                                                     march_rays_fused)

        cfg = occ.OccupancyConfig(grid_size=32, n_cascades=1)
        grid = np.zeros((1, 32, 32, 32), np.float32)
        grid[0, :, :, :] = 0.05
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.asarray(grid),
            bitfield=jnp.ones((1, 32, 32, 32), bool),
            mean_density=jnp.asarray(0.05))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8,
                               near_distance=0.0)
        # one hit ray, one ray pointing away from the box
        rays_o = jnp.asarray([[0.5, 0.5, -1.0], [0.5, 0.5, -1.0]])
        rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        for fn in (march_rays_fused,):
            m = fn(cfg, rcfg, state, rays_o, rays_d, None)
            assert np.isfinite(np.asarray(m.positions)).all()
            assert np.isfinite(np.asarray(m.t)).all()
            assert bool(m.valid[0].any()) and not bool(m.valid[1].any())
        m = march_rays(cfg, rcfg, state.bitfield, rays_o, rays_d, None)
        assert np.isfinite(np.asarray(m.positions)).all()
        assert np.isfinite(np.asarray(m.t)).all()
        assert bool(m.valid[0].any()) and not bool(m.valid[1].any())

    def test_network_compact_source_honored_under_fused_default(self):
        """compact_source='network' must reach the reference-shaped
        detached-pass path even when fused_march is left at its default —
        the fused branch previously swallowed it silently."""
        import dataclasses

        from myc_nerfs_tpu.models import ngp as ngp_mod
        from myc_nerfs_tpu.render.ngp_render import (NGPRenderConfig,
                                                     render_rays_ngp)

        cfg = occ.OccupancyConfig(grid_size=32, n_cascades=1)
        grid = np.zeros((1, 32, 32, 32), np.float32)
        grid[0, 8:24, 8:24, 8:24] = 0.05
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.asarray(grid),
            bitfield=jnp.asarray(grid > 0.0),
            mean_density=jnp.asarray(grid[0].mean()))
        model = ngp_mod.NGPModel(ngp_mod.NGPModelConfig(
            grid=ngp_mod.HashGridConfig(n_levels=4, desired_resolution=64.0)))
        params = model.init(jax.random.PRNGKey(0))
        rays_o = jnp.asarray([[0.5, 0.5, -1.0]])
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
        bg = jnp.ones(3)

        base = NGPRenderConfig(aabb_scale=1, n_coarse=64, n_samples=16,
                               n_compact=8, near_distance=0.0)
        net_fuseddefault = render_rays_ngp(
            cfg, dataclasses.replace(base, compact_source="network"),
            model.apply, params, state, rays_o, rays_d, bg, None,
            density_apply=model.density_raw)
        net_explicit = render_rays_ngp(
            cfg, dataclasses.replace(base, compact_source="network",
                                     fused_march=False),
            model.apply, params, state, rays_o, rays_d, bg, None,
            density_apply=model.density_raw)
        np.testing.assert_allclose(np.asarray(net_fuseddefault.rgb),
                                   np.asarray(net_explicit.rgb), atol=1e-6)


class TestFusedKSemantics:
    def test_n_compact_is_the_live_sample_count_under_compaction(self):
        """Under the fused march with a density_apply, the per-ray live
        sample count is EXACTLY rcfg.n_compact and rcfg.n_samples is inert
        — the contract bench.py's march-budget legs rely on (an inert
        n_samples arg silently mislabeled the flagship K=64 leg,
        PERF_NOTES par.16b)."""
        import dataclasses

        from myc_nerfs_tpu.models import ngp as ngp_mod
        from myc_nerfs_tpu.render.ngp_render import (NGPRenderConfig,
                                                     render_rays_ngp)

        cfg = occ.OccupancyConfig(grid_size=32, n_cascades=1)
        grid = np.zeros((1, 32, 32, 32), np.float32)
        grid[0, 8:24, 8:24, 8:24] = 0.05
        state = occ.init_occupancy(cfg)._replace(
            density_grid=jnp.asarray(grid),
            bitfield=jnp.asarray(grid > 0.0),
            mean_density=jnp.asarray(grid[0].mean()))
        model = ngp_mod.NGPModel(ngp_mod.NGPModelConfig(
            grid=ngp_mod.HashGridConfig(n_levels=4, desired_resolution=64.0)))
        params = model.init(jax.random.PRNGKey(0))
        rays_o = jnp.asarray([[0.5, 0.5, -1.0]] * 4)
        rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
        bg = jnp.ones(3)

        base = NGPRenderConfig(aabb_scale=1, n_coarse=64, n_samples=16,
                               n_compact=8, near_distance=0.0)
        out8 = render_rays_ngp(cfg, base, model.apply, params, state,
                               rays_o, rays_d, bg, None,
                               density_apply=model.density_raw)
        # n_samples is inert when compacting: doubling it changes nothing
        out8b = render_rays_ngp(
            cfg, dataclasses.replace(base, n_samples=32), model.apply,
            params, state, rays_o, rays_d, bg, None,
            density_apply=model.density_raw)
        np.testing.assert_allclose(np.asarray(out8.rgb),
                                   np.asarray(out8b.rgb), atol=0)
        assert int(out8.n_samples.sum()) <= 8 * 4
        # the march budget itself (n_compact) DOES change the program
        out16 = render_rays_ngp(
            cfg, dataclasses.replace(base, n_compact=16), model.apply,
            params, state, rays_o, rays_d, bg, None,
            density_apply=model.density_raw)
        assert int(out16.n_samples.sum()) > int(out8.n_samples.sum())


class TestKillAndResume:
    """NGP kill-and-resume mid-schedule (VERDICT r2 #3c): restoring the
    full state (params + Adam moments + EMA + occupancy grid + step) and
    feeding identical batches must reproduce the uninterrupted run
    exactly. Reference semantics: runner.py:127-155 restores model,
    sampler grids, nested Adam m/v and EMA shadows."""

    def _mk_trainer(self):
        from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModelConfig
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
        from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig,
                                                     NGPTrainer)

        mcfg = NGPModelConfig(grid=HashGridConfig(
            n_levels=4, log2_hashmap_size=12, desired_resolution=64.0))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8,
                               n_compact=4)
        tcfg = NGPTrainConfig(n_rays_per_batch=128, target_batch_size=1 << 10,
                              n_grid_uniform=1 << 10, n_grid_nonuniform=0,
                              update_den_freq=4, decay_start=8,
                              decay_interval=8)
        return NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))

    def _batches(self, n_blocks, S=4, n=128):
        key = jax.random.PRNGKey(9)
        out = []
        for b in range(n_blocks):
            k = jax.random.fold_in(key, b)
            theta = jax.random.uniform(k, (S * n,)) * 6.28318
            o = jnp.stack([0.5 + 1.4 * jnp.cos(theta),
                           0.5 + 1.4 * jnp.sin(theta),
                           jnp.full((S * n,), 0.5)], -1)
            d = (0.5 - o)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            tgt = jax.random.uniform(jax.random.fold_in(k, 1), (S, n, 3))
            out.append((o.reshape(S, n, 3), d.reshape(S, n, 3), tgt))
        return out

    def _run(self, trainer, batches, start_block):
        for b, (o, d, tgt) in enumerate(batches):
            kb = jax.random.fold_in(jax.random.PRNGKey(77),
                                    start_block + b)
            trainer.state = trainer.state._replace(
                occ=trainer.grid_update(trainer.state.occ,
                                        trainer.state.params, kb))
            trainer.train_block(o, d, tgt, jax.random.fold_in(kb, 1))
        return trainer

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        from myc_nerfs_tpu.core.checkpoint import (restore_checkpoint,
                                                   save_checkpoint)

        batches = self._batches(4)
        # uninterrupted: 4 blocks (16 steps, crosses the decay_start=8
        # LR-schedule boundary mid-way)
        tA = self._run(self._mk_trainer(), batches, 0)

        # killed after 2 blocks, checkpointed, restored into a FRESH trainer
        tB = self._run(self._mk_trainer(), batches[:2], 0)
        ck = str(tmp_path / "model.ckpt")
        save_checkpoint(ck, tB.state, step=int(tB.state.step))
        tC = self._mk_trainer()  # fresh init (different params until restore)
        tC.state, meta = restore_checkpoint(ck, tC.state)
        assert int(meta["step"]) == 8
        tC = self._run(tC, batches[2:], 2)

        assert int(tA.state.step) == int(tC.state.step) == 16
        for a, c in zip(jax.tree_util.tree_leaves(tA.state.params),
                        jax.tree_util.tree_leaves(tC.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(tA.state.occ.density_grid),
            np.asarray(tC.state.occ.density_grid), atol=1e-6)

    def test_legacy_checkpoint_with_ema_fields_restores(self, tmp_path):
        """Pre-round-4 checkpoints carry the dropped ema_params/ema_steps
        NGPTrainState fields; restore_checkpoint must drop them and load
        the rest (the shadow always equaled the live params)."""
        from flax import serialization

        from myc_nerfs_tpu.core.checkpoint import restore_checkpoint

        tr = self._mk_trainer()
        legacy = dict(serialization.to_state_dict(tr.state))
        legacy["ema_params"] = legacy["params"]  # old duplicate
        legacy["ema_steps"] = np.zeros((), np.int32)
        # mutate params so a successful restore is observable
        legacy["params"] = jax.tree_util.tree_map(
            lambda x: np.asarray(x) * 0 + 2, legacy["params"])
        ck = str(tmp_path / "legacy.ckpt")
        with open(ck, "wb") as f:
            f.write(serialization.msgpack_serialize(legacy))
        state, _ = restore_checkpoint(ck, tr.state)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        np.testing.assert_allclose(np.asarray(leaf).ravel()[0], 2.0)

    def test_ema_matches_reference_recurrence(self):
        """The in-place blend must track the reference loop (ema.py:26-42):
        p <- ((1-d) p + d v (1-d^(n-1))) / (1-d^n); v <- p — with v carried
        implicitly as the previous step's final params."""
        from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig,
                                                     ema_step)

        cfg = NGPTrainConfig(ema_decay=0.95)
        d = 0.95
        rng = np.random.default_rng(3)
        raw_updates = rng.normal(size=(5, 4)).astype(np.float32)

        # reference simulation: separate live p and shadow v
        p_ref = np.zeros(4, np.float32)
        v_ref = np.zeros(4, np.float32)
        # ours: a single params tree; shadow is last step's final params
        p_ours = jnp.zeros(4, jnp.float32)
        for n in range(1, 6):
            post_adam_ref = p_ref + raw_updates[n - 1]
            p_ref = (((1 - d) * post_adam_ref + d * v_ref * (1 - d ** (n - 1)))
                     / (1 - d ** n))
            v_ref = p_ref.copy()
            shadow = p_ours                      # previous final params
            post_adam = p_ours + raw_updates[n - 1]
            p_ours = ema_step(cfg, {"w": post_adam}, {"w": shadow},
                              jnp.asarray(n - 1))["w"]
            np.testing.assert_allclose(np.asarray(p_ours), p_ref, rtol=1e-5)

    def test_train_block_broadcasts_low_rank_bg(self):
        """bg [3] / [B, 3] must be broadcast to [S, B, 3] before the scan —
        a raw [3] bg would be scanned over the channel axis (crash for
        S != 3, silently wrong per-step scalar bg for S == 3)."""
        o, d, tgt = self._batches(1, S=3)[0]  # S=3: the silent case
        k = jax.random.PRNGKey(5)
        tA = self._mk_trainer()
        tA.train_block(o, d, tgt, k, bg=jnp.ones(3))
        tB = self._mk_trainer()
        tB.train_block(o, d, tgt, k, bg=jnp.ones((3, 128, 3)))
        for a, b in zip(jax.tree_util.tree_leaves(tA.state.params),
                        jax.tree_util.tree_leaves(tB.state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestGridUpdateWarp:
    def test_update_feeds_aabb_warped_positions(self):
        """The grid update must evaluate the network at AABB-WARPED coords
        (generate_grid_samples_nerf_nonuniform.h:34 warp_position before
        model.density): a density peak at a known WORLD position must splat
        into the cascade cell containing that world position."""
        cfg = occ.OccupancyConfig(max_cascade=1)  # aabb_scale=2: [-0.5, 1.5]
        aabb = (-0.5, 1.5)
        w_target = jnp.array([1.2, 1.2, 1.2])     # outside the unit box
        p01_target = (w_target - aabb[0]) / (aabb[1] - aabb[0])  # 0.85

        def density_raw(params, p01):
            near = (jnp.abs(p01 - p01_target) < 0.05).all(-1)
            return jnp.where(near, 5.0, -10.0)[..., None]

        update = occ.make_density_grid_update(cfg, density_raw,
                                              n_uniform=1 << 15,
                                              n_nonuniform=0, aabb=aabb)
        state = occ.init_occupancy(cfg)
        state = update(state, None, jax.random.PRNGKey(0))
        grid = np.asarray(state.density_grid)
        G = cfg.grid_size
        # cascade 1 spans the full aabb here, so its grid coords equal p01:
        # hot cells must lie in the warped peak region [0.80, 0.90]^3
        hot = np.argwhere(grid[1] > 0.1)
        assert hot.shape[0] > 0, "no cascade-1 cell splatted hot"
        assert (hot >= int(0.80 * G) - 1).all() and \
               (hot <= int(0.90 * G) + 1).all(), hot
        # cascade 0 (world [0,1] -> p01 in [0.25, 0.75]) never reaches the
        # peak; the pre-fix unwarped code would have splatted hot cells
        # around 0.85 * G here
        assert grid[0].max() < 1e-3, grid[0].max()


class TestDensityActivation:
    """Overflow-guarded exp (ray_sampler_header.h:926-943 forward,
    :1050-1056 clamped derivative)."""

    def test_matches_exp_in_normal_range(self):
        raw = jnp.linspace(-20.0, 14.0, 64)
        np.testing.assert_allclose(np.asarray(ngp.density_activation(raw)),
                                   np.exp(np.asarray(raw)), rtol=1e-6)

    def test_forward_finite_and_grad_clamped_at_saturation(self):
        # forward: min(raw, 30) keeps exp finite even at fp-large raw
        big = jnp.asarray([50.0, 100.0, 1000.0])
        out = ngp.density_activation(big)
        assert bool(jnp.isfinite(out).all())
        np.testing.assert_allclose(np.asarray(out), np.exp(30.0), rtol=1e-6)
        # gradient: exp(clamp(raw, -15, 15)) — the reference's derivative
        g = jax.grad(lambda r: ngp.density_activation(r).sum())(big)
        np.testing.assert_allclose(np.asarray(g), np.exp(15.0), rtol=1e-6)
        g_lo = jax.grad(ngp.density_activation)(jnp.asarray(-40.0))
        np.testing.assert_allclose(float(g_lo), np.exp(-15.0), rtol=1e-6)

    def test_saturated_field_composites_without_nan(self):
        # dt=0 padding lanes x inf density was the NaN mechanism: a huge
        # raw density through the compositor must stay finite (the
        # flagship at lr 1e-2 hits this within 3 steps pre-fix)
        from myc_nerfs_tpu.render.composite import (composite_rgb,
                                                    composite_weights)

        sigma = ngp.density_activation(jnp.full((4, 8), 200.0))
        dt = jnp.zeros((4, 8)).at[:, :2].set(1e-3)   # 6 dead padding lanes
        valid = dt > 0
        w, t_left = composite_weights(sigma, dt, valid, 1e-4)
        rgb = composite_rgb(jnp.full((4, 8, 3), 0.5), w, t_left,
                            jnp.ones((3,)))
        assert bool(jnp.isfinite(w).all() and jnp.isfinite(rgb).all())

    def test_flagship_train_step_stays_finite_at_reference_lr(self):
        # regression: OriginNeRF + lr 1e-2 (nerf_base.py value parity)
        # diverged to NaN params within 3 steps before the clamped-grad
        # activation; it must now stay finite (saturated is acceptable —
        # recovery needs the real lr schedule, quality gate in
        # quality_r4_log flagship runs)
        from myc_nerfs_tpu.models.ori_nerf import (OriginNeRFConfig,
                                                   OriginNeRFModel)

        mcfg = ngp.NGPModelConfig(
            grid=ngp.HashGridConfig(log2_hashmap_size=12),
            use_bf16=True, grid_impl="brick3")
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=16,
                               n_compact=8, near_distance=0.05)
        tcfg = NGPTrainConfig(lr=1e-2, n_rays_per_batch=64,
                              target_batch_size=1 << 18, update_den_freq=16)
        model = OriginNeRFModel(OriginNeRFConfig(skips=(), use_bf16=True,
                                                 W=64, D=2))
        tr = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0), model=model)
        key = jax.random.PRNGKey(1)
        tr.state = tr.state._replace(occ=tr.grid_update(
            tr.state.occ, tr.state.params, key))
        o = jnp.asarray(np.random.default_rng(0).normal(size=(64, 3)),
                        jnp.float32)
        o = 0.5 + 1.2 * o / np.linalg.norm(o, axis=-1, keepdims=True)
        d = 0.5 - o
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tgt = jnp.full((64, 3), 0.5)
        for i in range(6):
            key, k = jax.random.split(key)
            st, m = tr._step_fn(tr.state, o, d, tgt,
                                jnp.asarray(tcfg.background_color), k)
            tr.state = st
        assert all(bool(jnp.isfinite(l.astype(jnp.float32)).all())
                   for l in jax.tree_util.tree_leaves(tr.state.params))


class TestBatchLadder:
    """Quarter-octave ray-batch adaptation ladder (_ladder_floor)."""

    def test_ladder_floor_values(self):
        from myc_nerfs_tpu.train.ngp_trainer import _ladder_floor

        assert _ladder_floor(8192) == 8192
        assert _ladder_floor(13107) == 12288       # 1.5 * 2^13
        assert _ladder_floor(10922) == 10240       # 1.25 * 2^13
        assert _ladder_floor(16383) == 14336       # 1.75 * 2^13
        assert _ladder_floor(16384) == 16384
        assert _ladder_floor(1) == 128             # lower bound
        # never exceeds the input (the samples-budget guarantee)
        for r in [128, 129, 200, 333, 4097, 999999]:
            assert _ladder_floor(r) <= max(r, 128)

    def test_adaptation_respects_sample_budget(self):
        """After adaptation, rays * measured-mean-samples <= target."""
        from myc_nerfs_tpu.models import ngp
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
        from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig,
                                                     NGPTrainer)

        mcfg = ngp.NGPModelConfig(grid=ngp.HashGridConfig(
            n_levels=4, log2_hashmap_size=12, desired_resolution=64.0))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=16)
        tcfg = NGPTrainConfig(n_rays_per_batch=256,
                              target_batch_size=1 << 12,
                              n_grid_uniform=1 << 10, n_grid_nonuniform=0)
        tr = NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))
        # synthetic measurement: mean 20 live samples/ray over one window
        tr._measured_samples = 20.0 * 256 * 4
        tr._measure_count = 4
        tr._update_batch_rays()
        assert tr.n_rays_per_batch * 20 <= tcfg.target_batch_size
        assert tr.n_rays_per_batch == 192  # floor(4096/20)=204 -> 1.5*128


class TestSkipNonfinite:
    """GradScaler step-skip semantics (reference fp16 path, nerf_base.py:80):
    a step with any inf/nan grad must leave params AND optimizer moments
    untouched while counters advance."""

    def _fresh_state(self, cfg, tx):
        import jax.numpy as jnp

        from myc_nerfs_tpu.train.ngp_trainer import NGPTrainState

        params = {"w": jnp.ones((3,), jnp.float32)}
        return NGPTrainState(params=params, opt_state=tx.init(params),
                             occ=None, step=jnp.zeros((), jnp.int32))

    def test_nonfinite_step_skipped(self):
        import jax
        import jax.numpy as jnp

        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, skip_nonfinite=True)
        tx = nt.make_optimizer(cfg)
        state = self._fresh_state(cfg, tx)
        bad = {"w": jnp.array([1.0, jnp.nan, 1.0], jnp.float32)}
        s2 = nt.apply_param_update(cfg, tx, state, bad)
        # params unchanged up to the EMA blend's rounding (EMA still runs
        # on skipped steps, as the reference's does — ema.py:26-42)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   np.ones(3, np.float32), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                        jax.tree_util.tree_leaves(s2.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(s2.step) == 1
        # the next finite step applies normally
        good = {"w": jnp.full((3,), 0.5, jnp.float32)}
        s3 = nt.apply_param_update(cfg, tx, s2, good)
        assert not np.allclose(np.asarray(s3.params["w"]),
                               np.ones(3, np.float32))

    def test_inf_grad_also_skipped(self):
        import jax.numpy as jnp

        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, skip_nonfinite=True)
        tx = nt.make_optimizer(cfg)
        state = self._fresh_state(cfg, tx)
        bad = {"w": jnp.array([jnp.inf, 0.0, 0.0], jnp.float32)}
        s2 = nt.apply_param_update(cfg, tx, state, bad)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   np.ones(3, np.float32), rtol=1e-6)

    def test_default_off_applies_nonfinite(self):
        """Without the flag the update applies verbatim (the branch-free
        default path) — nan grads poison params, as plain Adam would."""
        import jax.numpy as jnp

        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2)
        tx = nt.make_optimizer(cfg)
        state = self._fresh_state(cfg, tx)
        bad = {"w": jnp.array([1.0, jnp.nan, 1.0], jnp.float32)}
        s2 = nt.apply_param_update(cfg, tx, state, bad)
        assert not np.all(np.isfinite(np.asarray(s2.params["w"])))


class TestMarchSchedule:
    """Staged march budget (NGPTrainConfig.n_compact_schedule): the
    reference's lossless dynamic compaction (compacted_coord.h:37-77) has
    no fixed K; our static-K budget recovers late-training quality with a
    step-staged K (PERF_NOTES par.18d: the budget floor binds only once
    the field sharpens). The switch is a host-side staged re-jit."""

    def _mk(self, sched):
        from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModelConfig
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig
        from myc_nerfs_tpu.train.ngp_trainer import (NGPTrainConfig,
                                                     NGPTrainer)

        mcfg = NGPModelConfig(grid=HashGridConfig(
            n_levels=4, log2_hashmap_size=12, desired_resolution=64.0))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8,
                               n_compact=4)
        tcfg = NGPTrainConfig(n_rays_per_batch=64, target_batch_size=1 << 10,
                              n_grid_uniform=1 << 10, n_grid_nonuniform=0,
                              update_den_freq=4, n_compact_schedule=sched)
        return NGPTrainer(mcfg, rcfg, tcfg, jax.random.PRNGKey(0))

    def _block(self, S=4, n=64):
        key = jax.random.PRNGKey(3)
        theta = jax.random.uniform(key, (S * n,)) * 6.28318
        o = jnp.stack([0.5 + 1.4 * jnp.cos(theta),
                       0.5 + 1.4 * jnp.sin(theta),
                       jnp.full((S * n,), 0.5)], -1)
        d = (0.5 - o)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        tgt = jax.random.uniform(jax.random.fold_in(key, 1), (S, n, 3))
        return o.reshape(S, n, 3), d.reshape(S, n, 3), tgt

    def test_schedule_switches_at_boundary_and_trains_through(self):
        tr = self._mk(((0, 4), (8, 6)))
        assert tr.rcfg.n_compact == 4
        o, d, tgt = self._block()
        m1 = tr.train_block(o, d, tgt, jax.random.PRNGKey(1))  # steps 0-3
        assert tr.rcfg.n_compact == 4
        tr.train_block(o, d, tgt, jax.random.PRNGKey(2))       # steps 4-7
        m3 = tr.train_block(o, d, tgt, jax.random.PRNGKey(3))  # steps 8-11
        assert tr.rcfg.n_compact == 6  # boundary crossed -> re-jitted
        assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m3["loss"]))

    def test_resume_lands_in_correct_stage(self):
        tr = self._mk(((0, 4), (8, 6)))
        tr.set_host_step(9)
        assert tr.rcfg.n_compact == 6
        tr2 = self._mk(((0, 4), (8, 6)))
        tr2.set_host_step(7)
        assert tr2.rcfg.n_compact == 4

    def test_initial_stage_applies_at_construction(self):
        tr = self._mk(((0, 6),))
        assert tr.rcfg.n_compact == 6


class TestFp16GradEmulation:
    """fp16 backward numerics emulation (NGPTrainConfig.fp16_grads): the
    reference's amp-level-5 fp16 pipeline (ori_nerf_network.py:33,70-77)
    bounds grads at +-65504/scale — larger ones become inf and the
    GradScaler SKIPS the step. A bf16/f32 backward never overflows, so
    those violent steps land; the emulation restores the implicit
    rejection (the lr 1e-2 mechanism probe, VERDICT r4 weak#4)."""

    def _state(self, cfg, tx, val=1.0):
        from myc_nerfs_tpu.render import occupancy as occ
        from myc_nerfs_tpu.train import ngp_trainer as nt

        params = {"w": jnp.full((3,), val, jnp.float32)}
        return nt.NGPTrainState(params=params, opt_state=tx.init(params),
                                occ=occ.init_occupancy(occ.OccupancyConfig()),
                                step=jnp.zeros((), jnp.int32))

    def test_overrange_grad_becomes_inf_and_skips(self):
        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, fp16_grads=True,
                                fp16_grad_scale=128.0, skip_nonfinite=True)
        tx = nt.make_optimizer(cfg)
        st = self._state(cfg, tx)
        big = {"w": jnp.array([600.0, 0.0, 0.0], jnp.float32)}  # 600*128 > 65504
        s2 = nt.apply_param_update(cfg, tx, st, big)
        np.testing.assert_allclose(np.asarray(s2.params["w"]),
                                   np.ones(3, np.float32), rtol=1e-6)

    def test_inrange_grad_applies_with_fp16_rounding(self):
        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, fp16_grads=True,
                                fp16_grad_scale=128.0, skip_nonfinite=True)
        tx = nt.make_optimizer(cfg)
        st = self._state(cfg, tx)
        ok = {"w": jnp.array([1.0, -2.0, 0.5], jnp.float32)}
        s2 = nt.apply_param_update(cfg, tx, st, ok)
        assert not np.allclose(np.asarray(s2.params["w"]),
                               np.ones(3, np.float32))
        assert np.all(np.isfinite(np.asarray(s2.params["w"])))

    def test_clip_grad_norm_bounds_update(self):
        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, clip_grad_norm=1.0, ema_decay=0.0)
        tx = nt.make_optimizer(cfg)
        st = self._state(cfg, tx)
        huge = {"w": jnp.array([1e6, 0.0, 0.0], jnp.float32)}
        small = {"w": jnp.array([1.0, 0.0, 0.0], jnp.float32)}
        s_h = nt.apply_param_update(cfg, tx, st, huge)
        s_s = nt.apply_param_update(cfg, tx, st, small)
        # both clip to the same unit direction -> identical Adam updates
        np.testing.assert_allclose(np.asarray(s_h.params["w"]),
                                   np.asarray(s_s.params["w"]), rtol=1e-5)


class TestFp16OverflowParity:
    """OriginNeRFConfig.fp16_overflow_parity: raw density above the fp16
    exp-overflow threshold (log 65504 ~ 11.09) poisons the model output to
    nan — the reference's amp-level-5 forward behavior whose GradScaler
    step-skip is the load-bearing lr 1e-2 mechanism (quality_r5_log
    lr2_mechanism: without it the clamp-finite steps land and drive the
    field into the opaque-wall attractor)."""

    def _model(self, parity):
        from myc_nerfs_tpu.models.ori_nerf import (OriginNeRFConfig,
                                                   OriginNeRFModel)

        return OriginNeRFModel(OriginNeRFConfig(
            D=2, W=32, skips=(), fp16_overflow_parity=parity))

    def test_normal_range_untouched(self):
        m = self._model(True)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        out = m.apply(p, x, x)
        assert np.isfinite(np.asarray(out)).all()

    def test_overflow_poisons_sample(self):
        m = self._model(True)
        p = m.init(jax.random.PRNGKey(0))
        # force a huge raw density by inflating the alpha head bias
        p["mlp"]["params"]["alpha"]["bias"] = jnp.full((1,), 50.0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))
        out = np.asarray(m.apply(p, x, x))
        assert np.isnan(out).all()  # whole sample row poisoned
        # without parity the clamp keeps it finite (the r4 behavior)
        m2 = self._model(False)
        out2 = np.asarray(m2.apply(p, x, x))
        assert np.isfinite(out2[..., 3]).all()


class TestWarmupSchedule:
    def test_linear_warmup_then_expdecay(self):
        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2, warmup_steps=100, decay_start=200,
                                decay_interval=100, decay_base=0.5)
        sched = nt.make_lr_schedule(cfg)
        assert abs(float(sched(0)) - 1e-2 / 100) < 1e-8   # step 0 -> lr/100
        assert abs(float(sched(49)) - 1e-2 * 0.5) < 1e-6  # halfway up
        assert abs(float(sched(150)) - 1e-2) < 1e-8       # full lr pre-decay
        assert abs(float(sched(250)) - 5e-3) < 1e-8       # first decay step

    def test_warmup_off_by_default(self):
        from myc_nerfs_tpu.train import ngp_trainer as nt

        cfg = nt.NGPTrainConfig(lr=1e-2)
        sched = nt.make_lr_schedule(cfg)
        assert abs(float(sched(0)) - 1e-2) < 1e-8
