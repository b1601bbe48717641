"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.parallel import mesh as mesh_lib
from myc_nerfs_tpu.parallel import spmd


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


class TestMesh:
    def test_make_mesh_shapes(self, devices):
        m = mesh_lib.make_mesh(devices)
        assert m.shape == {"data": 8, "model": 1}
        m2 = mesh_lib.make_mesh(devices, data=4, model=2)
        assert m2.shape == {"data": 4, "model": 2}

    def test_shard_batch_layout(self, devices):
        m = mesh_lib.make_mesh(devices)
        x = jnp.arange(16.0).reshape(16, 1)
        xs = mesh_lib.shard_batch(m, x)
        assert len(xs.sharding.device_set) == 8

    def test_psum_loss_matches_single_device(self, devices):
        """A data-sharded mean-loss grad equals the unsharded one."""
        m = mesh_lib.make_mesh(devices)
        w = jnp.ones((4,))
        x = jax.random.normal(jax.random.PRNGKey(0), (32, 4))

        def loss(w, x):
            return jnp.mean((x @ w) ** 2)

        g_ref = jax.grad(loss)(w, x)
        xs = mesh_lib.shard_batch(m, x)
        wr = jax.device_put(w, mesh_lib.replicated(m))
        g_sharded = jax.jit(jax.grad(loss))(wr, xs)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_sharded),
                                   rtol=1e-6)


class TestNGPSpmd:
    def test_dp_step_runs_and_is_finite(self, devices):
        m = mesh_lib.make_mesh(devices)  # 8-way data parallel
        state, metrics = spmd.multichip_ngp_train_step(m, n_rays=128,
                                                       shard_table=False)
        assert np.isfinite(float(metrics["loss"]))

    def test_dp_tp_step_runs(self, devices):
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        state, metrics = spmd.multichip_ngp_train_step(m, n_rays=128,
                                                       shard_table=True)
        assert np.isfinite(float(metrics["loss"]))
        # divisible brick tables stayed sharded over the model axis
        shardable = [t for t in state.params["table"] if t.shape[0] % 2 == 0]
        assert shardable
        assert len(shardable[0].sharding.device_set) in (2, 8)

    def test_sharded_matches_replicated(self, devices):
        """Same step on a 1-device mesh vs the 8-device mesh: same loss."""
        m1 = mesh_lib.make_mesh(devices[:1])
        m8 = mesh_lib.make_mesh(devices)
        _, met1 = spmd.multichip_ngp_train_step(m1, n_rays=64, shard_table=False)
        _, met8 = spmd.multichip_ngp_train_step(m8, n_rays=64, shard_table=False)
        np.testing.assert_allclose(float(met1["loss"]), float(met8["loss"]),
                                   rtol=1e-4)

    def test_dp_scan_block_runs(self, devices):
        """The production dispatch shape: an n-step lax.scan train block
        with rays dp-sharded on the per-step axis and tables tp-sharded."""
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        state, metrics = spmd.multichip_ngp_train_block(m, n_rays=128,
                                                        n_steps=3,
                                                        shard_table=True)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 3


class TestLevelTP:
    """Whole-level table sharding (VERDICT r2 #4): gathers stay chip-local;
    sharded gradients must match the replicated program bit-for-bit-ish."""

    def test_level_tp_block_runs(self, devices):
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        state, metrics = spmd.multichip_ngp_train_block(
            m, n_rays=256, n_steps=2, table_mode="levels")
        assert np.isfinite(float(metrics["loss"]))
        hashed = state.params["table"]["hashed"]
        assert hashed.ndim == 3
        # the stacked hashed-level axis is actually sharded over "model"
        spec = hashed.sharding.spec
        assert spec[0] == "model"

    def test_level_tp_grad_parity_vs_replicated(self, devices):
        """Identical seeds: a 4x2 level-sharded scan block must produce the
        same post-Adam table/MLP params as the 8x1 (model=1, i.e. every
        chip owns all levels) program — multi-step gradient parity under
        table sharding."""
        m_tp = mesh_lib.make_mesh(devices, data=4, model=2)
        m_rep = mesh_lib.make_mesh(devices, data=8, model=1)
        s_tp, met_tp = spmd.multichip_ngp_train_block(
            m_tp, n_rays=256, n_steps=3, table_mode="levels", seed=0)
        s_rep, met_rep = spmd.multichip_ngp_train_block(
            m_rep, n_rays=256, n_steps=3, table_mode="levels", seed=0)
        np.testing.assert_allclose(float(met_tp["loss"]),
                                   float(met_rep["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s_tp.params["table"]["hashed"]),
            np.asarray(s_rep.params["table"]["hashed"]), atol=1e-5)
        leaves_tp = jax.tree_util.tree_leaves(s_tp.params["mlp"])
        leaves_rep = jax.tree_util.tree_leaves(s_rep.params["mlp"])
        for a, b in zip(leaves_tp, leaves_rep):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestGroupTP:
    """Brick3 GROUP-axis table sharding (VERDICT r3 weak #5): multi-chip TP
    trains the same level-tripled row layout as the single-chip optimum."""

    def test_group_tp_encode_matches_brick3(self, devices):
        """Same init key: the group-sharded encode must equal the plain
        single-chip brick3 paired_encode, forward and table-gradient."""
        from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, \
            NGPModelConfig

        m = mesh_lib.make_mesh(devices, data=4, model=2)
        cfg = NGPModelConfig(grid=HashGridConfig(
            n_levels=7, log2_hashmap_size=14, desired_resolution=512.0),
            grid_impl="brick3")  # 1 dense + 6 hashed -> 2 triple groups
        plain = NGPModel(cfg)
        tp = spmd.GroupTPModel(cfg, m)
        key = jax.random.PRNGKey(4)
        p_plain = plain.init(key)
        p_tp = tp.init(key)
        pos = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))
        dirs = jax.random.uniform(jax.random.PRNGKey(6), (64, 3))
        with m:
            out_tp = tp.apply(p_tp, pos, dirs)
        out_plain = plain.apply(p_plain, pos, dirs)
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_plain),
                                   atol=1e-5)

        def loss_plain(p):
            return plain.apply(p, pos, dirs).sum()

        def loss_tp(p):
            return tp.apply(p, pos, dirs).sum()

        g_plain = jax.grad(loss_plain)(p_plain)["table"]
        with m:
            g_tp = jax.grad(loss_tp)(p_tp)["table"]
        nd = len(tp.dense_groups)
        for i in range(nd):
            np.testing.assert_allclose(np.asarray(g_tp["dense"][i]),
                                       np.asarray(g_plain[i]), atol=1e-5)
        for gi, members in enumerate(tp.hashed_groups):
            w = len(members) * cfg.grid.n_features * 128
            np.testing.assert_allclose(
                np.asarray(g_tp["hashed"][gi][:, :w]),
                np.asarray(g_plain[nd + gi]), atol=1e-5)
            # pad columns (if any) must receive zero gradient
            np.testing.assert_allclose(
                np.asarray(g_tp["hashed"][gi][:, w:]), 0.0, atol=0)

    def test_group_tp_block_runs(self, devices):
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        state, metrics = spmd.multichip_ngp_train_block(
            m, n_rays=256, n_steps=2, table_mode="groups")
        assert np.isfinite(float(metrics["loss"]))
        hashed = state.params["table"]["hashed"]
        assert hashed.ndim == 3
        assert hashed.sharding.spec[0] == "model"

    def test_group_tp_grad_parity_vs_replicated(self, devices):
        """4x2 group-sharded scan block == 8x1 program after 3 Adam steps."""
        m_tp = mesh_lib.make_mesh(devices, data=4, model=2)
        m_rep = mesh_lib.make_mesh(devices, data=8, model=1)
        s_tp, met_tp = spmd.multichip_ngp_train_block(
            m_tp, n_rays=256, n_steps=3, table_mode="groups", seed=0)
        s_rep, met_rep = spmd.multichip_ngp_train_block(
            m_rep, n_rays=256, n_steps=3, table_mode="groups", seed=0)
        np.testing.assert_allclose(float(met_tp["loss"]),
                                   float(met_rep["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s_tp.params["table"]["hashed"]),
            np.asarray(s_rep.params["table"]["hashed"]), atol=1e-5)


class TestDPRender:
    """Render-path DP (the mechanism behind the multi-chip >=2 Mrays/s
    projection): the single-chip render program sharded over "data" must
    produce the same pixels. The reference's only scaling is host-side
    chunking (runner.py:195-228)."""

    def _setup(self, key=0, n_rays=64):
        from myc_nerfs_tpu.render import occupancy as occ
        from myc_nerfs_tpu.render.ngp_render import NGPRenderConfig

        occ_cfg = occ.OccupancyConfig()
        st = occ.init_occupancy(occ_cfg)
        st = st._replace(bitfield=jnp.ones_like(st.bitfield),
                         density_grid=jnp.full_like(st.density_grid, 0.05),
                         mean_density=jnp.asarray(0.05))
        rcfg = NGPRenderConfig(aabb_scale=1, n_coarse=32, n_samples=8)
        theta = jax.random.uniform(jax.random.PRNGKey(key), (n_rays,)) * 6.28
        rays_o = jnp.stack([0.5 + 1.4 * jnp.cos(theta),
                            0.5 + 1.4 * jnp.sin(theta),
                            jnp.full((n_rays,), 0.5)], -1)
        rays_d = 0.5 - rays_o
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        return occ_cfg, st, rcfg, rays_o, rays_d

    def test_dp_render_matches_single_chip(self, devices):
        from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, \
            NGPModelConfig
        from myc_nerfs_tpu.render.ngp_render import render_rays_ngp

        occ_cfg, st, rcfg, rays_o, rays_d = self._setup()
        cfg = NGPModelConfig(grid=HashGridConfig(n_levels=4,
                                                 desired_resolution=64.0))
        model = NGPModel(cfg)
        params = model.init(jax.random.PRNGKey(3))
        bg = jnp.ones((3,))
        ref = render_rays_ngp(occ_cfg, rcfg, model.apply, params, st,
                              rays_o, rays_d, bg)
        m = mesh_lib.make_mesh(devices)
        out = spmd.multichip_ngp_render(m, occ_cfg, rcfg, model.apply,
                                        params, st, rays_o, rays_d, bg)
        assert len(out.rgb.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(ref.depth), atol=1e-5)

    def test_dp_tp_render_group_tables_matches_single_chip(self, devices):
        """Full dp x tp render: brick3 GROUP tables sharded over "model",
        rays over "data" — pixels equal the plain single-chip brick3
        render (the shipped layout renders under TP unchanged)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from myc_nerfs_tpu.models.ngp import HashGridConfig, NGPModel, \
            NGPModelConfig
        from myc_nerfs_tpu.render.ngp_render import render_rays_ngp

        occ_cfg, st, rcfg, rays_o, rays_d = self._setup(key=1)
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        cfg = NGPModelConfig(grid=HashGridConfig(
            n_levels=7, log2_hashmap_size=14, desired_resolution=512.0),
            grid_impl="brick3")  # 1 dense + 6 hashed -> 2 triple groups
        plain = NGPModel(cfg)
        tp = spmd.GroupTPModel(cfg, m)
        key = jax.random.PRNGKey(4)
        p_plain = plain.init(key)
        p_tp = tp.init(key)
        bg = jnp.ones((3,))
        ref = render_rays_ngp(occ_cfg, rcfg, plain.apply, p_plain, st,
                              rays_o, rays_d, bg)

        rep = mesh_lib.replicated(m)

        def place(path, leaf):
            names = [str(getattr(p, "key", getattr(p, "name", "")))
                     for p in path]
            if "hashed" in names and leaf.ndim == 3:
                return jax.device_put(
                    leaf, NamedSharding(m, P("model", None, None)))
            return jax.device_put(leaf, rep)

        p_tp = jax.tree_util.tree_map_with_path(place, p_tp)
        st_rep = jax.tree_util.tree_map(
            lambda l: jax.device_put(l, rep), st)
        out = spmd.multichip_ngp_render(m, occ_cfg, rcfg, tp.apply, p_tp,
                                        st_rep, rays_o, rays_d, bg,
                                        placed=True)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                                   atol=1e-5)


class TestTensorfDPRender:
    def test_tensorf_dp_render_matches_single_chip(self, devices):
        """TensoRF eval render under ray-axis DP == the single-chip
        forward, pixel for pixel."""
        from myc_nerfs_tpu.data.synthetic import orbit_poses
        from myc_nerfs_tpu.models import tensorf as tf_m
        from myc_nerfs_tpu.train import tensorf_trainer as tt

        aabb = np.array([[-1.2, -1.2, -1.2], [1.2, 1.2, 1.2]])
        mcfg = tf_m.TensoRFConfig(density_n_comp=(2, 2, 2),
                                  app_n_comp=(4, 4, 4), app_dim=8,
                                  featureC=16, near_far=(1.5, 4.5),
                                  distance_scale=25.0, density_shift=-5.0,
                                  shading_mode="MLP_Fea")
        tcfg = tt.TensoRFTrainConfig(
            n_iters=1, batch_size=64, n_voxel_init=8 ** 3,
            n_voxel_final=8 ** 3, upsamp_list=(), update_alphamask_list=(),
            n_samples_cap=16)
        trainer = tt.TensoRFTrainer(mcfg, tcfg, aabb, jax.random.PRNGKey(2))
        H = W = 8
        poses = orbit_poses(2)
        f = 1.2 * W
        intr = jnp.broadcast_to(
            jnp.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]]),
            (2, 3, 3))
        rays = tt.build_ray_store(poses, intr, H, W)  # [128, 6]
        rgb_ref, depth_ref = trainer.render_rays(rays, chunk=128)

        m = mesh_lib.make_mesh(devices)
        rgb, depth = spmd.multichip_tensorf_render(
            m, mcfg, trainer.geom, trainer.params, trainer.buffers, rays,
            white_bg=trainer.cfg.white_bg)
        assert len(rgb.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                                   atol=1e-5)


class TestFamilyDP:
    """DP coverage beyond the NGP stack (SURVEY §2.5: DP is first-class for
    every family; the reference is single-GPU everywhere)."""

    # Parity is asserted on ONE step: after an optimizer update, Adam's
    # first-step sign sensitivity on near-zero grads amplifies f32
    # reduction-order noise into O(lr) param differences, so multi-step
    # DP-vs-replicated comparisons are chaotic by construction. A second
    # 2-step run checks the scanned path stays finite under sharding.

    def test_tensorf_dp_block_matches_replicated(self, devices):
        m = mesh_lib.make_mesh(devices, data=4, model=2)
        met_dp, params_dp = spmd.multichip_tensorf_train_block(m, n_rays=64,
                                                              n_steps=1)
        met_rep, params_rep = spmd.multichip_tensorf_train_block(
            m, n_rays=64, n_steps=1, replicate=True)
        np.testing.assert_allclose(float(met_dp["mse"]),
                                   float(met_rep["mse"]), rtol=1e-5)
        a = jax.tree_util.tree_leaves(params_dp)
        b = jax.tree_util.tree_leaves(params_rep)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=2e-5)
        met2, _ = spmd.multichip_tensorf_train_block(m, n_rays=64, n_steps=2)
        assert np.isfinite(float(met2["mse"]))

    def test_nerf_garf_image_dp_matches_replicated(self, devices):
        """Image-axis DP for BARF/GARF: per-image se(3) grads stay local,
        MLP grads psum; parity against the replicated run."""
        m = mesh_lib.make_mesh(devices)
        st_dp, met_dp = spmd.multichip_nerf_train_block(m, n_images=8,
                                                        size=10, n_steps=1)
        st_rep, met_rep = spmd.multichip_nerf_train_block(
            m, n_images=8, size=10, n_steps=1, replicate=True)
        np.testing.assert_allclose(float(met_dp["loss"]),
                                   float(met_rep["loss"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_dp.se3_refine),
                                   np.asarray(st_rep.se3_refine),
                                   rtol=2e-3, atol=2e-6)
        st2, met2 = spmd.multichip_nerf_train_block(m, n_images=8, size=10,
                                                    n_steps=2)
        assert np.isfinite(float(met2["loss"]))
        assert np.isfinite(np.asarray(st2.se3_refine)).all()
