"""Brick-packed grid encoding vs the exact vertex-level hash encoding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myc_nerfs_tpu.models import ngp
from myc_nerfs_tpu.ops import brick_grid as bg


def pack_dense_brick_table(cfg, levels_b, classic_table, levels_c):
    """Build the brick layout from a canonical vertex table (dense levels):
    brick[b, f*128 + v] = classic[vertex(b, v), f]. Out-of-range vertices
    (beyond the level's resolution) are zero-filled — their hat weights are
    zero for in-range samples."""
    classic = np.asarray(classic_table)
    tables = []
    for lv in range(cfg.n_levels):
        assert levels_b.dense[lv], "packing helper only supports dense levels"
        R = levels_c.resolutions[lv]
        off = levels_c.offsets[lv]
        bx, by, bz = levels_b.brick_dims[lv]
        rows = np.zeros((levels_b.n_bricks[lv], bg.ROW_VERTS * cfg.n_features),
                        np.float32)
        for b in range(bx * by * bz):
            bxi, byi, bzi = b % bx, (b // bx) % by, b // (bx * by)
            for v in range(bg.BRICK_VERTS ** 3):
                i, j, k = (v // 25, (v // 5) % 5, v % 5)
                x, y, z = bxi * 4 + i, byi * 4 + j, bzi * 4 + k
                if x >= R or y >= R or z >= R:
                    continue
                cidx = off + x + y * R + z * R * R
                for f in range(cfg.n_features):
                    rows[b, f * bg.ROW_VERTS + v] = classic[cidx, f]
        tables.append(jnp.asarray(rows))
    return tables


class TestBrickVsHash:
    def test_dense_levels_exact_match(self):
        cfg = ngp.HashGridConfig(n_levels=2, n_features=2, base_resolution=16,
                                 log2_hashmap_size=19, desired_resolution=24)
        levels_c = ngp.compute_levels(cfg)
        levels_b = bg.compute_brick_levels(cfg)
        assert all(levels_b.dense)
        assert levels_b.resolutions == levels_c.resolutions
        key = jax.random.PRNGKey(0)
        classic = ngp.init_hash_table(key, cfg, levels_c)
        brick = pack_dense_brick_table(cfg, levels_b, classic, levels_c)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (256, 3),
                                 minval=0.02, maxval=0.9)
        out_c = ngp.hash_encode(classic, pos, cfg, levels_c)
        out_b = bg.brick_encode(brick, pos, cfg, levels_b)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_c),
                                   atol=1e-6)

    def test_hashed_level_flags(self):
        cfg = ngp.HashGridConfig(n_levels=16, n_features=2,
                                 log2_hashmap_size=19)
        lv = bg.compute_brick_levels(cfg)
        assert lv.bricks_per_level == 4096
        assert lv.dense[0] and not lv.dense[-1]
        # hashed-level param budget identical to the reference cap; dense
        # levels use their exact brick count
        assert lv.bricks_per_level * bg.ROW_VERTS == 1 << 19
        assert lv.n_bricks[0] == lv.brick_dims[0][0] ** 3
        assert lv.n_bricks[-1] == 4096

    def test_gradients_flow_and_finite(self):
        cfg = ngp.HashGridConfig(n_levels=4, n_features=2,
                                 log2_hashmap_size=12, desired_resolution=64)
        levels = bg.compute_brick_levels(cfg)
        table = bg.init_brick_table(jax.random.PRNGKey(0), cfg, levels)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

        def loss(t):
            return (bg.brick_encode(t, pos, cfg, levels) ** 2).sum()

        g = jax.grad(loss)(table)
        for glv in g:
            assert np.isfinite(np.asarray(glv)).all()
        assert sum(float(jnp.abs(glv).sum()) for glv in g) > 0

    def test_grad_matches_hash_path_on_dense(self):
        """d loss / d table transported through the packing must equal the
        classic gradient — i.e. the wide-scatter backward accumulates the
        same per-vertex contributions."""
        cfg = ngp.HashGridConfig(n_levels=1, n_features=2, base_resolution=8,
                                 log2_hashmap_size=19, desired_resolution=8)
        levels_c = ngp.compute_levels(cfg)
        levels_b = bg.compute_brick_levels(cfg)
        key = jax.random.PRNGKey(0)
        classic = ngp.init_hash_table(key, cfg, levels_c)
        brick = pack_dense_brick_table(cfg, levels_b, classic, levels_c)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (32, 3),
                                 minval=0.05, maxval=0.85)
        g_c = jax.grad(lambda t: ngp.hash_encode(t, pos, cfg, levels_c).sum())(classic)
        g_b = jax.grad(lambda t: bg.brick_encode(t, pos, cfg, levels_b).sum())(brick)
        # transport the brick gradient back to canonical vertices by summing
        # duplicated slots (dense packing duplicates face vertices)
        acc = np.zeros_like(np.asarray(g_c))
        gb = np.asarray(g_b[0])
        R = levels_c.resolutions[0]
        bx, by, bz = levels_b.brick_dims[0]
        for b in range(bx * by * bz):
            bxi, byi, bzi = b % bx, (b // bx) % by, b // (bx * by)
            for v in range(bg.BRICK_VERTS ** 3):
                i, j, k = (v // 25, (v // 5) % 5, v % 5)
                x, y, z = bxi * 4 + i, byi * 4 + j, bzi * 4 + k
                if x >= R or y >= R or z >= R:
                    continue
                cidx = x + y * R + z * R * R
                for f in range(cfg.n_features):
                    acc[cidx, f] += gb[b, f * bg.ROW_VERTS + v]
        np.testing.assert_allclose(acc, np.asarray(g_c), atol=1e-5)

    def test_ngp_model_brick_impl(self):
        mcfg = ngp.NGPModelConfig(
            grid=ngp.HashGridConfig(n_levels=4, log2_hashmap_size=12,
                                    desired_resolution=64),
            grid_impl="brick")
        model = ngp.NGPModel(mcfg)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.full((8, 3), 0.5), jnp.full((8, 3), 0.5))
        assert out.shape == (8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestOneHotRouting:
    def test_onehot_path_matches_gather_path(self, monkeypatch):
        """Levels at or below ONEHOT_MAX_ROWS route row selection through
        an MXU one-hot matmul (PERF_NOTES §5b); outputs and table gradients
        must match the plain-gather path exactly."""
        cfg = ngp.HashGridConfig(n_levels=4, n_features=2, base_resolution=16,
                                 log2_hashmap_size=16,
                                 desired_resolution=128.0)
        levels = bg.compute_brick_levels(cfg)
        tables = bg.init_brick_table(jax.random.PRNGKey(0), cfg, levels)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

        def run():
            def loss(tabs):
                out = bg.brick_encode(tabs, pos, cfg, levels)
                return (out * out).sum(), out
            (l, out), grads = jax.value_and_grad(loss, has_aux=True)(tables)
            return out, grads

        monkeypatch.setattr(bg, "ONEHOT_MAX_ROWS", 0)      # all gather
        out_g, grads_g = run()
        monkeypatch.setattr(bg, "ONEHOT_MAX_ROWS", 10 ** 9)  # all one-hot
        out_o, grads_o = run()
        np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_g),
                                   rtol=2e-5, atol=2e-6)
        for a, b in zip(grads_o, grads_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


class TestPairedBricks:
    """grid_impl='brick2': adjacent hashed levels share one double-width row
    (round-3 scatter/gather row-issue lever)."""

    def test_group_structure_and_budget_parity(self):
        cfg = ngp.HashGridConfig(n_levels=16, n_features=2,
                                 log2_hashmap_size=19)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels)
        flat = [lv for g in groups.groups for lv in g]
        assert sorted(flat) == list(range(16))
        for g in groups.groups:
            if len(g) == 2:
                c, f = g
                assert f == c + 1
                assert not levels.dense[c] and not levels.dense[f]
                assert levels.scales[f] / levels.scales[c] >= 4.0 / 3.0
            else:
                assert len(g) == 1
        # at least 5 pairs at the reference config
        assert sum(1 for g in groups.groups if len(g) == 2) >= 5
        # parameter budget identical to per-level bricks
        t1 = bg.init_brick_table(jax.random.PRNGKey(0), cfg, levels)
        t2 = bg.init_paired_table(jax.random.PRNGKey(0), cfg, levels, groups)
        assert sum(t.size for t in t1) == sum(t.size for t in t2)

    def test_all_dense_matches_brick_encode(self):
        cfg = ngp.HashGridConfig(n_levels=2, n_features=2, base_resolution=16,
                                 log2_hashmap_size=19, desired_resolution=24)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels)
        assert all(len(g) == 1 for g in groups.groups)
        table = bg.init_brick_table(jax.random.PRNGKey(0), cfg, levels)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                                 minval=0.02, maxval=0.9)
        out_b = bg.brick_encode(table, pos, cfg, levels)
        out_p = bg.paired_encode(table, pos, cfg, levels, groups)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_b),
                                   atol=1e-6)

    def test_pair_window_exact_on_linear_function(self):
        """Within one fine brick, both members' interpolation must reproduce
        an affine function of the cell coordinates exactly (the coarse
        window-base math base_c = floor((4B-0.5)/r + 0.5) is what's under
        test)."""
        cfg = ngp.HashGridConfig(n_levels=2, n_features=2, base_resolution=64,
                                 log2_hashmap_size=12, desired_resolution=96)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels)
        assert groups.groups == ((0, 1),)
        lv_c, lv_f = 0, 1
        s_c, s_f = levels.scales[lv_c], levels.scales[lv_f]
        r = s_f / s_c
        B = np.array([5, 7, 9])
        F = cfg.n_features
        lin = [(0.3, -0.2, 0.11, 1.7), (-0.07, 0.5, 0.23, -0.4),
               (0.9, 0.04, -0.31, 0.0), (0.13, -0.6, 0.05, 2.2)]

        def g(coef, v):
            a, b, c, d = coef
            return a * v[..., 0] + b * v[..., 1] + c * v[..., 2] + d

        base_c = np.floor((4 * B - 0.5) / r + 0.5)
        rows = np.zeros((levels.n_bricks[lv_f], 2 * F * bg.ROW_VERTS),
                        np.float32)
        bid = int((np.uint32(B[0]) * np.uint32(bg.HASH_PRIMES[0])
                   ^ np.uint32(B[1]) * np.uint32(bg.HASH_PRIMES[1])
                   ^ np.uint32(B[2]) * np.uint32(bg.HASH_PRIMES[2]))
                  & np.uint32(levels.n_bricks[lv_f] - 1))
        for v in range(bg.BRICK_VERTS ** 3):
            ijk = np.array([v // 25, (v // 5) % 5, v % 5])
            for f in range(F):
                # member 0 = coarse block, member 1 = fine block
                rows[bid, 0 * F * 128 + f * 128 + v] = g(lin[f], base_c + ijk)
                rows[bid, 1 * F * 128 + f * 128 + v] = g(lin[F + f],
                                                         4 * B + ijk)
        pos = ((4 * B - 0.45) / s_f
               + np.random.default_rng(3).uniform(0, 3.8 / s_f, (64, 3)))
        pos = jnp.asarray(pos, jnp.float32)
        out = bg.paired_encode([jnp.asarray(rows)], pos, cfg, levels, groups)
        x_c = np.asarray(pos) * s_c + 0.5
        x_f = np.asarray(pos) * s_f + 0.5
        for f in range(F):
            np.testing.assert_allclose(np.asarray(out[:, lv_c * F + f]),
                                       g(lin[f], x_c), rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(out[:, lv_f * F + f]),
                                       g(lin[F + f], x_f), rtol=2e-4,
                                       atol=2e-4)

    def test_grads_flow_and_model_smoke(self):
        cfg = ngp.HashGridConfig(n_levels=6, n_features=2,
                                 log2_hashmap_size=12, desired_resolution=128)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels)
        assert any(len(g) == 2 for g in groups.groups)
        table = bg.init_paired_table(jax.random.PRNGKey(0), cfg, levels,
                                     groups)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

        def loss(t):
            return (bg.paired_encode(t, pos, cfg, levels, groups) ** 2).sum()

        grads = jax.grad(loss)(table)
        for gt in grads:
            assert np.isfinite(np.asarray(gt)).all()
        assert sum(float(jnp.abs(gt).sum()) for gt in grads) > 0

        mcfg = ngp.NGPModelConfig(
            grid=ngp.HashGridConfig(n_levels=6, log2_hashmap_size=12,
                                    desired_resolution=128),
            grid_impl="brick2")
        model = ngp.NGPModel(mcfg)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.full((8, 3), 0.5), jnp.full((8, 3), 0.5))
        assert out.shape == (8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestTripleBricks:
    """group_size=3 ('brick3'): three levels per row, 768-float rows — the
    probe_r3b bandwidth sweet spot."""

    def test_triple_budget_parity_L16(self):
        cfg = ngp.HashGridConfig(n_levels=16, n_features=2,
                                 log2_hashmap_size=19)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels, group_size=3)
        flat = sorted(lv for g in groups.groups for lv in g)
        assert flat == list(range(16))
        assert any(len(g) == 3 for g in groups.groups)
        t1 = bg.init_brick_table(jax.random.PRNGKey(0), cfg, levels)
        t3 = bg.init_paired_table(jax.random.PRNGKey(0), cfg, levels, groups)
        assert sum(t.size for t in t1) == sum(t.size for t in t3)

    def test_triple_window_exact_on_linear_function(self):
        cfg = ngp.HashGridConfig(n_levels=3, n_features=1, base_resolution=64,
                                 log2_hashmap_size=12,
                                 desired_resolution=128)
        levels = bg.compute_brick_levels(cfg)
        groups = bg.compute_level_groups(levels, group_size=3)
        assert groups.groups == ((0, 1, 2),)
        key_lv = 2
        s = levels.scales
        B = np.array([7, 11, 3])
        lin = [(0.3, -0.2, 0.11, 1.7), (-0.07, 0.5, 0.23, -0.4),
               (0.9, 0.04, -0.31, 0.2)]

        def g(coef, v):
            a, b, c, d = coef
            return a * v[..., 0] + b * v[..., 1] + c * v[..., 2] + d

        rows = np.zeros((levels.n_bricks[key_lv], 3 * bg.ROW_VERTS),
                        np.float32)
        bid = int((np.uint32(B[0]) * np.uint32(bg.HASH_PRIMES[0])
                   ^ np.uint32(B[1]) * np.uint32(bg.HASH_PRIMES[1])
                   ^ np.uint32(B[2]) * np.uint32(bg.HASH_PRIMES[2]))
                  & np.uint32(levels.n_bricks[key_lv] - 1))
        for j, lv in enumerate((0, 1, 2)):
            r = s[key_lv] / s[lv]
            base = (4 * B if lv == key_lv
                    else np.floor((4 * B - 0.5) / r + 0.5))
            for v in range(bg.BRICK_VERTS ** 3):
                ijk = np.array([v // 25, (v // 5) % 5, v % 5])
                rows[bid, j * 128 + v] = g(lin[j], base + ijk)
        pos = ((4 * B - 0.45) / s[key_lv]
               + np.random.default_rng(5).uniform(0, 3.8 / s[key_lv],
                                                  (64, 3)))
        pos = jnp.asarray(pos, jnp.float32)
        out = bg.paired_encode([jnp.asarray(rows)], pos, cfg, levels, groups)
        for lv in range(3):
            x = np.asarray(pos) * s[lv] + 0.5
            np.testing.assert_allclose(np.asarray(out[:, lv]), g(lin[lv], x),
                                       rtol=3e-4, atol=3e-4)

    def test_brick3_model_smoke(self):
        mcfg = ngp.NGPModelConfig(
            grid=ngp.HashGridConfig(n_levels=6, log2_hashmap_size=12,
                                    desired_resolution=128),
            grid_impl="brick3")
        model = ngp.NGPModel(mcfg)
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, jnp.full((8, 3), 0.5), jnp.full((8, 3), 0.5))
        assert out.shape == (8, 4)
        assert np.isfinite(np.asarray(out)).all()
