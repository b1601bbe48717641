"""CLI smoke tests: config plumbing end-to-end on tiny synthetic runs."""
import json
import os

import numpy as np
import pytest


@pytest.fixture()
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestTrainCLI:
    def test_train_and_resume(self, in_tmp):
        from myc_nerfs_tpu.cli import train

        cfg = os.path.join(REPO, "configs/barf/demo_synthetic.yaml")
        out = train.main([f"--yaml={cfg}", "--max_iter_run=6",
                          "--freq.scalar=2", "--freq.ckpt=3", "--freq.val=100"])
        assert os.path.exists(os.path.join(out, "model.ckpt"))
        meta = json.load(open(os.path.join(out, "model.ckpt.json")))
        assert meta["step"] == 6
        # resume continues from the saved step
        out2 = train.main([f"--yaml={cfg}", "--max_iter_run=8", "--resume",
                           "--freq.scalar=2", "--freq.ckpt=100", "--freq.val=100"])
        meta2 = json.load(open(os.path.join(out2, "model.ckpt.json")))
        assert meta2["step"] == 8

    def test_garf_exports_poses(self, in_tmp):
        from myc_nerfs_tpu.cli import train

        cfg = os.path.join(REPO, "configs/barf/demo_synthetic.yaml")
        out = train.main([f"--yaml={cfg}", "--model=garf", "--max_iter_run=4",
                          "--freq.scalar=2", "--freq.ckpt=100", "--freq.val=100"])
        tj = os.path.join(out, "transform_train.json")
        data = json.load(open(tj))
        assert len(data["frames"]) == 10
        assert len(data["frames"][0]["transform_matrix"]) == 4


class TestTensoRFCLI:
    def test_txt_config_parsing(self):
        from myc_nerfs_tpu.cli.tensorf_train import parse_txt_config

        cfg = parse_txt_config(os.path.join(REPO, "configs/tensorf/Scar.txt"))
        assert cfg["model_name"] == "REFTensoRF"
        assert cfg["n_lamb_sh"] == [48, 48, 48]
        assert cfg["bbox"][0] == -5.0 and len(cfg["bbox"]) == 6
        assert cfg["normal_vector_penalty_weight"] == 0.5

    def test_train_smoke(self, in_tmp):
        from myc_nerfs_tpu.cli import tensorf_train

        out = tensorf_train.main(
            ["--config", os.path.join(REPO, "configs/tensorf/demo_synthetic.txt"),
             "--n_iters", "10"])
        assert os.path.exists(os.path.join(out, "demo.ckpt"))

    def test_train_resume_continues_schedule(self, in_tmp):
        """Kill-and-resume: global_step + opt state restored, decay schedule
        continues (ref train.py:147-164,186-190,336-360)."""
        from myc_nerfs_tpu.cli import tensorf_train

        cfg = os.path.join(REPO, "configs/tensorf/demo_synthetic.txt")
        out = tensorf_train.main(["--config", cfg, "--n_iters", "6"])
        meta = json.load(open(os.path.join(out, "demo.ckpt.json")))
        assert meta["global_step"] == 6 and meta["has_opt_state"]
        out2 = tensorf_train.main(["--config", cfg, "--n_iters", "12",
                                   "--resume", "1"])
        meta2 = json.load(open(os.path.join(out2, "demo.ckpt.json")))
        assert meta2["global_step"] == 12

    def test_render_test_split_real_data(self, in_tmp, tmp_path):
        """--render_only renders the TEST split into imgs_test_all/ even when
        the test JSON ships zero images (ref train.py:62-106)."""
        import numpy as np
        from PIL import Image

        ds = tmp_path / "scene"
        os.makedirs(ds / "train", exist_ok=True)
        rng = np.random.default_rng(0)
        frames = []
        for i in range(3):
            arr = (rng.uniform(0, 1, (10, 10, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(ds / "train" / f"r_{i}.png")
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 2.5 + 0.2 * i]
            frames.append({"file_path": f"./train/r_{i}",
                           "transform_matrix": c2w.tolist()})
        (ds / "transforms_train.json").write_text(
            json.dumps({"camera_angle_x": 0.8, "frames": frames}))
        # GT-less test split (no PNG files on disk)
        test_frames = [{"file_path": f"./test/r_{i}",
                        "transform_matrix": frames[i]["transform_matrix"]}
                       for i in range(2)]
        (ds / "transforms_test.json").write_text(
            json.dumps({"camera_angle_x": 0.8, "frames": test_frames}))

        cfgp = tmp_path / "tiny.txt"
        cfgp.write_text(
            f"expname = tiny\nbasedir = ./log\ndatadir = {ds}\n"
            "bbox = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]\n"
            "n_iters = 4\nbatch_size = 64\nN_voxel_init = 4096\n"
            "N_voxel_final = 4096\nupsamp_list = [100000]\n"
            "update_AlphaMask_list = [100000]\nnSamples = 16\n"
            "n_lamb_sigma = [2, 2, 2]\nn_lamb_sh = [4, 4, 4]\n"
            "data_dim_color = 6\nfeatureC = 16\nmodel_name = TensorVMSplit\n")
        from myc_nerfs_tpu.cli import tensorf_train

        out = tensorf_train.main(["--config", str(cfgp)])
        out = tensorf_train.main(["--config", str(cfgp), "--render_only", "1"])
        pngs = os.listdir(os.path.join(out, "imgs_test_all"))
        assert sum(p.endswith(".png") and "depth" not in p for p in pngs) == 2
        # GT-less split renders at the train split's resolution
        from PIL import Image as I

        im = I.open(os.path.join(out, "imgs_test_all", "000.png"))
        assert im.size == (10, 10)


class TestRunNetCLI:
    def test_ngp_train_smoke(self, in_tmp):
        from myc_nerfs_tpu.cli import run_net

        out = run_net.main(
            ["--config-file", os.path.join(REPO, "configs/ngp/demo_synthetic.py"),
             "--task", "train", "--steps", "5"])
        assert os.path.exists(os.path.join(out, "model.ckpt"))

    def test_malformed_val_views_skips_cadence(self, in_tmp, monkeypatch,
                                               capsys):
        """A val-views probe that raises (malformed eval config — e.g. a
        transforms_val.json with no fov key raises RuntimeError, not
        FileNotFoundError) must warn and skip the val cadence, not abort
        training. Driven on-chip with a real malformed dataset in round 4m;
        this pins the fallback at a test-sized cadence."""
        from myc_nerfs_tpu.cli import run_net

        def boom(cfg, data, H, W):
            raise RuntimeError("Couldn't read fov.")

        monkeypatch.setattr(run_net, "load_eval_views", boom)
        monkeypatch.setattr(run_net, "VAL_EVERY", 8)
        out = run_net.main(
            ["--config-file", os.path.join(REPO, "configs/ngp/demo_synthetic.py"),
             "--task", "train", "--steps", "10"])
        assert os.path.exists(os.path.join(out, "model.ckpt"))
        # the degraded-cadence condition is an ERROR on stderr (ADVICE r4:
        # keep genuine load_eval_views regressions loud and greppable)
        assert "val views unavailable" in capsys.readouterr().err

    def test_scale_aware_march_budget_default(self):
        """run_net picks the march budget from the scene scale: 20 is the
        quality-gated aabb_scale=1 default (quality_r4_log ncompact_gate);
        cascaded scenes (Easyship aabb_scale=8, configs/ngp/Easyship.py)
        need ~64 or compaction undersamples the longer ray extent."""
        import jax

        from myc_nerfs_tpu.cli import run_net
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(
            os.path.join(REPO, "configs/ngp/demo_synthetic.py"))
        trainer, _ = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert trainer.rcfg.n_compact == 20
        cfg = load_config(os.path.join(REPO, "configs/ngp/Easyship.py"))
        trainer, _ = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert trainer.rcfg.aabb_scale == 8
        assert trainer.rcfg.n_compact == 64
        # an explicit config value always wins
        cfg["n_compact"] = 48
        trainer, _ = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert trainer.rcfg.n_compact == 48

    def test_staged_march_budget_default(self):
        """At aabb_scale<=1 with a full-length budget, run_net ships the
        staged march budget (20 until decay_start, 32 after) — gated at
        the 40k reference horizon (quality_r5_log ngp40k_budget_nc_schedule
        val 33.30 vs 33.17 flat-32). Explicit n_compact disables it; the
        staged config starts in stage 1."""
        import jax

        from myc_nerfs_tpu.cli import run_net
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(
            os.path.join(REPO, "configs/ngp/demo_synthetic.py"))
        cfg["tot_train_steps"] = 40000
        cfg["expdecay"] = dict(cfg["expdecay"], decay_start=20000)
        trainer, tcfg = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert tcfg.n_compact_schedule == ((0, 20), (20000, 32))
        assert trainer.rcfg.n_compact == 20  # stage 1 applied at init
        trainer.set_host_step(20000)
        assert trainer.rcfg.n_compact == 32  # stage 2 after the boundary
        # explicit flat budget disables the schedule
        cfg["n_compact"] = 20
        _, tcfg = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert tcfg.n_compact_schedule is None
        # runs that never cross decay_start (cli smokes, probes): flat
        cfg2 = load_config(
            os.path.join(REPO, "configs/ngp/demo_synthetic.py"))
        cfg2["tot_train_steps"] = 2000
        cfg2["expdecay"] = dict(cfg2["expdecay"], decay_start=20000)
        _, tcfg2 = run_net.build_trainer(cfg2, jax.random.PRNGKey(0))
        assert tcfg2.n_compact_schedule is None

    def test_origin_nerf_train_smoke(self, in_tmp):
        """projects/nerf surface (VERDICT r3 missing #3): OriginNeRFNetworks
        + FrequencyEncoders through the registry/config path, train + test
        (reference: projects/nerf/configs/nerf_base.py:15-17, run_net.py)."""
        from myc_nerfs_tpu.cli import run_net
        from myc_nerfs_tpu.models.ori_nerf import OriginNeRFModel

        cfgp = os.path.join(REPO, "configs/nerf/demo_synthetic.py")
        out = run_net.main(["--config-file", cfgp, "--task", "train",
                            "--steps", "5"])
        assert os.path.exists(os.path.join(out, "model.ckpt"))
        # the built trainer really runs the OriginNeRF field, not NGPModel
        from myc_nerfs_tpu.core.config import load_config
        import jax

        cfg = load_config(cfgp)
        cfg["synthetic"] = True
        trainer, _ = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert isinstance(trainer.model, OriginNeRFModel)
        assert trainer.model.cfg.multires_pos == 10
        assert trainer.model.cfg.multires_dir == 4
        # test task renders through the same checkpointed state
        out2 = run_net.main(["--config-file", cfgp, "--task", "test"])
        assert os.path.isdir(os.path.join(out2, "test"))

    def test_origin_nerf_base_config_parity(self):
        """nerf_base.py value parity with the reference config
        (projects/nerf/configs/nerf_base.py:22-80)."""
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(os.path.join(REPO, "configs/nerf/nerf_base.py"))
        assert cfg["model"]["type"] == "OriginNeRFNetworks"
        assert cfg["encoder"]["pos_encoder"]["multires"] == 10
        assert cfg["encoder"]["dir_encoder"]["multires"] == 4
        assert cfg["optim"]["lr"] == 1e-2
        assert cfg["tot_train_steps"] == 200000
        assert cfg["background_color"] == [0, 0, 0]
        assert cfg["n_rays_per_batch"] == 512

    def test_scene_config_inheritance(self):
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(os.path.join(REPO, "configs/ngp/Easyship.py"))
        # _base_ values inherited, scene values override
        assert cfg["optim"]["lr"] == 1e-1
        assert cfg["dataset"]["train"]["aabb_scale"] == 8
        assert cfg["load_ckpt"] is True
        assert cfg["hash_func"].startswith("p0 ^")


class TestScenesDriver:
    def test_synthetic_umbrella_produces_result_pngs(self, in_tmp):
        """The competition driver (test.py parity) must leave renderable
        PNGs under result/<scene>/ (test.py:16-37 copies imgs_test_all and
        logs/<scene>/test into result/)."""
        from myc_nerfs_tpu.cli import test_scenes

        out = test_scenes.main(["--synthetic",
                                "--configs_root",
                                os.path.join(REPO, "configs")])
        t = os.listdir(os.path.join(out, "demo_tensorf"))
        n = os.listdir(os.path.join(out, "demo_ngp"))
        assert any(p.endswith(".png") for p in t)
        assert any(p.endswith(".png") for p in n)

    def test_ngp_render_task_writes_video(self, in_tmp):
        """--task render: spherical-path video (Runner.render parity,
        runner.py:105-125)."""
        from myc_nerfs_tpu.cli import run_net

        cfgp = os.path.join(REPO, "configs/ngp/demo_synthetic.py")
        run_net.main(["--config-file", cfgp, "--task", "train",
                      "--steps", "5"])
        out = run_net.main(["--config-file", cfgp, "--task", "render"])
        has_mp4 = os.path.exists(os.path.join(out, "demo.mp4"))
        has_frames = os.path.isdir(os.path.join(out, "demo")) and \
            len(os.listdir(os.path.join(out, "demo"))) > 0
        assert has_mp4 or has_frames


class TestFamilyTrainer:
    """build_family_trainer wires the model family from model_name.

    Shared by the CLI and scripts/tensorf_budget.py: a Scar (REFTensoRF) or
    Scarf (NerfPlusPlus) budget run must train the real variant — heads /
    background net present, trained, and carried through checkpoints — not
    silently fall back to the base TensorVMSplit (ref train.py:253-257).
    """

    def _tiny(self, model_name):
        return {"model_name": model_name, "n_iters": 4, "batch_size": 32,
                "N_voxel_init": 4096, "N_voxel_final": 4096,
                "upsamp_list": [100000], "update_AlphaMask_list": [100000],
                "nSamples": 16, "n_lamb_sigma": [2, 2, 2],
                "n_lamb_sh": [4, 4, 4], "data_dim_color": 6, "featureC": 16,
                "normal_vector_penalty_weight": 0.5,
                "bg_freq": 2, "bg_view_freq": 2, "bg_D": 2, "radii": 5.0,
                "bg_samples": 8, "near": 0.5, "far": 6.0}

    def _build(self, a):
        import jax
        from myc_nerfs_tpu.cli.tensorf_train import (build_configs,
                                                     build_family_trainer)

        model_cfg, train_cfg = build_configs(a)
        aabb = np.asarray([[-1.2] * 3, [1.2] * 3], np.float32)
        return build_family_trainer(a, model_cfg, train_cfg, aabb,
                                    jax.random.PRNGKey(0))

    def _rays(self):
        import jax
        from myc_nerfs_tpu.data.synthetic import make_scene
        from myc_nerfs_tpu.train import tensorf_trainer as tt

        scene = make_scene(n_views=2, H=8, W=8)
        rays = tt.build_ray_store(scene.poses, scene.intr, 8, 8)
        return rays, scene.images.reshape(-1, 3), jax.random.PRNGKey(3)

    @pytest.mark.parametrize("model_name,extra_key", [
        ("REFTensoRF", "normal_linear"), ("NerfPlusPlus", "bg_net")])
    def test_variant_params_train_and_roundtrip(self, in_tmp, model_name,
                                                extra_key):
        import jax
        import jax.numpy as jnp
        from myc_nerfs_tpu.cli.tensorf_train import (restore_tensorf_ckpt,
                                                     save_tensorf_ckpt)

        a = self._tiny(model_name)
        trainer = self._build(a)
        assert extra_key in trainer.params
        rays, rgbs, key = self._rays()
        before = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                        trainer.params[extra_key])
        trainer.train(rays, rgbs, n_iters=4, key=key)
        after = trainer.params[extra_key]
        moved = any(
            not np.allclose(np.asarray(b), np.asarray(x))
            for b, x in zip(jax.tree_util.tree_leaves(before),
                            jax.tree_util.tree_leaves(after)))
        assert moved, f"{extra_key} received no gradient"
        save_tensorf_ckpt("fam.msgpack", trainer, model_name)
        fresh = self._build(a)
        restore_tensorf_ckpt("fam.msgpack", fresh, for_training=True)
        assert fresh.global_step == 4
        for x, y in zip(jax.tree_util.tree_leaves(after),
                        jax.tree_util.tree_leaves(fresh.params[extra_key])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


class TestRunNetSynthetic:
    """run_net's data-free mode: held-out val views, fixed bg, GradScaler
    skip wiring (reference: runner.py:66-84, nerf_base.py:80 fp16)."""

    def test_synthetic_val_views_held_out(self):
        from myc_nerfs_tpu.cli import run_net

        cfg = {"synthetic": True, "synthetic_size": 16, "synthetic_views": 4,
               "synthetic_val_views": 2}
        data, H, W = run_net.load_data(cfg)
        assert data.n_images == 4 and H == 16 and W == 16
        # pre-composited RGB scenes pin the bg they were rendered over
        assert data.fixed_bg == (1.0, 1.0, 1.0)
        imgs, c2ws, intrs = run_net.load_eval_views(cfg, data, H, W)
        assert len(c2ws) == 2 and imgs.shape == (2, 16, 16, 3)
        # the held-out images match none of the train images
        for v in imgs:
            assert all(not np.allclose(v, t) for t in data.images)
        # the scene is built once and carried on cfg like the reference's
        # cfg.dataset_obj (runner.py:26)
        assert cfg["_synthetic_scene_obj"].images.shape[0] == 6

    def test_synthetic_no_val_views_keeps_smoke_behavior(self):
        from myc_nerfs_tpu.cli import run_net

        cfg = {"synthetic": True, "synthetic_size": 16, "synthetic_views": 4}
        data, H, W = run_net.load_data(cfg)
        imgs, c2ws, intrs = run_net.load_eval_views(cfg, data, H, W)
        assert len(c2ws) == 4
        np.testing.assert_allclose(np.asarray(imgs), data.images[:4])

    def test_skip_nonfinite_wiring(self):
        import jax

        from myc_nerfs_tpu.cli import run_net
        from myc_nerfs_tpu.core.config import load_config

        cfgp = os.path.join(REPO, "configs/nerf/demo_synthetic.py")
        cfg = load_config(cfgp)
        assert cfg["fp16"] is False
        _, tcfg = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert tcfg.skip_nonfinite is False
        cfg["fp16"] = True  # reference: fp16 implies the GradScaler skip
        _, tcfg = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert tcfg.skip_nonfinite is True
        cfg["skip_nonfinite"] = False  # explicit key wins
        _, tcfg = run_net.build_trainer(cfg, jax.random.PRNGKey(0))
        assert tcfg.skip_nonfinite is False

    def test_budget_synthetic_config(self):
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(os.path.join(REPO,
                                       "configs/nerf/budget_synthetic.py"))
        assert cfg["model"]["type"] == "OriginNeRFNetworks"
        assert cfg["synthetic_scene"] == "detail"
        assert cfg["synthetic_views"] == 36
        assert cfg["synthetic_val_views"] == 3
        assert cfg["tot_train_steps"] == 24000
        assert cfg["optim"]["lr"] == 1e-3
        assert cfg["fp16"] is True  # inherited -> skip_nonfinite active
        # ExpDecay boundary inherited from nerf_base (decay_start 20000)
        assert cfg["expdecay"]["decay_start"] == 20000
