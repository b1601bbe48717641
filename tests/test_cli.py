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


class TestRunNetCLI:
    def test_ngp_train_smoke(self, in_tmp):
        from myc_nerfs_tpu.cli import run_net

        out = run_net.main(
            ["--config-file", os.path.join(REPO, "configs/ngp/demo_synthetic.py"),
             "--task", "train", "--steps", "5"])
        assert os.path.exists(os.path.join(out, "model.ckpt"))

    def test_scene_config_inheritance(self):
        from myc_nerfs_tpu.core.config import load_config

        cfg = load_config(os.path.join(REPO, "configs/ngp/Easyship.py"))
        # _base_ values inherited, scene values override
        assert cfg["optim"]["lr"] == 1e-1
        assert cfg["dataset"]["train"]["aabb_scale"] == 8
        assert cfg["load_ckpt"] is True
        assert cfg["hash_func"].startswith("p0 ^")
