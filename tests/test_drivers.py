"""End-to-end CLI driver tests (subprocess, CPU, tiny overrides)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = [
    "model.num_cams=2", "model.num_frames=2", "model.embed_dims=64",
    "model.num_query=12", "model.num_clusters=2", "model.image_hw=(64,128)",
    "model.depth_bins=16", "model.bev_size=(32,32)", "model.max_gt=8",
    "radar.max_points=64", "batch_size_per_chip=1", "depth.num_bins=16",
]


def _run(cmd, timeout=540):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout
    )


@pytest.mark.slow
def test_val_driver_synthetic(tmp_path):
    r = _run([
        sys.executable, "val.py",
        "--config", "racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py",
        "--synthetic", "--max-samples", "2", "--override", *TINY,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "samples/s" in r.stdout
    assert '"NDS"' in r.stdout  # metrics json printed


@pytest.mark.slow
def test_train_driver_synthetic(tmp_path):
    r = _run([
        sys.executable, "train.py",
        "--config", "racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py",
        "--synthetic", "--max-steps", "1",
        "--work-dir", str(tmp_path / "wd"),
        "--override", *TINY, "optimizer.warmup_steps=1",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training done" in r.stdout
    assert (tmp_path / "wd" / "checkpoints").exists()


@pytest.mark.slow
def test_val_driver_streaming(tmp_path):
    r = _run([
        sys.executable, "val.py",
        "--config", "racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py",
        "--synthetic", "--streaming", "--max-samples", "2", "--override", *TINY,
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "samples/s" in r.stdout
