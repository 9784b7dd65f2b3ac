"""PR/TP-curve diagnostics (tools/eval_plots.py, the reference render.py set)."""

import os

import matplotlib

matplotlib.use("Agg")

import numpy as np

from racformer_tpu.eval.metrics import nuscenes_metrics
from racformer_tpu.tools.eval_plots import render_all
from tests.test_metrics import make_perfect_case


def test_render_all_writes_plot_set(tmp_path):
    preds, gts = make_perfect_case(n_samples=3, n_per=8)
    # degrade some predictions so the curves are nontrivial
    rng = np.random.default_rng(1)
    for p in preds:
        p["bboxes"][:, 0] += rng.normal(scale=0.8, size=len(p["bboxes"]))
        p["scores"] = rng.uniform(0.1, 1.0, size=len(p["scores"]))
    m = nuscenes_metrics(preds, gts, return_curves=True)
    assert m["curves"] and m["per_class"]

    out = tmp_path / "plots"
    render_all(m, str(out))
    files = os.listdir(out)
    assert "summary.png" in files
    assert "metrics_table.tex" in files
    assert any(f.startswith("dist_pr_") for f in files)
    # at least one per-class pair
    assert any(f.endswith("_pr.png") for f in files)
    assert any(f.endswith("_tp.png") for f in files)
    tex = (out / "metrics_table.tex").read_text()
    assert "Mean" in tex and "AP & ATE" in tex

    # scalar-only output unchanged when curves are off
    m2 = nuscenes_metrics(preds, gts)
    for k, v in m2.items():
        assert abs(m[k] - v) < 1e-12
