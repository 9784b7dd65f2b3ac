"""Tests for Hungarian matching and detection/depth losses."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from racformer_tpu.train.matching import hungarian_assign, match_cost
from racformer_tpu.train.losses import (
    categorical_focal_loss,
    depth_loss,
    detection_loss,
    sigmoid_focal_loss,
)


def test_hungarian_matches_scipy(rng):
    cost = rng.normal(size=(3, 10, 4)).astype(np.float32)
    got = np.asarray(hungarian_assign(jnp.asarray(cost)))
    for s in range(3):
        rows, cols = linear_sum_assignment(cost[s])
        want = np.zeros(4, np.int32)
        want[cols] = rows
        np.testing.assert_array_equal(got[s], want)


def test_match_cost_invalid_columns(rng):
    Q, G = 8, 4
    cls = rng.normal(size=(Q, 10)).astype(np.float32)
    box = rng.normal(size=(Q, 10)).astype(np.float32)
    gt = np.abs(rng.normal(size=(G, 9))).astype(np.float32) + 0.5
    lab = rng.integers(0, 10, size=(G,))
    mask = np.array([True, True, False, False])
    c = np.asarray(match_cost(cls, box, gt, lab, mask, [2, 2, 1, 1, 1, 1, 1, 1, 1, 1]))
    assert (c[:, 2:] >= 1e7).all()
    assert np.isfinite(c[:, :2]).all() and (np.abs(c[:, :2]) < 1e4).all()
    # an invalid column can never beat a valid one in assignment
    m = np.asarray(hungarian_assign(jnp.asarray(c)))
    assert m.shape == (G,)


def test_match_cost_cartesian(rng):
    """Non-polar HungarianAssigner3D cost (ref hungarian_assigner_3d.py):
    no angular term, with_velo=False drops the velocity dims."""
    from racformer_tpu.train.matching import match_cost_cartesian

    Q, G = 8, 4
    cls = rng.normal(size=(Q, 10)).astype(np.float32)
    box = rng.normal(size=(Q, 10)).astype(np.float32)
    gt = np.abs(rng.normal(size=(G, 9))).astype(np.float32) + 0.5
    lab = rng.integers(0, 10, size=(G,))
    mask = np.ones(G, bool)
    cw = np.ones(10, np.float32)
    c_velo = np.asarray(match_cost_cartesian(cls, box, gt, lab, mask, cw))
    c_novel = np.asarray(match_cost_cartesian(cls, box, gt, lab, mask, cw,
                                              with_velo=False))
    assert np.isfinite(c_velo).all()
    # removing velocity dims can only shrink the L1 part
    assert (c_novel <= c_velo + 1e-5).all()
    # manual check of one cell: focal cls + 0.25 * L1 over first 8 dims
    from racformer_tpu.ops.bbox_codec import normalize_bbox as nb

    gtn = np.asarray(nb(jnp.asarray(gt)))
    p = 1 / (1 + np.exp(-cls[0, lab[1]]))
    cls_c = 2.0 * ((-np.log(p + 1e-12) * 0.25 * (1 - p) ** 2)
                   - (-np.log(1 - p + 1e-12) * 0.75 * p ** 2))
    l1 = 0.25 * np.abs(box[0, :8] - gtn[1, :8]).sum()
    np.testing.assert_allclose(c_novel[0, 1], cls_c + l1, rtol=1e-4)
    # solver accepts it
    m = np.asarray(hungarian_assign(jnp.asarray(c_novel)))
    assert m.shape == (G,)


def test_sigmoid_focal_background():
    """Background label (== num_classes) has no positive term."""
    logits = jnp.full((5, 10), -10.0)
    bg = jnp.full((5,), 10, jnp.int32)
    loss = sigmoid_focal_loss(logits, bg, 10)
    assert float(loss.sum()) < 1e-3  # confident negatives -> tiny loss
    fg = jnp.zeros((5,), jnp.int32)
    loss_fg = sigmoid_focal_loss(logits, fg, 10)
    assert float(loss_fg.sum()) > 1.0  # missed positives -> large loss


def test_categorical_focal_matches_reference_formula(rng):
    logits = rng.normal(size=(6, 96)).astype(np.float32)
    labels = rng.integers(0, 96, size=(6,))
    got = np.asarray(categorical_focal_loss(jnp.asarray(logits), jnp.asarray(labels)))
    # kornia formula: -alpha * (1 - p_t)^gamma * log(p_t)
    import torch
    import torch.nn.functional as F

    lt = torch.from_numpy(logits)
    logp = F.log_softmax(lt, -1)
    pt = logp.exp()[np.arange(6), labels]
    want = (-0.25 * (1 - pt) ** 2.0 * logp[np.arange(6), labels]).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_depth_loss_finite(rng):
    logits = rng.normal(size=(1, 2, 4, 4, 16)).astype(np.float32)
    gt = rng.uniform(0, 60, size=(1, 2, 64, 64)).astype(np.float32)
    gt[0, 0, :32] = 0.0  # missing depths
    l = depth_loss(jnp.asarray(logits), jnp.asarray(gt), num_bins=16, downsample=16)
    assert np.isfinite(float(l)) and float(l) >= 0


def test_detection_loss_runs(rng):
    L, B, Q, C, G = 2, 2, 16, 10, 4
    outs = {
        "all_cls_scores": jnp.asarray(rng.normal(size=(L, B, Q, C)), jnp.float32),
        "all_bbox_preds": jnp.asarray(rng.normal(size=(L, B, Q, 10)), jnp.float32),
    }
    gt = jnp.asarray(np.abs(rng.normal(size=(B, G, 9))) + 0.5, jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, size=(B, G)))
    mask = jnp.asarray(np.array([[1, 1, 0, 0], [1, 1, 1, 0]], bool))
    losses = detection_loss(outs, gt, labels, mask)
    assert "loss_cls" in losses and "d0.loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # perfect-background case: zero GT still finite
    losses0 = detection_loss(outs, gt, labels, jnp.zeros_like(mask))
    assert np.isfinite(float(losses0["loss_total"]))


@pytest.mark.slow
def test_hungarian_optimal_cost_randomized(rng):
    """The in-graph JV solver must achieve scipy's optimal total cost on many
    random instances (allowing tied alternative assignments)."""
    for trial in range(20):
        Q = int(rng.integers(4, 40))
        G = int(rng.integers(1, min(Q, 12) + 1))
        cost = rng.normal(size=(Q, G)).astype(np.float32) * 10
        got = np.asarray(hungarian_assign(jnp.asarray(cost[None])))[0]
        rows, cols = linear_sum_assignment(cost)
        want_total = cost[rows, cols].sum()
        # matched queries must be distinct and achieve the optimal cost
        assert len(set(got.tolist())) == G
        got_total = cost[got, np.arange(G)].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-4)


def test_accum_pos_norm_matches_fused_full_batch(rng):
    """Cross-microbatch normalization (VERDICT r4 item 4): with `pos_norm` =
    max(global positives, 1) / A, the mean of per-microbatch set losses is
    EXACTLY the fused full-batch loss — the per-microbatch-count deviation
    (7.4% at sparse-GT fixtures, docs/PARITY.md) is gone by construction."""
    L, B, Q, C, G, A = 2, 4, 16, 10, 5, 2
    outs = {
        "all_cls_scores": jnp.asarray(rng.normal(size=(L, B, Q, C)), jnp.float32),
        "all_bbox_preds": jnp.asarray(rng.normal(size=(L, B, Q, 10)), jnp.float32),
        "dn_cls_scores": jnp.asarray(rng.normal(size=(L, B, 2 * G, C)), jnp.float32),
        "dn_bbox_preds": jnp.asarray(rng.normal(size=(L, B, 2 * G, 10)), jnp.float32),
    }
    gt = jnp.asarray(np.abs(rng.normal(size=(B, G, 9))) + 0.5, jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, size=(B, G)))
    # deliberately unbalanced positives across microbatches (the deviation's
    # worst case): rows 0/2 -> micro 0, rows 1/3 -> micro 1 (interleaved)
    mask = jnp.asarray(
        np.array([[1, 1, 1, 1, 1], [1, 0, 0, 0, 0],
                  [1, 1, 1, 0, 0], [0, 0, 0, 0, 0]], bool))
    dn_valid = jnp.tile(mask, (1, 2))
    outs["dn_meta"] = {"dn_valid": dn_valid}

    fused = detection_loss(outs, gt, labels, mask)

    pos_norm = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0) / A

    def micro(m):
        rows = np.arange(m, B, A)  # interleaved split, as train/step.py
        o = {k: (v[:, rows] if k != "dn_meta"
                 else {"dn_valid": dn_valid[rows]}) for k, v in outs.items()}
        return detection_loss(o, gt[rows], labels[rows], mask[rows],
                              pos_norm=pos_norm)

    parts = [micro(m) for m in range(A)]
    for k in fused:
        acc = sum(p[k] for p in parts) / A
        np.testing.assert_allclose(float(acc), float(fused[k]), rtol=1e-6,
                                   err_msg=k)


def test_accum_fg_norm_matches_fused_depth_loss(rng):
    from racformer_tpu.train.losses import depth_fg_count

    A = 2
    logits = jnp.asarray(rng.normal(size=(4, 2, 4, 4, 16)), jnp.float32)
    gt = np.asarray(rng.uniform(0, 60, size=(4, 2, 64, 64)), np.float32)
    gt[0] = 0.0  # one sample with NO lidar hits at all
    gt[2, :, ::2] = 0.0
    gt = jnp.asarray(gt)

    fused = depth_loss(logits, gt, num_bins=16, downsample=16)
    fg_norm = jnp.maximum(
        depth_fg_count(gt, num_bins=16, downsample=16), 1.0) / A
    acc = sum(
        depth_loss(logits[m::A], gt[m::A], num_bins=16, downsample=16,
                   fg_norm=fg_norm)
        for m in range(A)) / A
    np.testing.assert_allclose(float(acc), float(fused), rtol=1e-6)
