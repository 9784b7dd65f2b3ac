"""Tests for the self-contained nuScenes-protocol metrics."""

import numpy as np

from racformer_tpu.eval.metrics import nuscenes_metrics


def make_perfect_case(n_samples=4, n_per=6, seed=0):
    rng = np.random.default_rng(seed)
    preds, gts = [], []
    for _ in range(n_samples):
        boxes = np.zeros((n_per, 9), np.float32)
        boxes[:, 0:2] = rng.uniform(-40, 40, size=(n_per, 2))
        boxes[:, 3:6] = rng.uniform(1, 5, size=(n_per, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, size=n_per)
        boxes[:, 7:9] = rng.normal(size=(n_per, 2))
        labels = rng.integers(0, 10, size=n_per)
        preds.append(dict(
            bboxes=boxes.copy(),
            scores=rng.uniform(0.5, 1.0, size=n_per),
            labels=labels.copy(),
            valid=np.ones(n_per, bool),
        ))
        gts.append(dict(bboxes=boxes.copy(), labels=labels.copy(),
                        mask=np.ones(n_per, bool)))
    return preds, gts


def test_perfect_predictions():
    preds, gts = make_perfect_case()
    m = nuscenes_metrics(preds, gts)
    assert m["mAP"] > 0.95
    assert m["mATE"] < 0.01
    assert m["mASE"] < 0.01
    assert m["mAOE"] < 0.01
    assert m["mAVE"] < 0.01
    # NDS with perfect TP errors but mAAE=1 (no attributes): (5*1 + 4)/10
    assert 0.85 < m["NDS"] <= 0.91


def test_no_predictions():
    _, gts = make_perfect_case()
    preds = [dict(bboxes=np.zeros((1, 9)), scores=np.zeros(1),
                  labels=np.zeros(1, int), valid=np.zeros(1, bool))
             for _ in gts]
    m = nuscenes_metrics(preds, gts)
    assert m["mAP"] == 0.0
    assert m["NDS"] <= 0.05


def test_translation_error_reflected():
    preds, gts = make_perfect_case()
    for p in preds:
        p["bboxes"][:, 0] += 1.5  # 1.5 m offset: matches at 2/4 m only
    m = nuscenes_metrics(preds, gts)
    assert 1.2 < m["mATE"] < 1.8
    assert 0.3 < m["mAP"] < 0.7  # 2 of 4 thresholds match


def test_front_only_filter():
    preds, gts = make_perfect_case()
    m_all = nuscenes_metrics(preds, gts)
    m_front = nuscenes_metrics(preds, gts, front_only=True)
    # perfect predictions stay perfect under consistent filtering
    assert m_front["mAP"] > 0.9
    assert abs(m_front["NDS"] - m_all["NDS"]) < 0.1


def test_class_range_filter_drops_far_boxes():
    """Per-class detection range (devkit class_range): a far-away GT/pred
    pair beyond the class range is excluded from matching entirely."""
    preds, gts = make_perfect_case(n_samples=1, n_per=4)
    # move one matched pair out to 60 m (beyond every class range)
    preds[0]["bboxes"][0, 0:2] = (60.0, 0.0)
    gts[0]["bboxes"][0, 0:2] = (60.0, 0.0)
    m = nuscenes_metrics(preds, gts)
    assert m["mAP"] > 0.9  # remaining in-range pairs still perfect

    # but a far FALSE prediction also cannot hurt precision
    preds[0]["bboxes"][0, 0:2] = (60.0, 0.0)
    gts[0]["bboxes"][0, 0:2] = (0.0, 0.0)  # gt moved in-range, now unmatched
    m2 = nuscenes_metrics(preds, gts)
    assert m2["mAP"] < m["mAP"]  # unmatched in-range GT lowers recall


def test_attribute_error_when_provided():
    preds, gts = make_perfect_case(n_samples=2, n_per=5)
    for p, g in zip(preds, gts):
        g["attrs"] = np.full(len(g["labels"]), 6, np.int64)  # vehicle.moving
        p["attrs"] = np.full(len(p["labels"]), 6, np.int64)
    m = nuscenes_metrics(preds, gts)
    assert m["mAAE"] < 0.01
    # wrong attributes => max error
    for p in preds:
        p["attrs"][:] = 3
    m2 = nuscenes_metrics(preds, gts)
    assert m2["mAAE"] > 0.9
    # GT without a valid attribute (code <= 0) is EXCLUDED from AAE, not
    # counted as error (devkit semantics): with every pred WRONG (3 vs 6)
    # but half the GT attrs unknown, the error stays 1.0 only on classes
    # retaining valid attrs — flipping those preds right must zero mAAE on
    # them while the all-unknown classes fall back to the conservative 1.0,
    # i.e. strictly between the all-wrong and all-right extremes
    for p, g in zip(preds, gts):
        p["attrs"][:] = 6
        g["attrs"][::2] = -1
        g["attrs"][1::2] = 6
    m3 = nuscenes_metrics(preds, gts)
    assert 0.0 < m3["mAAE"] < m2["mAAE"]


def test_num_pts_filter():
    preds, gts = make_perfect_case(n_samples=1, n_per=4)
    gts[0]["num_pts"] = np.array([0, 5, 5, 5])  # first GT has no points
    # remove the matching pred too so precision stays clean
    preds[0]["valid"][0] = False
    m = nuscenes_metrics(preds, gts)
    assert m["mAP"] > 0.9
