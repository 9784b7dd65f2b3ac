import json

import numpy as np

from racformer_tpu.tools.export_results import (
    to_nuscenes_results,
    write_submission,
    yaw_to_quaternion,
)


def test_quaternion():
    q = yaw_to_quaternion(np.pi / 2)
    np.testing.assert_allclose(q, [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)], atol=1e-7)


def test_submission_format(tmp_path, rng):
    preds = [dict(
        bboxes=rng.normal(size=(5, 9)).astype(np.float32),
        scores=rng.uniform(size=5).astype(np.float32),
        labels=rng.integers(0, 10, size=5),
        valid=np.array([True, True, False, True, False]),
    )]
    p = write_submission(str(tmp_path / "sub.json"), ["tok0"], preds)
    with open(p) as f:
        sub = json.load(f)
    assert sub["meta"]["use_radar"] is True
    recs = sub["results"]["tok0"]
    assert len(recs) == 3  # valid only
    r0 = recs[0]
    assert set(r0) == {"sample_token", "translation", "size", "rotation",
                       "velocity", "detection_name", "detection_score",
                       "attribute_name"}
    b = preds[0]["bboxes"][0]
    np.testing.assert_allclose(r0["translation"][2], b[2] + b[5] / 2, atol=1e-5)


def test_attribute_for_velocity_rule():
    """mmdet3d's velocity-aware attribute rule (nuscenes_dataset._format_bbox)."""
    from racformer_tpu.tools.export_results import attribute_for

    assert attribute_for("car", 3.0, 0.0) == "vehicle.moving"
    assert attribute_for("car", 0.05, 0.0) == "vehicle.parked"
    assert attribute_for("bicycle", 1.0, 0.0) == "cycle.with_rider"
    assert attribute_for("bicycle", 0.0, 0.0) == "cycle.without_rider"
    assert attribute_for("pedestrian", 0.0, 0.0) == "pedestrian.standing"
    assert attribute_for("pedestrian", 1.0, 0.0) == "pedestrian.moving"
    assert attribute_for("bus", 0.1, 0.0) == "vehicle.stopped"
    assert attribute_for("bus", 1.0, 0.0) == "vehicle.moving"
    assert attribute_for("traffic_cone", 1.0, 0.0) == ""
