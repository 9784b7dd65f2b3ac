"""Tests for the VoD dataset reader and KITTI-protocol metrics."""

import pickle

import numpy as np

from racformer_tpu.data.vod import VoDDataset
from racformer_tpu.eval.kitti_eval import (
    kitti_vod_metrics,
    iou_3d,
    rotated_iou_bev,
)


def test_rotated_iou_identity():
    b = np.array([[0.0, 0.0, 2.0, 4.0, 0.3]])
    iou = rotated_iou_bev(b, b)
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-6)


def test_rotated_iou_known_overlap():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])  # half overlap
    iou = rotated_iou_bev(a, b)
    np.testing.assert_allclose(iou, [[2.0 / 6.0]], atol=1e-5)
    # 90-degree rotation of a square = same box
    c = np.array([[0.0, 0.0, 2.0, 2.0, np.pi / 2]])
    np.testing.assert_allclose(rotated_iou_bev(a, c), [[1.0]], atol=1e-5)


def test_iou3d_identity():
    b = np.array([[0.0, 1.0, 10.0, 2.0, 4.0, 1.5, 0.2]])
    np.testing.assert_allclose(iou_3d(b, b), [[1.0]], atol=1e-5)


def test_kitti_metrics_perfect():
    rng = np.random.default_rng(0)
    preds, gts = [], []
    for _ in range(4):
        boxes = np.zeros((5, 7), np.float32)
        boxes[:, 0] = rng.uniform(-3, 3, 5)
        boxes[:, 1] = 1.0
        boxes[:, 2] = rng.uniform(5, 20, 5)
        boxes[:, 3:6] = rng.uniform(1, 3, (5, 3))
        boxes[:, 6] = rng.uniform(-1, 1, 5)
        labels = rng.integers(0, 3, 5)
        preds.append(dict(bboxes=boxes, scores=rng.uniform(0.5, 1, 5), labels=labels))
        gts.append(dict(bboxes=boxes.copy(), labels=labels.copy()))
    m = kitti_vod_metrics(preds, gts)
    assert m["mAP3D_all"] > 0.95
    assert m["mAP3D_corridor"] > 0.95


def test_vod_dataset_reader(tmp_path):
    infos = [dict(
        image=dict(image_idx=0, image_path="missing.jpg"),
        calib=dict(
            P2=np.array([[500, 0, 300, 0], [0, 500, 200, 0], [0, 0, 1, 0]], float),
            Tr_velo_to_cam=np.eye(4),
            R0_rect=np.eye(4),
        ),
        radar_path=None,
        annos=dict(
            name=np.array(["Car", "Pedestrian", "DontCare"]),
            location=np.array([[1.0, 1.5, 10.0], [-2.0, 1.5, 8.0], [0, 0, 0]], np.float32),
            dimensions=np.array([[4.0, 1.5, 2.0], [0.8, 1.8, 0.8], [0, 0, 0]], np.float32),
            rotation_y=np.array([0.1, 0.0, 0.0], np.float32),
        ),
    )]
    p = tmp_path / "vod_infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    ds = VoDDataset(str(p), image_hw=(64, 128), max_radar_points=32, max_gt=8)
    assert len(ds) == 1
    s = ds[0]
    assert s["imgs"].shape == (1, 1, 64, 128, 3)
    assert s["gt_mask"].sum() == 2  # DontCare filtered
    assert s["gt_labels"][0] == 0 and s["gt_labels"][1] == 1
    assert s["lidar2img"].shape == (1, 1, 4, 4)


def test_vod_radar_maps_rasterized(tmp_path):
    """Radar hits must land in the depth/RCS maps the DepthNet consumes
    (column-smear rasterizer, ref loading.py:522-548) — not stay zeroed."""
    radar = np.zeros((3, 7), np.float32)
    radar[:, 0:3] = [[0.0, 1.5, 10.0], [2.0, 1.5, 8.0], [-1.0, 0.0, 20.0]]
    radar[:, 3] = [5.0, 7.5, 1.0]  # RCS
    rp = tmp_path / "r.bin"
    radar.tofile(rp)
    infos = [dict(
        image=dict(image_idx=1, image_path=None),
        calib=dict(
            P2=np.array([[50, 0, 64, 0], [0, 50, 32, 0], [0, 0, 1, 0]], float),
            # identity extrinsics: points are already camera-frame (x right,
            # y down, z forward) so depth = z
            Tr_velo_to_cam=np.eye(4),
            R0_rect=np.eye(4),
        ),
        radar_path=str(rp),
    )]
    p = tmp_path / "vod_infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    s = VoDDataset(str(p), image_hw=(64, 128), max_radar_points=8, max_gt=4)[0]
    dm, rm = s["radar_depth"][0, 0], s["radar_rcs"][0, 0]
    # point 0: u = 50*0/10 + 64 = 64, depth 10, rcs 5; smeared down the column
    assert np.allclose(dm[:, 64], 10.0)
    assert np.allclose(rm[:, 64], 5.0)
    # untouched columns stay at the fill values
    assert dm[:, 0].sum() == 0 and np.allclose(rm[:, 0], -1000.0)
