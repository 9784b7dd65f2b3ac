"""Tests for the host-side data layer: rasterizers, augmentation geometry,
synthetic dataset, and the nuScenes reader on a fabricated info pkl."""

import os
import pickle

import numpy as np

from racformer_tpu.data import (
    ImageAug,
    NuScenesRadarDataset,
    SyntheticDataset,
    points_to_depth_map,
    radar_to_depth_rcs_maps,
)
from racformer_tpu.data.transforms import bev_rot_scale_aug, transform_boxes_bev


def _pinhole(f=100.0, cx=50.0, cy=50.0):
    M = np.eye(4, dtype=np.float32)
    M[0, 0], M[1, 1] = f, f
    M[0, 2], M[1, 2] = cx, cy
    return M


def test_depth_map_nearest_wins():
    l2i = _pinhole()
    # two points projecting to the same pixel at different depths
    pts = np.array([[0.0, 0.0, 10.0], [0.0, 0.0, 5.0]], np.float32)
    # camera looks +z here (identity rotation): u = f*x/z + cx
    dm = points_to_depth_map(pts, l2i, (100, 100))
    assert dm[50, 50] == 5.0


def test_radar_column_smear():
    l2i = _pinhole()
    pts = np.array([[1.0, 0.0, 10.0, 7.5]], np.float32)  # u = 60
    dm, rm = radar_to_depth_rcs_maps(pts, l2i, (100, 100))
    assert (dm[:, 60] == 10.0).all()  # whole column written
    assert (rm[:, 60] == 7.5).all()
    assert dm[:, 59].sum() == 0


def test_image_aug_geometry(rng):
    cfg = dict(resize_lim=(0.5, 0.5), final_dim=(100, 200), src_dim=(400, 800),
               rand_flip=False)
    aug = ImageAug.sample(rng, cfg, training=True)
    M = aug.matrix()
    # a pixel (u, v) in the source maps to resize*u - crop_x
    u, v = 300.0, 200.0
    got = M @ np.array([u, v, 1.0, 1.0])
    assert np.isclose(got[0], u * aug.resize - aug.crop[0])
    assert np.isclose(got[1], v * aug.resize - aug.crop[1])


def test_image_aug_reference_crop(rng):
    """The exact BEVStereo crop convention the released model was trained
    with (ref transforms.py:314-341): bottom-anchored crop_h = newH - fH at
    bot_pct_lim=(0,0); test-time resize is exactly max(fH/H, fW/W)."""
    cfg = dict(resize_lim=(0.5, 0.5), final_dim=(256, 704),
               src_dim=(900, 1600), bot_pct_lim=(0.0, 0.0), rand_flip=False)
    tr = ImageAug.sample(rng, cfg, training=True)
    assert tr.resize == 0.5
    assert tr.crop[1] == int(900 * 0.5) - 256  # bottom-anchored
    te = ImageAug.sample(rng, cfg, training=False)
    assert np.isclose(te.resize, 0.44)  # max(256/900, 704/1600), no fudge
    assert te.crop == (0, int(900 * 0.44) - 256, 704, int(900 * 0.44))


def test_bev_aug_box_transform(rng):
    T, ang, scale = bev_rot_scale_aug(rng)
    boxes = np.array([[10.0, 0, 0, 2, 4, 1.5, 0.3, 1.0, 0.0]], np.float32)
    out = transform_boxes_bev(boxes, T, ang, scale)
    r = np.hypot(out[0, 0], out[0, 1])
    assert np.isclose(r, 10.0 * scale, atol=1e-4)
    assert np.isclose(out[0, 6], 0.3 + ang)
    assert np.isclose(np.hypot(out[0, 7], out[0, 8]), scale, atol=1e-5)


def test_synthetic_dataset_shapes():
    ds = SyntheticDataset(num_samples=2, num_cams=2, num_frames=2, hw=(64, 128),
                          max_radar_points=128, max_gt=8)
    b = ds.batch([0, 1])
    assert b["imgs"].shape == (2, 2, 2, 64, 128, 3)
    assert b["radar_points"].shape == (2, 2, 128, 7)
    assert b["gt_mask"].any()
    # deterministic
    b2 = ds.batch([0, 1])
    np.testing.assert_array_equal(b["imgs"], b2["imgs"])


def test_nuscenes_reader_fabricated(tmp_path, rng):
    """Reader works on a fabricated info pkl with precomputed radar points."""
    def cam(ts):
        return {
            "lidar2img": _pinhole(500, 352, 128),
            "timestamp": ts,
            "data_path": "",
        }

    infos = []
    for i in range(3):
        ts = 1_000_000 * i
        infos.append(
            dict(
                token=f"tok{i}",
                timestamp=ts,
                cams={"CAM_FRONT": cam(ts), "CAM_LEFT": cam(ts)},
                sweeps_cam=[
                    dict(cams={"CAM_FRONT": cam(ts - 500_000 * (j + 1)),
                               "CAM_LEFT": cam(ts - 500_000 * (j + 1))},
                         timestamp=ts - 500_000 * (j + 1),
                         radar_points=rng.normal(size=(50, 7)).astype(np.float32))
                    for j in range(4)
                ],
                radar_points=rng.normal(size=(60, 7)).astype(np.float32) * 5,
                gt_boxes=rng.normal(size=(5, 9)).astype(np.float32),
                gt_labels=rng.integers(0, 10, size=(5,)),
            )
        )
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos}, f)

    ds = NuScenesRadarDataset(
        str(pkl), num_frames=3, frame_interval=2,
        camera_types=("CAM_FRONT", "CAM_LEFT"), image_hw=(64, 128),
        max_radar_points=64, max_gt=8, training=True,
    )
    assert len(ds) == 3
    s = ds[2]
    assert s["imgs"].shape == (3, 2, 64, 128, 3)
    assert s["radar_points"].shape == (3, 64, 7)
    assert s["radar_mask"][0].sum() == 60
    assert s["lidar2img"].shape == (3, 2, 4, 4)
    assert s["gt_mask"].sum() == 5
    # time_diff: frame 0 minus history timestamps, non-negative
    assert (s["time_diff"][1:] >= 0).all()


def test_nuscenes_reader_realistic(tmp_path, rng):
    """Full-schema fixture: JPEG files on disk, sensor2lidar extrinsics +
    intrinsics (the `build_lidar2img` branch, ref nuscenes_dataset.py:236-266),
    microsecond timestamps, scene tokens. Checks the assembled lidar2img
    projects a lidar point to the ida-scaled pixel and the images really load."""
    from PIL import Image as PILImage

    srcH, srcW = 128, 256
    # camera looks along lidar +x: columns of R are the camera axes in lidar
    R = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float64)
    t = np.array([0.0, 0.0, 1.6])
    K = np.array([[100.0, 0, srcW / 2], [0, 100.0, srcH / 2], [0, 0, 1]])

    def cam(ts, color):
        p = tmp_path / f"img_{ts}_{color}.jpg"
        PILImage.new("RGB", (srcW, srcH), color).save(p, quality=95)
        return dict(sensor2lidar_rotation=R, sensor2lidar_translation=t,
                    cam_intrinsic=K, timestamp=ts, data_path=str(p))

    base = 1_600_000_000_000_000  # us epoch, nuScenes convention
    infos = [dict(
        token=f"tok{i}", scene_token="scene-0001",
        timestamp=base + 500_000 * i,
        cams={"CAM_FRONT": cam(base + 500_000 * i, (200, 30, 30))},
        sweeps_cam=[dict(
            cams={"CAM_FRONT": cam(base + 500_000 * i - 500_000 * (j + 1),
                                   (30, 200, 30))},
            timestamp=base + 500_000 * i - 500_000 * (j + 1),
            radar_points=rng.normal(size=(20, 7)).astype(np.float32))
            for j in range(2)],
        radar_points=rng.normal(size=(30, 7)).astype(np.float32) * 5,
        gt_boxes=rng.normal(size=(3, 9)).astype(np.float32),
        gt_labels=rng.integers(0, 10, size=(3,)),
    ) for i in range(2)]
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": infos}, f)

    ds = NuScenesRadarDataset(
        str(pkl), num_frames=2, frame_interval=1,
        camera_types=("CAM_FRONT",), image_hw=(64, 128),
        ida_cfg=dict(resize_lim=(0.5, 0.5), final_dim=(64, 128),
                     src_dim=(srcH, srcW), bot_pct_lim=(0.0, 0.0),
                     rand_flip=False),
        max_radar_points=64, max_gt=8, training=False,
    )
    s = ds[1]
    # image content made it through decode + resize (BGR: red -> high ch 2)
    cur = s["imgs"][0, 0]
    assert cur[:, :, 2].mean() > 150 and cur[:, :, 0].mean() < 80
    hist = s["imgs"][1, 0]
    assert hist[:, :, 1].mean() > 150  # history frame is the green JPEG
    # geometry: lidar (10, 0, 1.6) sits on the optical axis -> principal
    # point scaled by the test-time ida resize (0.5, crop 0)
    p = s["lidar2img"][0, 0] @ np.array([10.0, 0, 1.6, 1.0])
    u, v = p[0] / p[2], p[1] / p[2]
    assert np.isclose(u, srcW / 2 * 0.5, atol=1e-4)
    assert np.isclose(v, srcH / 2 * 0.5, atol=1e-4)
    assert s["scene"] == "scene-0001"
    # time_diff: current frame mean ts minus each frame's ts, seconds
    assert np.isclose(s["time_diff"][1], 0.5, atol=1e-6)
    assert s["gt_mask"].sum() == 3


def test_bev_aug_wired_consistent(tmp_path, rng):
    """With the global BEV aug on, the transformed GT boxes project through
    the transformed lidar2img to the same pixels as the raw GT through the
    raw lidar2img, and the (aug-invariant) radar depth/RCS maps are unchanged
    (reference pipeline order: aug before rasterization,
    `configs/racformer_r50_nuimg_704x256_f8.py:204-221`)."""
    pts = (rng.normal(size=(40, 7)) * np.array([20, 20, 1, 1, 2, 2, 0.1])).astype(
        np.float32)
    gt = np.concatenate(
        [rng.normal(size=(4, 2)) * 20, rng.normal(size=(4, 1)),
         rng.uniform(1, 3, size=(4, 3)), rng.normal(size=(4, 3))], axis=1
    ).astype(np.float32)
    info = dict(
        token="t0", timestamp=0,
        cams={"CAM_FRONT": {"lidar2img": _pinhole(500, 352, 128),
                            "timestamp": 0, "data_path": ""}},
        sweeps_cam=[], radar_points=pts, gt_boxes=gt,
        gt_labels=rng.integers(0, 10, size=(4,)),
    )
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info]}, f)

    kw = dict(num_frames=1, frame_interval=1, camera_types=("CAM_FRONT",),
              image_hw=(64, 128), max_radar_points=64, max_gt=8, training=True,
              ida_cfg=dict(resize_lim=(0.4, 0.4), final_dim=(64, 128),
                           src_dim=(256, 704), rand_flip=False))
    raw = NuScenesRadarDataset(str(pkl), **kw)[0]
    augd = NuScenesRadarDataset(
        str(pkl), bev_aug_cfg=dict(rot_range=(0.3, 0.3),
                                   scale_ratio_range=(1.04, 1.04)), **kw)[0]

    def project(l2i, xyz):
        p = l2i @ np.concatenate([xyz, [1.0]])
        return p[:2] / p[2]

    for g in range(4):
        want = project(raw["lidar2img"][0, 0], raw["gt_bboxes"][g, :3])
        got = project(augd["lidar2img"][0, 0], augd["gt_bboxes"][g, :3])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    # aug rotates the GT in lidar frame
    assert not np.allclose(raw["gt_bboxes"][0, :2], augd["gt_bboxes"][0, :2])
    np.testing.assert_allclose(raw["radar_depth"], augd["radar_depth"],
                               rtol=1e-4, atol=1e-3)
    # radar point velocities stay untouched (reference LiDARPoints quirk)
    np.testing.assert_array_equal(raw["radar_points"][0, :40, 4:6],
                                  augd["radar_points"][0, :40, 4:6])


def test_prefetch_loader_matches_direct():
    from racformer_tpu.data.prefetch import PrefetchLoader

    ds = SyntheticDataset(num_samples=8, num_cams=1, num_frames=2, hw=(32, 64),
                          max_radar_points=32, max_gt=4)
    index_fn = lambda step: [(2 * step) % 8, (2 * step + 1) % 8]
    loader = PrefetchLoader(ds, index_fn, total_steps=3, num_workers=2)
    try:
        for step in range(3):
            got = loader.get(step)
            want = ds.batch(index_fn(step))
            for k in want:
                if not isinstance(want[k], list):
                    np.testing.assert_array_equal(got[k], want[k])
    finally:
        loader.close()


def test_prefetch_loader_propagates_errors():
    from racformer_tpu.data.prefetch import PrefetchLoader

    class Boom:
        def __getitem__(self, i):
            raise ValueError("boom")

    loader = PrefetchLoader(Boom(), lambda s: [0], total_steps=1, num_workers=1)
    try:
        import pytest as _pytest

        with _pytest.raises(ValueError):
            loader.get(0)
    finally:
        loader.close()
