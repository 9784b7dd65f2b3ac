"""Tests for the devkit-free info generation tool: PCD parsing, quaternion
math, and radar aggregation over fabricated nuScenes tables."""

import json
import os
import struct

import numpy as np

from racformer_tpu.tools.gen_sweep_info import (
    Tables,
    aggregate_radar,
    collect_camera_sweeps,
    quat_to_rot,
    read_pcd,
    transform_matrix,
)


def test_quat_to_rot():
    # identity
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    # 90 deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = quat_to_rot(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_transform_matrix_inverse():
    q = [np.cos(0.3), 0, 0, np.sin(0.3)]
    t = [1.0, -2.0, 0.5]
    M = transform_matrix(t, q)
    Mi = transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(M @ Mi, np.eye(4), atol=1e-12)


def _write_pcd(path, pts):
    """Write a binary PCD with nuScenes-radar-like 18 float fields."""
    n = len(pts)
    fields = [f"f{i}" for i in range(pts.shape[1])]
    header = (
        "VERSION 0.7\n"
        f"FIELDS {' '.join(fields)}\n"
        f"SIZE {' '.join(['4'] * len(fields))}\n"
        f"TYPE {' '.join(['F'] * len(fields))}\n"
        f"COUNT {' '.join(['1'] * len(fields))}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(pts.astype("<f4").tobytes())


def test_read_pcd(tmp_path, rng):
    pts = rng.normal(size=(17, 18)).astype(np.float32)
    p = tmp_path / "radar.pcd"
    _write_pcd(p, pts)
    out = read_pcd(str(p))
    np.testing.assert_allclose(out, pts, atol=1e-6)


def _fabricate_tables(tmp_path, rng):
    version = "v1.0-test"
    base = tmp_path / version
    os.makedirs(base)
    ident_cs = dict(translation=[0, 0, 0], rotation=[1, 0, 0, 0])

    sensors, calibs, poses, sds, samples = [], [], [], [], []
    sensors.append(dict(token="sen_lidar", channel="LIDAR_TOP", modality="lidar"))
    sensors.append(dict(token="sen_radar", channel="RADAR_FRONT", modality="radar"))
    sensors.append(dict(token="sen_cam", channel="CAM_FRONT", modality="camera"))
    for name, sen in [("cs_lidar", "sen_lidar"), ("cs_radar", "sen_radar"),
                      ("cs_cam", "sen_cam")]:
        calibs.append(dict(token=name, sensor_token=sen,
                           camera_intrinsic=[[500, 0, 300], [0, 500, 200], [0, 0, 1]],
                           **ident_cs))
    poses.append(dict(token="ep0", translation=[10, 0, 0], rotation=[1, 0, 0, 0],
                      timestamp=1_000_000))
    samples.append(dict(token="samp0", timestamp=1_000_000, scene_token="sc0",
                        prev="", next=""))

    # radar pcd on disk
    pts = np.zeros((4, 18), np.float32)
    pts[:, 0] = [1, 2, 3, 4]  # x in sensor frame
    pts[:, 5] = 7.0  # rcs
    pts[:, 8] = 1.0  # vx_comp
    os.makedirs(tmp_path / "sweeps")
    _write_pcd(tmp_path / "sweeps" / "r0.pcd", pts)

    sds.append(dict(token="sd_lidar", sample_token="samp0", is_key_frame=True,
                    calibrated_sensor_token="cs_lidar", ego_pose_token="ep0",
                    timestamp=1_000_000, filename="x.bin", prev="", next=""))
    sds.append(dict(token="sd_radar", sample_token="samp0", is_key_frame=True,
                    calibrated_sensor_token="cs_radar", ego_pose_token="ep0",
                    timestamp=1_000_000, filename="sweeps/r0.pcd", prev="", next=""))
    # camera chain: keyframe + 2 sweeps
    for i, (tok, prev) in enumerate([("sd_cam0", "sd_cam1"), ("sd_cam1", "sd_cam2"),
                                     ("sd_cam2", "")]):
        sds.append(dict(token=tok, sample_token="samp0", is_key_frame=(i == 0),
                        calibrated_sensor_token="cs_cam", ego_pose_token="ep0",
                        timestamp=1_000_000 - i * 100_000,
                        filename=f"cam{i}.jpg", prev=prev, next=""))

    for name, rows in [("sample", samples), ("sample_data", sds),
                       ("calibrated_sensor", calibs), ("ego_pose", poses),
                       ("sensor", sensors)]:
        with open(base / f"{name}.json", "w") as f:
            json.dump(rows, f)
    return Tables(str(tmp_path), version)


def test_radar_aggregation_and_sweeps(tmp_path, rng):
    tables = _fabricate_tables(tmp_path, rng)
    pts = aggregate_radar(tables, "samp0", nsweeps=2)
    assert pts.shape == (4, 7)
    # identity calibs and shared ego pose: lidar-frame x == sensor x
    np.testing.assert_allclose(pts[:, 0], [1, 2, 3, 4], atol=1e-5)
    np.testing.assert_allclose(pts[:, 3], 7.0)
    np.testing.assert_allclose(pts[:, 4], 1.0)  # rotated vx (identity)
    np.testing.assert_allclose(pts[:, 6], 0.0)  # zero time lag (keyframe)

    sweeps = collect_camera_sweeps(tables, "samp0")
    assert len(sweeps) == 2
    assert sweeps[0]["cams"]["CAM_FRONT"]["timestamp"] == 900_000
    assert sweeps[1]["cams"]["CAM_FRONT"]["timestamp"] == 800_000


def test_infos_to_dataset_end_to_end(tmp_path, rng):
    """Full chain: raw tables -> aggregated infos -> NuScenesRadarDataset
    (with an actual JPEG decoded through the reader)."""
    import pickle
    from PIL import Image
    from racformer_tpu.data import NuScenesRadarDataset

    tables = _fabricate_tables(tmp_path, rng)

    # drop a real JPEG for the keyframe camera path
    img = (rng.uniform(0, 255, size=(64, 128, 3))).astype(np.uint8)
    img_path = tmp_path / "cam0.jpg"
    Image.fromarray(img).save(img_path, quality=95)

    # build the info pkl the way gen_sweep_info.main does
    cs = tables.calibrated_sensor["cs_cam"]
    K = np.asarray(cs["camera_intrinsic"], np.float64)
    viewpad = np.eye(4); viewpad[:3, :3] = K
    info = dict(
        token="samp0",
        timestamp=1_000_000,
        cams={"CAM_FRONT": dict(
            data_path=str(img_path),
            lidar2img=viewpad.astype(np.float32),  # identity extrinsics
            timestamp=1_000_000,
        )},
        radar_points=aggregate_radar(tables, "samp0", nsweeps=2),
        sweeps_cam=collect_camera_sweeps(tables, "samp0"),
        gt_boxes=rng.normal(size=(3, 9)).astype(np.float32),
        gt_labels=rng.integers(0, 10, size=(3,)),
    )
    # sweep cams now carry ego-compensated lidar2img from the tool
    for sw in info["sweeps_cam"]:
        for cam in sw["cams"].values():
            assert cam["lidar2img"].shape == (4, 4)
            cam["data_path"] = ""
        sw["radar_points"] = info["radar_points"]

    pkl = tmp_path / "infos_sweep.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info]}, f)

    ds = NuScenesRadarDataset(
        str(pkl), num_frames=2, frame_interval=1,
        camera_types=("CAM_FRONT",), image_hw=(32, 64),
        max_radar_points=16, max_gt=8, training=True,
        ida_cfg=dict(resize_lim=(0.5, 0.5), final_dim=(32, 64),
                     src_dim=(64, 128), rand_flip=False),
    )
    s = ds[0]
    assert s["imgs"].shape == (2, 1, 32, 64, 3)
    assert s["imgs"].max() > 0  # the JPEG actually decoded
    assert s["radar_mask"][0].sum() == 4
    assert s["gt_mask"].sum() == 3
    assert np.isfinite(s["lidar2img"]).all()


def _add_annotations(tmp_path, version="v1.0-test"):
    base = tmp_path / version
    # a car annotation at global (12, 1, 0): ego at (10, 0, 0), identity
    # rotations -> lidar-frame center (2, 1, 0). prev/next samples 0.5 s
    # apart moved +1 m in x -> velocity (2, 0).
    anns = [
        dict(token="a0", sample_token="samp0", instance_token="inst0",
             translation=[12.0, 1.0, 0.0], size=[2.0, 4.5, 1.6],
             rotation=[1, 0, 0, 0], prev="a_prev", next="a_next",
             attribute_tokens=["attr_moving"], num_lidar_pts=11,
             num_radar_pts=3),
        dict(token="a_prev", sample_token="samp_prev", instance_token="inst0",
             translation=[11.0, 1.0, 0.0], size=[2.0, 4.5, 1.6],
             rotation=[1, 0, 0, 0], prev="", next="a0",
             attribute_tokens=[], num_lidar_pts=9, num_radar_pts=2),
        dict(token="a_next", sample_token="samp_next", instance_token="inst0",
             translation=[13.0, 1.0, 0.0], size=[2.0, 4.5, 1.6],
             rotation=[1, 0, 0, 0], prev="a0", next="",
             attribute_tokens=[], num_lidar_pts=10, num_radar_pts=2),
    ]
    with open(base / "sample_annotation.json", "w") as f:
        json.dump(anns, f)
    with open(base / "attribute.json", "w") as f:
        json.dump([dict(token="attr_moving", name="vehicle.moving")], f)
    with open(base / "instance.json", "w") as f:
        json.dump([dict(token="inst0", category_token="cat_car")], f)
    with open(base / "category.json", "w") as f:
        json.dump([dict(token="cat_car", name="vehicle.car")], f)
    # the neighbor samples for velocity differencing
    with open(base / "sample.json") as f:
        samples = json.load(f)
    samples += [dict(token="samp_prev", timestamp=500_000, scene_token="sc0",
                     prev="", next="samp0"),
                dict(token="samp_next", timestamp=1_500_000, scene_token="sc0",
                     prev="samp0", next="")]
    with open(base / "sample.json", "w") as f:
        json.dump(samples, f)


def test_collect_gt_velocity_and_attributes(tmp_path, rng):
    from racformer_tpu.tools.gen_sweep_info import collect_gt

    _fabricate_tables(tmp_path, rng)
    _add_annotations(tmp_path)
    tables = Tables(str(tmp_path), "v1.0-test")
    gt = collect_gt(tables, "samp0")
    assert len(gt) == 1
    g = gt[0]
    np.testing.assert_allclose(g["center"], [2.0, 1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(g["wlh"], [2.0, 4.5, 1.6])
    # +1 m per 0.5 s on both sides -> 2 m/s in x (devkit box_velocity)
    np.testing.assert_allclose(g["velocity"], [2.0, 0.0], atol=1e-6)
    assert g["attribute"] == "vehicle.moving"
    assert g["category"] == "vehicle.car"
    assert g["num_lidar_pts"] == 11 and g["num_radar_pts"] == 3


def test_reader_aligns_gt_anno_attributes(tmp_path, rng):
    """The dataset reader maps baked gt_anno attributes/point counts onto the
    (mmdet3d-ordered) gt_boxes by nearest center."""
    import pickle

    from racformer_tpu.data import NuScenesRadarDataset
    from racformer_tpu.tools.gen_sweep_info import ATTRIBUTES

    cam = {"lidar2img": np.eye(4, dtype=np.float64), "timestamp": 0,
           "data_path": ""}
    info = dict(
        token="t0", timestamp=0,
        cams={"CAM_FRONT": cam}, sweeps_cam=[],
        radar_points=rng.normal(size=(5, 7)).astype(np.float32),
        gt_boxes=np.array([[2.0, 1.0, 0.0, 2.0, 4.5, 1.6, 0, 0, 0],
                           [30.0, 5.0, 0.0, 1.0, 1.0, 1.0, 0, 0, 0]],
                          np.float32),
        gt_labels=np.array([0, 8]),
        gt_anno=[dict(center=[2.0, 1.0, 0.0], wlh=[2.0, 4.5, 1.6], yaw=0.0,
                      velocity=[2.0, 0.0], attribute="vehicle.moving",
                      category="vehicle.car", num_lidar_pts=11,
                      num_radar_pts=3)],
    )
    pkl = tmp_path / "infos.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"infos": [info]}, f)
    s = NuScenesRadarDataset(str(pkl), num_frames=1, frame_interval=1,
                             camera_types=("CAM_FRONT",), image_hw=(32, 64),
                             max_radar_points=8, max_gt=4)[0]
    assert s["gt_attrs"][0] == ATTRIBUTES.index("vehicle.moving")
    assert s["gt_num_pts"][0] == 14
    assert s["gt_attrs"][1] == -1  # no nearby annotation record
    assert s["gt_num_pts"][1] == -1
