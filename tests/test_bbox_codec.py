"""Golden tests for box codecs / polar transforms vs a torch oracle that
follows the reference formulas (`/root/reference/models/bbox/utils.py`)."""

import numpy as np
import torch

from racformer_tpu.ops import (
    normalize_bbox,
    denormalize_bbox,
    encode_bbox,
    decode_bbox,
    theta_d_to_xy,
    xy_to_theta_d,
    rotation_2d_in_bev,
    inverse_sigmoid,
)

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


def _rand_boxes(rng, n=32, dims=9):
    b = rng.normal(size=(n, dims)).astype(np.float32)
    b[:, 3:6] = np.abs(b[:, 3:6]) + 0.5  # positive sizes
    b[:, 0:2] *= 20.0
    return b


def torch_normalize(bboxes):
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w, l, h = (bboxes[..., i : i + 1].log() for i in (3, 4, 5))
    rot = bboxes[..., 6:7]
    return torch.cat([cx, cy, w, l, cz, h, rot.sin(), rot.cos(), bboxes[..., 7:9]], -1)


def test_normalize_denormalize_roundtrip(rng):
    b = _rand_boxes(rng)
    got = np.asarray(normalize_bbox(b))
    want = torch_normalize(torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    back = np.asarray(denormalize_bbox(got))
    np.testing.assert_allclose(back[:, :6], b[:, :6], rtol=1e-5, atol=1e-5)
    # yaw equal mod 2pi
    dyaw = np.mod(back[:, 6] - b[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)


def test_encode_decode_roundtrip(rng):
    b = _rand_boxes(rng)
    enc = np.asarray(encode_bbox(b, PC_RANGE))
    assert enc.shape[-1] == 10
    dec = np.asarray(decode_bbox(enc, PC_RANGE))
    np.testing.assert_allclose(dec[:, :6], b[:, :6], rtol=1e-4, atol=1e-4)


def test_polar_roundtrip(rng):
    xy = rng.uniform(0.1, 0.9, size=(4, 16, 3)).astype(np.float32)
    td = np.asarray(xy_to_theta_d(xy))
    back = np.asarray(theta_d_to_xy(td))
    np.testing.assert_allclose(back, xy, rtol=1e-4, atol=1e-4)
    assert td[..., 0].min() >= 0 and td[..., 0].max() <= 1


def test_polar_matches_reference_formula(rng):
    """Oracle re-derivation of theta_d2xy (`models/bbox/utils.py:82-90`)."""
    td = rng.uniform(0, 1, size=(8, 3)).astype(np.float32)
    got = np.asarray(theta_d_to_xy(td))
    map_size, r = 102.4, 65.0
    c = map_size / 2
    x = np.clip((c + td[:, 1] * r * np.cos(td[:, 0] * 2 * np.pi)) / map_size, 0, 1)
    y = np.clip((c + td[:, 1] * r * np.sin(td[:, 0] * 2 * np.pi)) / map_size, 0, 1)
    np.testing.assert_allclose(got[:, 0], x, atol=1e-5)
    np.testing.assert_allclose(got[:, 1], y, atol=1e-5)
    np.testing.assert_allclose(got[:, 2], td[:, 2], atol=1e-7)


def test_rotation_2d_matches_torch(rng):
    pts = rng.normal(size=(2, 5, 4, 3)).astype(np.float32)
    ang = rng.normal(size=(2, 5, 1)).astype(np.float32)
    got = np.asarray(rotation_2d_in_bev(pts, ang))

    # torch oracle: current-convention rot_mat_T from models/utils.py:69-75
    tp = torch.from_numpy(pts).reshape(-1, 4, 3)
    ta = torch.from_numpy(ang).reshape(-1)
    c, s = ta.cos(), ta.sin()
    zeros, ones = torch.zeros_like(c), torch.ones_like(c)
    rot_t = torch.stack(
        [c, s, zeros, -s, c, zeros, zeros, zeros, ones]
    ).transpose(0, 1).reshape(-1, 3, 3)
    want = torch.bmm(tp, rot_t).reshape(2, 5, 4, 3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_inverse_sigmoid(rng):
    x = rng.uniform(-0.2, 1.2, size=(100,)).astype(np.float32)
    got = np.asarray(inverse_sigmoid(x))
    xc = np.clip(x, 0, 1)
    want = np.log(np.clip(xc, 1e-5, None) / np.clip(1 - xc, 1e-5, None))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
