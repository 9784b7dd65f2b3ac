"""Golden tests for make_sample_points / projection vs torch oracles following
`/root/reference/models/sparsebev_sampling.py:8-110` semantics."""

import numpy as np
import torch

from racformer_tpu.ops import make_sample_points, project_points_to_views
from racformer_tpu.ops.sampling import sample_image_features

PC_RANGE = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]


def torch_make_sample_points(query_bbox, offset, pc_range):
    xyz = query_bbox[..., 0:3].clone()
    xyz[..., 0] = xyz[..., 0] * (pc_range[3] - pc_range[0]) + pc_range[0]
    xyz[..., 1] = xyz[..., 1] * (pc_range[4] - pc_range[1]) + pc_range[1]
    xyz[..., 2] = xyz[..., 2] * (pc_range[5] - pc_range[2]) + pc_range[2]
    wlh = query_bbox[..., 3:6].exp()
    rot = torch.atan2(query_bbox[..., 6:7], query_bbox[..., 7:8])

    delta = offset[..., :3] * wlh[:, :, None, :]
    ang = rot[..., 0]
    c, s = ang.cos(), ang.sin()
    zeros, ones = torch.zeros_like(c), torch.ones_like(c)
    rot_t = torch.stack(
        [c, s, zeros, -s, c, zeros, zeros, zeros, ones], dim=-1
    ).reshape(*ang.shape, 3, 3)
    delta = torch.einsum("bqpi,bqij->bqpj", delta, rot_t)
    return xyz[:, :, None, :] + delta


def test_make_sample_points(rng):
    B, Q, P = 2, 6, 5
    qb = rng.normal(size=(B, Q, 10)).astype(np.float32)
    qb[..., 0:3] = rng.uniform(0, 1, size=(B, Q, 3))
    off = rng.normal(size=(B, Q, P, 3)).astype(np.float32)
    got = np.asarray(make_sample_points(qb, off, PC_RANGE))
    want = torch_make_sample_points(
        torch.from_numpy(qb), torch.from_numpy(off), PC_RANGE
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def _simple_cams(N):
    """N cameras looking +x with yaw spread, pinhole f=500, 704x256 image."""
    mats = []
    for i in range(N):
        yaw = 2 * np.pi * i / N
        # lidar->cam: rotate so cam z axis = lidar direction (cos, sin)
        R = np.array(
            [
                [-np.sin(yaw), np.cos(yaw), 0],
                [0, 0, -1],
                [np.cos(yaw), np.sin(yaw), 0],
            ]
        )
        K = np.array([[500, 0, 352], [0, 500, 128], [0, 0, 1.0]])
        M = np.eye(4)
        M[:3, :3] = K @ R
        mats.append(M)
    return np.stack(mats).astype(np.float32)


def test_projection_selects_valid_view(rng):
    B, T, Q, P, N = 1, 2, 4, 3, 6
    l2i = np.broadcast_to(_simple_cams(N), (B, T, N, 4, 4)).copy()
    pts = rng.uniform(-30, 30, size=(B, T, Q, P, 3)).astype(np.float32)
    pts[..., 2] = 0.0
    loc = np.asarray(project_points_to_views(pts, l2i, 256, 704))
    assert loc.shape == (B, T, Q, P, 3)

    # oracle: project into every view, valid = in front + in image
    ok_any = np.zeros((B, T, Q, P), bool)
    for n in range(N):
        hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
        cam = np.einsum("btqpj,btij->btqpi", hom, l2i[:, :, n])
        z = cam[..., 2]
        x = cam[..., 0] / np.maximum(z, 1e-5) / 704
        y = cam[..., 1] / np.maximum(z, 1e-5) / 256
        valid = (z > 1e-5) & (x > 0) & (x < 1) & (y > 0) & (y < 1)
        ok_any |= valid
    # wherever some view is valid, the selected loc must be inside [0,1]
    sel_ok = (
        (loc[..., 0] > 0) & (loc[..., 0] < 1) & (loc[..., 1] > 0) & (loc[..., 1] < 1)
    )
    np.testing.assert_array_equal(sel_ok, ok_any)


def test_sample_image_features_shapes(rng):
    B, Q, T, G, P, N, C = 1, 4, 2, 2, 3, 3, 8
    L = 2
    pts = rng.uniform(-30, 30, size=(B, Q, T, G, P, 3)).astype(np.float32)
    feats = [
        rng.normal(size=(B, T, G, N, 8, 16, C)).astype(np.float32),
        rng.normal(size=(B, T, G, N, 4, 8, C)).astype(np.float32),
    ]
    w = rng.uniform(size=(B, Q, G, T, P, L)).astype(np.float32)
    l2i = np.broadcast_to(_simple_cams(N), (B, T, N, 4, 4)).copy()
    out = np.asarray(sample_image_features(pts, feats, w, l2i, 256, 704))
    assert out.shape == (B, Q, G, T * P, C)
    assert np.isfinite(out).all()
