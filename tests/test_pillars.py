"""Tests for the dense pillar ops (radar branch substrate)."""

import numpy as np

from racformer_tpu.ops.pillars import (
    PillarGrid,
    augment_pillar_points,
    pillar_bev_features,
    pillar_indices,
)

GRID = PillarGrid(
    pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    voxel_size=(0.8, 0.8, 8.0),
    nx=128,
    ny=128,
)


def test_pillar_indices_bounds(rng):
    pts = rng.uniform(-60, 60, size=(200, 2)).astype(np.float32)
    mask = np.ones(200, bool)
    ids, valid = pillar_indices(pts, mask, GRID)
    ids, valid = np.asarray(ids), np.asarray(valid)
    inside = (np.abs(pts) < 51.2).all(-1)
    np.testing.assert_array_equal(valid, inside)
    assert (ids[~valid] == 128 * 128).all()
    iy, ix = ids[valid] // 128, ids[valid] % 128
    np.testing.assert_array_equal(ix, ((pts[valid, 0] + 51.2) / 0.8).astype(int))
    np.testing.assert_array_equal(iy, ((pts[valid, 1] + 51.2) / 0.8).astype(int))


def test_augment_cluster_and_center(rng):
    # two points in the same pillar
    pts = np.zeros((3, 7), np.float32)
    pts[0, :2] = [0.1, 0.1]
    pts[1, :2] = [0.3, 0.5]
    pts[2, :2] = [30.0, -20.0]
    mask = np.ones(3, bool)
    feats, ids, valid = augment_pillar_points(pts, mask, GRID)
    feats = np.asarray(feats)
    assert feats.shape == (3, 13)
    # cluster offsets of points 0/1 are symmetric about their mean
    np.testing.assert_allclose(feats[0, 7:10] + feats[1, 7:10], 0, atol=1e-5)
    # center offset: pillar of point 0 is (ix=64, iy=64) -> center (0.4, 0.4)
    np.testing.assert_allclose(feats[0, 10:12], [0.1 - 0.4, 0.1 - 0.4], atol=1e-5)
    # z center offset: z=0 vs pillar z-center -1.0
    np.testing.assert_allclose(feats[0, 12], 1.0, atol=1e-5)


def test_bev_scatter_max(rng):
    pts = np.zeros((4, 7), np.float32)
    pts[:, :2] = [[0.1, 0.1], [0.2, 0.2], [-10, -10], [100, 100]]
    mask = np.array([True, True, True, True])
    ids, valid = pillar_indices(pts[:, :2], mask, GRID)
    f = rng.normal(size=(4, 6)).astype(np.float32)
    bev = np.asarray(pillar_bev_features(f, ids, valid, GRID))
    assert bev.shape == (128, 128, 6)
    np.testing.assert_allclose(bev[64, 64], np.maximum(f[0], f[1]), atol=1e-6)
    # out-of-range point contributes nothing; empty pillars are exactly 0
    assert bev[0, 0].sum() == 0
