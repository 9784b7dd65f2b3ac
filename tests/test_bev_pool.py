"""Golden tests for the bev_pool segment-sum formulation vs a naive numpy
oracle implementing the BEVPoolv2 semantics (voxel-wise sum of depth*feat,
`/root/reference/models/csrc/bev_pool_v2/src/bev_pool_cuda.cu:21-48`)."""

import jax
import numpy as np

from racformer_tpu.ops import bev_pool, frustum_grid, make_frustum
from racformer_tpu.ops.depth_bins import sid_bin_values, depth_to_sid_index


def naive_pool(depth, feat, rank, valid, nx, ny):
    N, D, Hf, Wf = depth.shape
    C = feat.shape[-1]
    out = np.zeros((ny * nx, C), np.float32)
    for n in range(N):
        for d in range(D):
            for h in range(Hf):
                for w in range(Wf):
                    if valid[n, d, h, w]:
                        out[rank[n, d, h, w]] += depth[n, d, h, w] * feat[n, h, w]
    return out.reshape(ny, nx, C)


def test_bev_pool_matches_naive(rng):
    N, D, Hf, Wf, C = 2, 5, 4, 6, 3
    nx = ny = 8
    depth = rng.uniform(size=(N, D, Hf, Wf)).astype(np.float32)
    feat = rng.normal(size=(N, Hf, Wf, C)).astype(np.float32)
    rank = rng.integers(0, nx * ny, size=(N, D, Hf, Wf)).astype(np.int32)
    valid = rng.uniform(size=(N, D, Hf, Wf)) > 0.3

    got = np.asarray(bev_pool(depth, feat, rank, valid, (nx, ny, 1)))
    want = naive_pool(depth, feat, rank, valid, nx, ny)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bev_pool_grad(rng):
    """Autodiff through the pool (the CUDA op needed a hand-written backward,
    `bev_pool_cuda.cu:67-121`; here it is free)."""
    N, D, Hf, Wf, C = 1, 3, 2, 2, 2
    nx = ny = 4
    depth = rng.uniform(size=(N, D, Hf, Wf)).astype(np.float32)
    feat = rng.normal(size=(N, Hf, Wf, C)).astype(np.float32)
    rank = rng.integers(0, nx * ny, size=(N, D, Hf, Wf)).astype(np.int32)
    valid = np.ones((N, D, Hf, Wf), bool)

    g = jax.grad(lambda d, f: bev_pool(d, f, rank, valid, (nx, ny, 1)).sum(), argnums=(0, 1))
    gd, gf = g(depth, feat)
    # d(out)/d(depth[p]) = sum_c feat[c]
    np.testing.assert_allclose(
        np.asarray(gd)[0, 0], feat[0].sum(-1), rtol=1e-5, atol=1e-5
    )
    assert np.isfinite(np.asarray(gf)).all()


def test_frustum_grid_geometry():
    """Identity projection: frustum pixel coords land in the expected voxels."""
    bins = sid_bin_values(1.0, 65.0, 96)
    fr = make_frustum((256, 704), 16, bins)
    assert fr.shape == (96, 16, 44, 3)

    # simple camera: lidar == camera frame, intrinsics f=1, principal point 0
    # so x_lidar = u * d, y_lidar = v * d, z = d
    img2lidar = np.eye(4, dtype=np.float32)[None]  # N=1
    rank, valid = frustum_grid(
        fr, img2lidar, (-51.2, -51.2, -5.0), (0.8, 0.8, 8.0), (128, 128, 1)
    )
    rank, valid = np.asarray(rank), np.asarray(valid)
    fr = np.asarray(fr)
    # pick a known point: u=0 (pixel x=0), depth bin 0 -> x = 0*d
    d0 = float(bins[0])
    x = 0.0 * d0
    ix = int((x - (-51.2)) / 0.8)
    assert valid[0, 0, 0, 0] == (0 <= ix < 128)


def test_sid_bins_roundtrip():
    bins = np.asarray(sid_bin_values(1.0, 65.0, 96))
    assert bins.shape == (96,)
    assert bins[0] >= 0.9 and bins[-1] <= 66.0
    # bin centers sit exactly on the truncation boundary (continuous index is
    # exactly i), so probe just above the center to avoid the knife edge.
    idx = np.asarray(depth_to_sid_index(bins + 1e-3, 1.0, 65.0, 96))
    np.testing.assert_array_equal(idx, np.arange(96))
    # out of range / zero depth -> background index 96
    assert int(depth_to_sid_index(np.float32(1e5), 1.0, 65.0, 96)) == 96
