"""Golden tests for msmv_sample vs the reference's pure-PyTorch fallback
semantics (`/root/reference/models/csrc/wrapper.py:15-39`): per-level 3D
grid_sample with align_corners=True, zeros padding, view axis as depth."""

import numpy as np
import torch
import torch.nn.functional as F

from racformer_tpu.ops import msmv_sample


def torch_msmv(mlvl_feats_cf, loc, weights):
    """mlvl_feats_cf: list of [S, C, N, H, W]; loc [S, Q, P, 3] in [0,1];
    weights [S, Q, P, L]. Returns [S, Q, P, C]."""
    S, C = mlvl_feats_cf[0].shape[:2]
    _, Q, P, _ = loc.shape
    g = loc * 2 - 1
    g = g[:, :, :, None, :]  # [S, Q, P, 1, 3]
    final = torch.zeros(S, C, Q, P)
    for l, feat in enumerate(mlvl_feats_cf):
        out = F.grid_sample(
            feat, g, mode="bilinear", padding_mode="zeros", align_corners=True
        )[..., 0]
        final += out * weights[..., l].reshape(S, 1, Q, P)
    return final.permute(0, 2, 3, 1)


def test_msmv_matches_grid_sample(rng):
    S, N, C, Q, P, L = 2, 6, 8, 5, 7, 4
    shapes = [(16, 22), (8, 11), (4, 6), (2, 3)]
    feats_t = [torch.randn(S, C, N, h, w) for h, w in shapes]
    # loc: view packed as k/(N-1) for exact integer views
    views = rng.integers(0, N, size=(S, Q, P))
    loc = np.stack(
        [
            rng.uniform(-0.1, 1.1, size=(S, Q, P)),
            rng.uniform(-0.1, 1.1, size=(S, Q, P)),
            views / (N - 1),
        ],
        axis=-1,
    ).astype(np.float32)
    w = rng.uniform(size=(S, Q, P, L)).astype(np.float32)

    want = torch_msmv(feats_t, torch.from_numpy(loc), torch.from_numpy(w)).numpy()

    feats_j = [f.permute(0, 2, 3, 4, 1).contiguous().numpy() for f in feats_t]
    got = np.asarray(msmv_sample(feats_j, loc, w))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_msmv_zero_outside(rng):
    """Locations far outside [0,1] must sample exactly 0 (zeros padding)."""
    S, N, C, Q, P = 1, 3, 4, 2, 3
    feats = [np.ones((S, N, 8, 8, C), np.float32)]
    loc = np.full((S, Q, P, 3), 5.0, np.float32)
    loc[..., 2] = 0.0
    w = np.ones((S, Q, P, 1), np.float32)
    out = np.asarray(msmv_sample(feats, loc, w))
    np.testing.assert_allclose(out, 0.0)


def test_msmv_v2_argmax_level(rng):
    """msmv_sample_v2 selects the single argmax-weight level
    (`wrapper.py:41-76` semantics)."""
    from racformer_tpu.ops.msmv import msmv_sample_v2

    S, N, C, Q, P = 1, 2, 4, 3, 5
    shapes = [(8, 8), (4, 4)]
    feats = [np.full((S, N, h, w, C), float(l + 1), np.float32)
             for l, (h, w) in enumerate(shapes)]
    loc = np.stack([
        rng.uniform(0.2, 0.8, size=(S, Q, P)),
        rng.uniform(0.2, 0.8, size=(S, Q, P)),
        np.zeros((S, Q, P)),
    ], axis=-1).astype(np.float32)
    w = np.zeros((S, Q, P, 2), np.float32)
    w[..., 0] = 0.9  # level 0 wins everywhere
    w[0, 0, 0] = [0.1, 0.9]  # except one point -> level 1
    out = np.asarray(msmv_sample_v2(feats, loc, w))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(out[0, 1:, :], 1.0, atol=1e-5)


def test_msmv_pre_padded_matches_unpadded(rng):
    from racformer_tpu.ops.bilinear import pad_for_sampling

    S, N, C, Q, P, L = 2, 3, 8, 5, 7, 2
    shapes = [(12, 16), (6, 8)]
    feats = [rng.normal(size=(S, N, h, w, C)).astype(np.float32) for h, w in shapes]
    loc = np.stack([
        rng.uniform(-0.2, 1.2, size=(S, Q, P)),
        rng.uniform(-0.2, 1.2, size=(S, Q, P)),
        rng.integers(0, N, size=(S, Q, P)) / (N - 1),
    ], axis=-1).astype(np.float32)
    w = rng.uniform(size=(S, Q, P, L)).astype(np.float32)
    a = np.asarray(msmv_sample(feats, loc, w))
    padded = [np.asarray(pad_for_sampling(f)) for f in feats]
    b = np.asarray(msmv_sample(padded, loc, w, pre_padded=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_msmv_pallas_matches_xla(rng):
    """The Pallas image-gather forward must match the XLA path at the
    production per-group channel width (C=64 -> 128 fused lanes). Interpret
    mode on CPU; covers the balanced chunk layout (K not a multiple of the
    kernel GROUP)."""
    from racformer_tpu.ops.msmv import msmv_sample_xyv

    S, N, C, Q, P = 2, 3, 64, 5, 7
    shapes = [(16, 22), (8, 11)]
    feats = [rng.normal(size=(S, N, h, w, C)).astype(np.float32)
             for h, w in shapes]
    x = rng.uniform(-0.1, 1.1, size=(S, Q, P)).astype(np.float32)
    y = rng.uniform(-0.1, 1.1, size=(S, Q, P)).astype(np.float32)
    view = rng.integers(0, N, size=(S, Q, P)).astype(np.int32)
    w = rng.uniform(size=(S, Q, P, 2)).astype(np.float32)

    base = np.asarray(msmv_sample_xyv(feats, x, y, view, w, pallas=False))
    got = np.asarray(msmv_sample_xyv(feats, x, y, view, w, pallas=True))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)
