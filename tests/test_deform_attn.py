"""Golden test for single-level deformable attention vs mmcv's documented
pytorch fallback semantics (`multi_scale_deformable_attn_pytorch`, used at
`/root/reference/models/bev_self_attention.py:202-204`)."""

import numpy as np
import torch
import torch.nn.functional as F

from racformer_tpu.ops import deform_attn_single_level


def torch_deform_attn(value, spatial_shapes, loc, weights):
    """Oracle mirroring mmcv multi_scale_deformable_attn_pytorch for one level.

    value: [S, HW, M, c]; loc: [S, Q, M, L=1, P, 2]; weights [S, Q, M, 1, P].
    """
    S, _, M, c = value.shape
    Q = loc.shape[1]
    H, W = spatial_shapes[0]
    v = value.permute(0, 2, 3, 1).reshape(S * M, c, H, W)
    g = 2 * loc[:, :, :, 0] - 1  # [S, Q, M, P, 2]
    g = g.permute(0, 2, 1, 3, 4).reshape(S * M, Q, -1, 2)
    sampled = F.grid_sample(
        v, g, mode="bilinear", padding_mode="zeros", align_corners=False
    )  # [S*M, c, Q, P]
    w = weights.permute(0, 2, 1, 3, 4).reshape(S * M, 1, Q, -1)
    out = (sampled * w).sum(-1)  # [S*M, c, Q]
    return out.view(S, M * c, Q).transpose(1, 2)  # [S, Q, M*c]


def test_deform_attn_pallas_matches_xla(rng):
    """The Pallas gather forward (default on TPU since round 3 — see
    ops.deform_attn.resolve_bev_pallas) must match the XLA path bit-for-bit
    semantics at the production per-head channel width (c=64 -> 128 fused
    lanes). Runs the kernel in interpret mode on CPU."""
    S, H, W, M, c, Q, P = 2, 12, 10, 4, 64, 6, 5
    value = rng.normal(size=(S, H, W, M, c)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(S, Q, M, P, 2)).astype(np.float32)
    weights = rng.uniform(size=(S, Q, M, P)).astype(np.float32)

    base = np.asarray(
        deform_attn_single_level(value, loc, weights, pallas=False))
    got = np.asarray(
        deform_attn_single_level(value, loc, weights, pallas=True))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)


def test_deform_attn_matches_mmcv_fallback(rng):
    S, H, W, M, c, Q, P = 3, 12, 10, 4, 8, 6, 5
    value = rng.normal(size=(S, H, W, M, c)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(S, Q, M, P, 2)).astype(np.float32)
    weights = rng.uniform(size=(S, Q, M, P)).astype(np.float32)

    got = np.asarray(deform_attn_single_level(value, loc, weights))

    v_t = torch.from_numpy(value).reshape(S, H * W, M, c)
    want = torch_deform_attn(
        v_t,
        [(H, W)],
        torch.from_numpy(loc)[:, :, :, None],
        torch.from_numpy(weights)[:, :, :, None],
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
