"""Bilinear sampling core: the XLA gather + lerp primitive that replaces the
reference's CUDA samplers (`models/csrc/msmv_sampling/*.cu` and mmcv's
`ms_deform_attn`). Zero padding outside the image, per-corner masking, exactly
matching `torch.nn.functional.grid_sample(..., padding_mode='zeros')`.

TPU notes: all indices are flattened to one gather over [H*W, C] (or
[N*H*W, C]) so XLA lowers to a single dynamic-gather; the 4 corner gathers + 2
lerps fuse into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(flat_feat: jax.Array, idx: jax.Array, ok: jax.Array) -> jax.Array:
    """flat_feat: [HW, C]; idx: [...]; ok: [...] bool -> [..., C] with zeros where !ok."""
    idx = jnp.where(ok, idx, 0)
    out = jnp.take(flat_feat, idx, axis=0)
    return out * ok[..., None].astype(out.dtype)


def bilinear_sample_nhwc(
    feat: jax.Array,
    x: jax.Array,
    y: jax.Array,
) -> jax.Array:
    """Sample `feat` [H, W, C] at continuous pixel coords x, y (any shape).

    Coordinates are in *pixel* space (callers apply align_corners conversion).
    Out-of-bounds corners contribute zero. Returns [..., C].
    """
    H, W, C = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)
    wy = (y - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(H * W, C)

    def ok(xi, yi):
        return (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)

    def idx(xi, yi):
        return yi * W + xi

    v00 = _gather_hw(flat, idx(x0i, y0i), ok(x0i, y0i))
    v01 = _gather_hw(flat, idx(x1i, y0i), ok(x1i, y0i))
    v10 = _gather_hw(flat, idx(x0i, y1i), ok(x0i, y1i))
    v11 = _gather_hw(flat, idx(x1i, y1i), ok(x1i, y1i))

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_views_nhwc(
    feat: jax.Array,
    view: jax.Array,
    x: jax.Array,
    y: jax.Array,
) -> jax.Array:
    """Sample `feat` [N, H, W, C] at (view, x, y); view is an int index.

    The view axis is folded into the gather index so the whole multi-view
    sample is still one gather (this is the TPU equivalent of the CUDA
    kernel's view-indexed pointer arithmetic,
    `models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164`).
    """
    N, H, W, C = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)
    wy = (y - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(N * H * W, C)
    base = view * (H * W)

    def ok(xi, yi):
        return (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)

    def idx(xi, yi):
        return base + yi * W + xi

    v00 = _gather_hw(flat, idx(x0i, y0i), ok(x0i, y0i))
    v01 = _gather_hw(flat, idx(x1i, y0i), ok(x1i, y0i))
    v10 = _gather_hw(flat, idx(x0i, y1i), ok(x0i, y1i))
    v11 = _gather_hw(flat, idx(x1i, y1i), ok(x1i, y1i))

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
