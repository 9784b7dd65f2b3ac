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


PAD = 2  # zero border used by the patch-gather (see bilinear_sample_views_nhwc)


def pad_for_sampling(feat: jax.Array) -> jax.Array:
    """Zero-pad the two spatial axes (..., H, W, C) by the sampling border and
    pin the result to a canonical layout. Hoist this OUT of loops: profiling
    shows XLA otherwise fuses the pad into each gather with a twisted operand
    layout ({4,1,0,3,2}) that makes every 2x2 patch fetch strided."""
    pads = [(0, 0)] * (feat.ndim - 3) + [(PAD, PAD), (PAD, PAD), (0, 0)]
    padded = jnp.pad(feat, pads)
    return jax.lax.optimization_barrier(padded)


def bilinear_sample_views_nhwc(
    feat: jax.Array,
    view: jax.Array,
    x: jax.Array,
    y: jax.Array,
    pre_padded: bool = False,
) -> jax.Array:
    """Sample `feat` [N, H, W, C] at (view, x, y); view is an int index.

    The view axis is folded into the gather (this is the TPU equivalent of
    the CUDA kernel's view-indexed pointer arithmetic,
    `models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164`).

    TPU cost model note: XLA gathers are costed per gathered *slice*
    (~5 cycles each, nearly independent of slice width), so instead of 4
    masked corner gathers we fetch one 2x2xC patch per point from a
    2-pixel zero-padded operand. The padding makes zeros-outside semantics
    exact with NO per-corner masks: any corner outside the image lands in
    the zero border (far-outside points clamp entirely into it).

    With `pre_padded=True`, `feat` is [N, H+2*PAD, W+2*PAD, C] from
    :func:`pad_for_sampling` (hoist it out of iteration loops).

    TPU gather layout (measured on v5e, docs/experiments/gather_row_fusion.py):
    gather cost is dominated by per-row issue rate, so the two patch rows are
    pre-fused into channels (`fused[h, w] = concat(p[h, w], p[h+1, w])`) and
    each patch becomes ONE single-row slice (1, 1, 2, 2C) — ~20% faster than
    the (1, 2, 2, C) two-row patch and with a cheaper contiguous lerp.
    """
    if pre_padded:
        N, Hp, Wp, C = feat.shape
        H, W = Hp - 2 * PAD, Wp - 2 * PAD
        padded = feat
    else:
        N, H, W, C = feat.shape
        padded = pad_for_sampling(feat)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)[..., None]
    wy = (y - y0).astype(feat.dtype)[..., None]
    # clamp into [-2, W] then shift: far-outside -> fully inside the border
    x0p = (jnp.clip(x0, -PAD, W).astype(jnp.int32) + PAD)
    y0p = (jnp.clip(y0, -PAD, H).astype(jnp.int32) + PAD)

    # y-fuse the two patch rows into channels: [N, Hp-1, Wp, 2C]
    fused = jnp.concatenate([padded[:, :-1], padded[:, 1:]], axis=-1)
    fused = jax.lax.optimization_barrier(fused)

    batch_shape = x.shape
    idx = jnp.stack(
        [view.reshape(-1), y0p.reshape(-1), x0p.reshape(-1)], axis=-1
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    patch = jax.lax.gather(
        fused, idx, dnums, slice_sizes=(1, 1, 2, 2 * C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [K, 1, 2, 2C]
    patch = patch.reshape(*batch_shape, 2, 2 * C)

    left = patch[..., 0, :]   # (v00 | v10) at column x0
    right = patch[..., 1, :]  # (v01 | v11) at column x0+1
    top = left[..., :C] * (1 - wx) + right[..., :C] * wx
    bot = left[..., C:] * (1 - wx) + right[..., C:] * wx
    return top * (1 - wy) + bot * wy
