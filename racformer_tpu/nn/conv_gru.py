"""ConvGRU temporal encoder for the radar BEV queue.

Matches `RadarBEVTemporalEncoder` / `ConvGRU` / `ConvGRUCell`
(`/root/reference/models/racformer_transformer.py:618-720`):
downsample 256 -> 64 @ stride 2, run a ConvGRU over the first min(4, T)
frames (later frames emit the zero initial state; steps with t > 1 run
no-grad), bilinear-upsample back, concat with the input and fuse 3x3.

The time recurrence is a `lax.scan` (the reference's python loop over T).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvGRUCell(nn.Module):
    hidden: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, h_prev):
        # `matching_layer` maps hidden -> input channels before the joint
        # gates conv (`racformer_transformer.py:707-713`).
        h_matched = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="matching")(h_prev)
        combined = jnp.concatenate([x, h_matched], axis=-1)
        gates = nn.Conv(
            3 * self.hidden, (self.kernel, self.kernel), padding="SAME",
            dtype=self.dtype, name="gates",
        )(combined)
        z, r, cand = jnp.split(gates, 3, axis=-1)
        z = nn.sigmoid(z)
        r = nn.sigmoid(r)
        cand = jnp.tanh(cand + r * h_prev)
        return (1.0 - z) * h_prev + z * cand


class ConvGRU(nn.Module):
    hidden: int
    kernel: int = 3
    max_steps: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, T, H, W, C] -> hidden states [B, T, H, W, hidden].

        Frames t >= min(max_steps, T) get the zero state; cell steps with
        t > 1 are wrapped in stop_gradient (`racformer_transformer.py:680-691`).
        """
        B, T, H, W, C = x.shape
        cell = ConvGRUCell(self.hidden, self.kernel, dtype=self.dtype, name="cell")
        h0 = jnp.zeros((B, H, W, self.hidden), self.dtype)
        num_t = min(self.max_steps, T)

        hs = []
        h = h0
        for t in range(T):
            if t >= num_t:
                hs.append(h0)
                continue
            h_new = cell(x[:, t], h)
            if t > 1:
                h_new = jax.lax.stop_gradient(h_new)
            h = h_new
            hs.append(h)
        return jnp.stack(hs, axis=1)


class RadarBEVTemporalEncoder(nn.Module):
    embed_dims: int = 256
    hidden: int = 64
    downsample_ratio: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bev: jax.Array) -> jax.Array:
        """bev: [B, T, H, W, C] -> temporally fused [B, T, H, W, C]."""
        B, T, H, W, C = bev.shape
        r = self.downsample_ratio
        flat = bev.reshape(B * T, H, W, C)
        down = nn.Conv(
            self.hidden, (3, 3), strides=(r, r), padding=[(1, 1), (1, 1)],
            dtype=self.dtype, name="downsample",
        )(flat).reshape(B, T, H // r, W // r, self.hidden)

        h = ConvGRU(self.hidden, dtype=self.dtype, name="gru")(down)

        from .layers import resize_bilinear_align_corners

        h = h.reshape(B * T, H // r, W // r, self.hidden)
        # reference: nn.Upsample(scale_factor=2, mode='bilinear',
        # align_corners=True) (`racformer_transformer.py:638`)
        h = resize_bilinear_align_corners(h, (H, W))
        h = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype, name="up_conv")(h)

        fused = jnp.concatenate([flat, h], axis=-1)
        fused = nn.Conv(
            self.embed_dims, (3, 3), padding="SAME", dtype=self.dtype,
            name="temporal_fusion",
        )(fused)
        return fused.reshape(B, T, H, W, C)
