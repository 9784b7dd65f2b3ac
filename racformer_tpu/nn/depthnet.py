"""Radar-assisted DepthNet (camera-aware SE + ASPP + radar depth/RCS grids).

Matches `/root/reference/models/necks/view_transformer_racformer.py:481-567`
(DepthNet), `:329-436` (ASPP), `:465-478` (SELayer): reduce conv -> SE-modulated
context and depth branches from a 9-dim camera embedding, depth branch
concatenated with radar depth one-hot grids (D+1 ch) and a 32-ch RCS embedding,
projected, then 3 BasicBlocks + ASPP + 1x1 to D depth logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import ConvBN, MlpBlock, SELayer


class BasicBlock(nn.Module):
    """mmdet ResNet BasicBlock (3x3 + 3x3, residual)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.features, 3, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBN(self.features, 3, act=False, dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + x)


class ASPP(nn.Module):
    mid: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a1 = ConvBN(self.mid, 1, use_bias=False, dtype=self.dtype, name="aspp1")(x, train)
        a2 = ConvBN(self.mid, 3, dilation=6, use_bias=False, dtype=self.dtype, name="aspp2")(x, train)
        a3 = ConvBN(self.mid, 3, dilation=12, use_bias=False, dtype=self.dtype, name="aspp3")(x, train)
        a4 = ConvBN(self.mid, 3, dilation=18, use_bias=False, dtype=self.dtype, name="aspp4")(x, train)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = ConvBN(self.mid, 1, use_bias=False, dtype=self.dtype, name="gap_conv")(gap, train)
        gap = jnp.broadcast_to(gap, a4.shape)
        out = jnp.concatenate([a1, a2, a3, a4, gap], axis=-1)
        out = ConvBN(self.mid, 1, use_bias=False, dtype=self.dtype, name="project")(out, train)
        # reference applies Dropout(0.5) here; kept as identity at eval and
        # enabled at train through the module's deterministic flag.
        return nn.Dropout(0.5, deterministic=not train)(out)


class DepthNet(nn.Module):
    mid_channels: int = 256
    context_channels: int = 256
    depth_channels: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, radar_depth_grids, rcs_embedding, mlp_input, train: bool = False):
        """Args:
          x: [BN, H, W, C] image features (1/16).
          radar_depth_grids: [BN, H, W, D+1] one-hot radar SID depth grid.
          rcs_embedding: [BN, H, W, 32].
          mlp_input: [BN, 9] flattened inv(lidar2img)[:3,:3] camera embedding.

        Returns [BN, H, W, D + context_channels] (depth logits | context).
        """
        # BatchNorm1d over the 9-dim camera embedding
        # (`view_transformer_racformer.py:506,549`).
        mlp_input = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="mlp_bn",
        )(mlp_input)
        # the reference's reduce_conv Conv2d keeps its default bias even
        # though BN follows (`view_transformer_racformer.py:494-499`) — match
        # it so the released checkpoint's bias has somewhere to go
        x = ConvBN(self.mid_channels, 3, use_bias=True, dtype=self.dtype,
                   name="reduce_conv")(x, train)

        ctx_se = MlpBlock(self.mid_channels, self.mid_channels, dtype=self.dtype, name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, dtype=self.dtype, name="context_se")(x, ctx_se)
        context = nn.Conv(self.context_channels, (1, 1), dtype=self.dtype, name="context_conv")(context)

        dep_se = MlpBlock(self.mid_channels, self.mid_channels, dtype=self.dtype, name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, dtype=self.dtype, name="depth_se")(x, dep_se)
        depth = jnp.concatenate(
            [depth, radar_depth_grids.astype(depth.dtype), rcs_embedding.astype(depth.dtype)],
            axis=-1,
        )
        depth = nn.Conv(self.mid_channels, (1, 1), dtype=self.dtype, name="dep_proj")(depth)
        depth = BasicBlock(self.mid_channels, dtype=self.dtype, name="block1")(depth, train)
        depth = BasicBlock(self.mid_channels, dtype=self.dtype, name="block2")(depth, train)
        depth = BasicBlock(self.mid_channels, dtype=self.dtype, name="block3")(depth, train)
        depth = ASPP(self.mid_channels, dtype=self.dtype, name="aspp")(depth, train)
        depth = nn.Conv(self.depth_channels, (1, 1), dtype=self.dtype, name="depth_out")(depth)
        return jnp.concatenate([depth, context], axis=-1)
