"""ResNet-50 image backbone (NHWC, torch-style "pytorch" block layout).

Capability match for the reference's mmdet ResNet config
(`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:67-76`):
depth 50, outputs C2..C5, BN always in eval mode (`norm_eval=True` ->
:class:`FrozenBatchNorm`), stride-on-3x3 bottlenecks ("pytorch" style),
activation checkpointing per stage (`with_cp=True` -> `nn.remat`).

Stage-1 freezing (`frozen_stages=1`) is handled at the optimizer level
(zero lr on stem+layer1 params) rather than in the module.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import FrozenBatchNorm


class Bottleneck(nn.Module):
    planes: int  # bottleneck width; out channels = planes * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    dtype: Any = jnp.float32
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    remat: bool = True

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] -> (C2 [/4, 256], C3 [/8, 512], C4 [/16, 1024], C5 [/32, 2048])."""
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = 64
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        for stage, n_blocks in enumerate(self.stage_blocks):
            stride = 1 if stage == 0 else 2
            for i in range(n_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            outs.append(x)
            planes *= 2
        return tuple(outs)
