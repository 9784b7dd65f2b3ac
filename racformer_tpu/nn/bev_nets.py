"""BEV-space auxiliary networks.

`BEVResNet` matches `CustomResNet` (`/root/reference/models/backbones/resnet.py:11-90`):
a small BasicBlock resnet over BEV maps, used as the optional `pre_process`
net (off in the default config but part of the capability surface).

`FPNLSS` matches `FPN_LSS` (`/root/reference/models/necks/lss_fpn.py:11-100`):
BEVDet-style 2-level concat-upsample neck.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .depthnet import BasicBlock
from .layers import ConvBN


class _StridedBasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out = ConvBN(self.features, 3, stride=self.stride, dtype=self.dtype,
                     name="conv1")(x, train)
        out = ConvBN(self.features, 3, act=False, dtype=self.dtype, name="conv2")(out, train)
        # 3x3 strided conv downsample on the identity (CustomResNet uses a
        # bare conv, no norm, `resnet.py:64-66`)
        identity = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], dtype=self.dtype, name="downsample",
        )(x)
        return nn.relu(out + identity)


class BEVResNet(nn.Module):
    num_layer: Sequence[int] = (2, 2, 2)
    num_channels: Optional[Sequence[int]] = None
    stride: Sequence[int] = (2, 2, 2)
    output_ids: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        chans = self.num_channels or [cin * 2 ** (i + 1) for i in range(len(self.num_layer))]
        out_ids = self.output_ids if self.output_ids is not None else range(len(self.num_layer))
        feats = []
        for i, (n, ch, st) in enumerate(zip(self.num_layer, chans, self.stride)):
            x = _StridedBasicBlock(ch, st, dtype=self.dtype, name=f"l{i}_0")(x, train)
            for j in range(n - 1):
                x = BasicBlock(ch, dtype=self.dtype, name=f"l{i}_{j + 1}")(x, train)
            if i in out_ids:
                feats.append(x)
        return feats


def _upsample_bilinear(x, factor):
    # reference FPN_LSS: nn.Upsample(..., mode='bilinear',
    # align_corners=True) (`necks/lss_fpn.py:25-26,64-67`)
    from .layers import resize_bilinear_align_corners

    B, H, W, C = x.shape
    return resize_bilinear_align_corners(x, (H * factor, W * factor))


class FPNLSS(nn.Module):
    out_channels: int
    scale_factor: int = 4
    input_feature_index: tuple = (0, 2)
    extra_upsample: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        x1 = _upsample_bilinear(x1, self.scale_factor)
        x = jnp.concatenate([x2, x1], axis=-1)
        cf = 2 if self.extra_upsample else 1
        x = ConvBN(self.out_channels * cf, 3, use_bias=False, dtype=self.dtype,
                   name="conv1")(x, train)
        x = ConvBN(self.out_channels * cf, 3, use_bias=False, dtype=self.dtype,
                   name="conv2")(x, train)
        if self.extra_upsample:
            x = _upsample_bilinear(x, self.extra_upsample)
            x = ConvBN(self.out_channels, 3, use_bias=False, dtype=self.dtype,
                       name="up_conv")(x, train)
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="up_proj")(x)
        return x
