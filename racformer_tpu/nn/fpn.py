"""Feature pyramid necks (NHWC).

`FPN` matches mmdet's default FPN as configured by the reference
(`configs/racformer_r50_nuimg_704x256_f8.py:78-82`: 4 in levels -> 4 out
levels, no extra convs, no norms, nearest-neighbor top-down upsampling).

`CustomFPN` matches the reference's single-output variant
(`/root/reference/models/necks/fpn.py:11-204` with `in_channels=[1024, 2048],
out_ids=[0]`): full top-down pathway but only the selected level gets a 3x3
output conv.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def _upsample_nearest(x, target_hw):
    B, H, W, C = x.shape
    th, tw = target_hw
    fy, fx = th // H, tw // W
    x = jnp.repeat(x, fy, axis=1)
    x = jnp.repeat(x, fx, axis=2)
    return x[:, :th, :tw]


class FPN(nn.Module):
    out_channels: int = 256
    num_levels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"fpn{i}",
            )(laterals[i])
            for i in range(len(laterals))
        ]
        return tuple(outs[: self.num_levels])


class CustomFPN(nn.Module):
    out_channels: int = 256
    out_id: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(x)
            for i, x in enumerate(inputs)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        return nn.Conv(
            self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name="fpn_out"
        )(laterals[self.out_id])
