"""Common NN building blocks (flax.linen, NHWC).

Conventions:
  * all convs operate on channel-last tensors (TPU-native layout);
  * parameters are stored in f32; modules take a `dtype` for compute precision
    (bf16 in the trunk, f32 in the decoder/head numerics);
  * BatchNorm under GSPMD data parallelism is synchronous for free: the batch
    mean under `jit` over a sharded batch axis is the global mean (XLA inserts
    the collectives), which replaces the reference's SyncBN conversion
    (`/root/reference/train.py:126-128`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn


def resize_bilinear_align_corners(x, out_hw):
    """Exact `torch.nn.Upsample(mode='bilinear', align_corners=True)` on
    [..., H, W, C] (separable endpoint-anchored lerp).

    The reference uses align_corners=True at every bilinear upsample
    (`racformer_transformer.py:638` ConvGRU, `necks/lss_fpn.py:25-26,64-67`
    FPN_LSS); `jax.image.resize('bilinear')` is half-pixel
    (align_corners=False) and deviates by up to half a source pixel at the
    borders — a real checkpoint-parity skew caught by the flagship-shape
    integration golden."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw

    def axis_interp(a, n_in, n_out, axis):
        if n_in == n_out:
            return a
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,), jnp.float32)
        else:
            pos = jnp.linspace(0.0, n_in - 1.0, n_out)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(a.dtype)
        shape = [1] * a.ndim
        shape[axis] = n_out
        w = w.reshape(shape)
        return (jnp.take(a, lo, axis=axis) * (1 - w)
                + jnp.take(a, hi, axis=axis) * w)

    x = axis_interp(x, H, Ho, x.ndim - 3)
    return axis_interp(x, W, Wo, x.ndim - 2)


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored running statistics (affine learnable).

    Matches the reference backbone's `norm_eval=True` BN semantics
    (`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:67-76`): the
    running mean/var never update, scale/bias may still train.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        ).value
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        ).value
        # fold into a single multiply-add in compute dtype
        inv = (scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + 1e-5)).astype(self.dtype)
        return x.astype(self.dtype) * inv + b


def make_norm(norm: str, train: bool, dtype=jnp.float32, name=None):
    if norm == "frozen_bn":
        return FrozenBatchNorm(dtype=dtype, name=name)
    if norm == "bn":
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if norm == "bn1d_pfn":  # mmdet3d PFN norm cfg: eps 1e-3, momentum 0.01
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=dtype,
            name=name,
        )
    if norm == "ln":
        return nn.LayerNorm(dtype=dtype, name=name)
    raise ValueError(norm)


class ConvBN(nn.Module):
    """Conv2D + norm + optional ReLU (NHWC)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "bn"
    act: bool = True
    use_bias: Optional[bool] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME" if self.kernel > 1 else "VALID",
            use_bias=bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.norm is not None:
            x = make_norm(self.norm, train, self.dtype, name="norm")(x)
        if self.act:
            x = nn.relu(x)
        return x


class MlpBlock(nn.Module):
    """fc1 -> act -> fc2 (the DepthNet `Mlp`,
    `/root/reference/models/necks/view_transformer_racformer.py:439-462`)."""

    hidden: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class FFN(nn.Module):
    """mmcv-style FFN with residual: x + Linear(drop(act(Linear(x))))."""

    hidden: int
    dtype: Any = jnp.float32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class SELayer(nn.Module):
    """Camera-aware squeeze-excite (`view_transformer_racformer.py:465-478`)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, x_se):
        # x: [B, H, W, C]; x_se: [B, C] conditioning vector
        s = nn.Dense(self.channels, dtype=self.dtype, name="conv_reduce")(x_se)
        s = nn.relu(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="conv_expand")(s)
        return x * nn.sigmoid(s)[:, None, None, :]
