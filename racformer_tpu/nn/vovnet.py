"""VoVNet backbone family (V-19/39/57/99 with eSE), NHWC.

Capability match for the reference's alternative image backbone
(`/root/reference/models/backbones/vovnet.py`): OSA (one-shot aggregation)
modules — a chain of 3x3 convs whose outputs are concatenated and fused by a
1x1 — with effective squeeze-excite (eSE, hard-sigmoid gate) and identity
connections on repeated blocks; stem of three 3x3 convs (stride 2, 1, 2);
max-pool between stages.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from .layers import make_norm

SPECS: Dict[str, Dict] = {
    "V-19-slim-eSE": dict(stem=(64, 64, 128), stage_conv=(64, 80, 96, 112),
                          stage_out=(112, 256, 384, 512), layers=3,
                          blocks=(1, 1, 1, 1)),
    "V-19-eSE": dict(stem=(64, 64, 128), stage_conv=(128, 160, 192, 224),
                     stage_out=(256, 512, 768, 1024), layers=3,
                     blocks=(1, 1, 1, 1)),
    "V-39-eSE": dict(stem=(64, 64, 128), stage_conv=(128, 160, 192, 224),
                     stage_out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 2, 2)),
    "V-57-eSE": dict(stem=(64, 64, 128), stage_conv=(128, 160, 192, 224),
                     stage_out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 4, 3)),
    "V-99-eSE": dict(stem=(64, 64, 128), stage_conv=(128, 160, 192, 224),
                     stage_out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 3, 9, 3)),
}


class ConvNorm(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = make_norm(self.norm, train, self.dtype, name="norm")(x)
        return nn.relu(x)


class ESE(nn.Module):
    """Effective squeeze-excite: GAP -> 1x1 -> hard sigmoid gate."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2))  # [B, C]
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc")(s)
        gate = jnp.clip(s / 6.0 + 0.5, 0.0, 1.0)  # Hsigmoid(x) = relu6(x+3)/6
        return x * gate[:, None, None, :]


class OSAModule(nn.Module):
    stage_ch: int
    concat_ch: int
    layers: int
    identity: bool = False
    norm: str = "frozen_bn"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        identity = x
        outs = [x]
        h = x
        for i in range(self.layers):
            h = ConvNorm(self.stage_ch, 3, norm=self.norm, dtype=self.dtype,
                         name=f"layer{i}")(h, train)
            outs.append(h)
        cat = jnp.concatenate(outs, axis=-1)
        out = ConvNorm(self.concat_ch, 1, norm=self.norm, dtype=self.dtype,
                       name="concat")(cat, train)
        out = ESE(self.concat_ch, dtype=self.dtype, name="ese")(out)
        if self.identity:
            out = out + identity
        return out


class VoVNet(nn.Module):
    spec_name: str = "V-99-eSE"
    out_stages: Sequence[int] = (2, 3, 4, 5)  # stage2..stage5
    norm: str = "frozen_bn"  # reference uses norm_eval=True
    remat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple:
        spec = SPECS[self.spec_name]
        x = x.astype(self.dtype)
        s1, s2, s3 = spec["stem"]
        x = ConvNorm(s1, 3, 2, self.norm, self.dtype, name="stem1")(x)
        x = ConvNorm(s2, 3, 1, self.norm, self.dtype, name="stem2")(x)
        x = ConvNorm(s3, 3, 2, self.norm, self.dtype, name="stem3")(x)

        outs = []
        osa_cls = nn.remat(OSAModule) if self.remat else OSAModule
        for si in range(4):
            stage_num = si + 2
            if stage_num != 2:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            for b in range(spec["blocks"][si]):
                x = osa_cls(
                    stage_ch=spec["stage_conv"][si],
                    concat_ch=spec["stage_out"][si],
                    layers=spec["layers"],
                    identity=(b > 0),
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"stage{stage_num}_{b}",
                )(x, False)
            if stage_num in self.out_stages:
                outs.append(x)
        return tuple(outs)
