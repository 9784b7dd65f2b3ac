"""Single-level multi-head deformable attention sampling.

TPU-native replacement for mmcv's `ms_deform_attn` CUDA op as used by the
reference's `BEVSelfAttention` over the 8-frame BEV queue
(`/root/reference/models/bev_self_attention.py:192-204`; pytorch fallback
`mmcv.ops.multi_scale_deformable_attn_pytorch`). Only the single-level case is
needed (the BEV map is one 128x128 level).

Semantics: sampling grid `loc * 2 - 1` fed to `grid_sample(align_corners=False,
padding_mode='zeros')`, i.e. pixel coords `x_pix = x_norm * W - 0.5`; output is
the attention-weighted sum over points, per head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .bilinear import bilinear_sample_nhwc


def deform_attn_single_level(
    value: jax.Array,
    loc: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Args:
      value: [S, H, W, M, c] — S batch slabs (B * num_bev_queue), M heads,
        c = embed_dims // M channels per head.
      loc: [S, Q, M, P, 2] — (x, y) sampling locations normalized to [0, 1].
      weights: [S, Q, M, P] — attention weights.

    Returns: [S, Q, M * c].
    """
    S, H, W, M, c = value.shape
    Q, P = loc.shape[1], loc.shape[3]

    x_pix = loc[..., 0] * W - 0.5  # align_corners=False mapping
    y_pix = loc[..., 1] * H - 0.5

    def per_slab(val, xp, yp, w):
        # val: [H, W, M, c]; xp/yp: [Q, M, P]; w: [Q, M, P]
        def per_head(val_h, xh, yh, wh):
            # val_h: [H, W, c]; xh/yh/wh: [Q, P]
            s = bilinear_sample_nhwc(val_h, xh, yh)  # [Q, P, c]
            return jnp.sum(s * wh[..., None].astype(s.dtype), axis=1)  # [Q, c]

        out = jax.vmap(per_head, in_axes=(2, 1, 1, 1), out_axes=1)(
            val, xp, yp, w
        )  # [Q, M, c]
        return out.reshape(Q, M * c)

    return jax.vmap(per_slab)(value, x_pix, y_pix, weights)
