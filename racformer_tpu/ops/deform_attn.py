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

from .bilinear import bilinear_sample_views_nhwc


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

    The head axis is folded into the flattened gather index (one gather per
    corner for all heads/queries/points) — the same trick the MSMV sampler
    uses for the view axis; ~50x faster on TPU than a per-head vmap.
    """
    S, H, W, M, c = value.shape
    Q, P = loc.shape[1], loc.shape[3]

    x_pix = loc[..., 0] * W - 0.5  # align_corners=False mapping
    y_pix = loc[..., 1] * H - 0.5

    val_h = value.transpose(0, 3, 1, 2, 4)  # [S, M, H, W, c]
    head = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :, None], (Q, M, P)
    )
    head = jnp.broadcast_to(head[None], (S, Q, M, P))
    out = jax.vmap(bilinear_sample_views_nhwc)(val_h, head, x_pix, y_pix)
    out = jnp.sum(out * weights[..., None].astype(out.dtype), axis=3)  # [S, Q, M, c]
    return out.reshape(S, Q, M * c)
