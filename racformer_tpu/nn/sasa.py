"""Scale-Adaptive Self-Attention (SASA).

Matches `ScaleAdaptiveSelfAttention` (`/root/reference/models/racformer_transformer.py:282-335`):
standard multi-head self-attention over queries with an additive bias
`-||c_i - c_j|| * tau_h` where tau is a learned per-head scale from the query
feature, plus the DN group-blocking mask merged as -inf. Residual + dropout
follow mmcv's MultiheadAttention wrapper.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bbox_codec import decode_bbox, theta_d_to_xy


class ScaleAdaptiveSelfAttention(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_bbox: jax.Array,
        query_feat: jax.Array,
        attn_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        """query_bbox: [B, Q, 10] polar queries; query_feat: [B, Q, C];
        attn_mask: optional [Q, Q] bool (True = blocked, DN grouping)."""
        B, Q, C = query_feat.shape
        M = self.num_heads
        c = C // M

        # pairwise -distance bias from decoded BEV centers (no-grad in the
        # reference, `racformer_transformer.py:323-335`)
        centers = jax.lax.stop_gradient(
            decode_bbox(theta_d_to_xy(query_bbox), self.pc_range)[..., :2]
        )  # [B, Q, 2]
        dist = -jnp.linalg.norm(
            centers[:, :, None, :] - centers[:, None, :, :], axis=-1
        )  # [B, Q, Q]

        tau = nn.Dense(M, dtype=jnp.float32, name="gen_tau")(query_feat)  # [B, Q, M]
        # DUMP-equivalent intermediate capture (`models/utils.py:308-316`):
        # run apply(..., mutable=['intermediates']) to collect these
        self.sow("intermediates", "sasa_tau", tau)
        bias = dist[:, None, :, :] * tau.transpose(0, 2, 1)[..., None]  # [B, M, Q, Q]
        if attn_mask is not None:
            bias = jnp.where(attn_mask[None, None, :, :], -jnp.inf, bias)

        q = nn.Dense(C, dtype=self.dtype, name="q_proj")(query_feat)
        k = nn.Dense(C, dtype=self.dtype, name="k_proj")(query_feat)
        v = nn.Dense(C, dtype=self.dtype, name="v_proj")(query_feat)
        q = q.reshape(B, Q, M, c).transpose(0, 2, 1, 3)
        k = k.reshape(B, Q, M, c).transpose(0, 2, 1, 3)
        v = v.reshape(B, Q, M, c).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bmqc,bmkc->bmqk", q, k) / jnp.sqrt(c).astype(q.dtype)
        logits = logits.astype(jnp.float32) + bias
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bmqk,bmkc->bmqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Q, C)
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return query_feat + out
