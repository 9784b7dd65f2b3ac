"""Learned 2D positional encoding for BEV maps (mmcv LearnedPositionalEncoding
as configured at `/root/reference/models/racformer_transformer.py:455-462`):
row and column embeddings of num_feats=128 each, concatenated to embed_dims.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn


class LearnedPositionalEncoding2D(nn.Module):
    num_feats: int = 128
    rows: int = 128
    cols: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int):
        """Returns [h, w, 2 * num_feats]."""
        row = nn.Embed(self.rows, self.num_feats, dtype=self.dtype, name="row_embed")(
            jnp.arange(h)
        )  # [h, F]
        col = nn.Embed(self.cols, self.num_feats, dtype=self.dtype, name="col_embed")(
            jnp.arange(w)
        )  # [w, F]
        # mmcv layout: pos = cat(x_embed(cols) broadcast over rows,
        #                        y_embed(rows) broadcast over cols)
        x_part = jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats))
        y_part = jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats))
        return jnp.concatenate([x_part, y_part], axis=-1)
