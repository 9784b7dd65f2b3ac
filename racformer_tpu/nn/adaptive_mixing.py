"""AdaMixer-style adaptive mixing (`/root/reference/models/racformer_transformer.py:549-616`):
per-query generated channel-mix M [c_in, c_out] and point-mix S [P_out, P_in]
matrices applied groupwise, each followed by LayerNorm over the last two axes
and ReLU, then an output projection with residual.

These are exactly the per-query batched matmuls the MXU loves; everything is
one einsum per mix.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def _ln2d(x):
    """F.layer_norm over the last two axes, no affine."""
    mean = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class AdaptiveMixing(nn.Module):
    in_points: int = 96
    out_points: int = 128
    n_groups: int = 4
    embed_dims: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query):
        """x: [B, Q, G, P_in, c] sampled features; query: [B, Q, C]."""
        B, Q, G, P, c = x.shape
        c_out = c  # eff_out_dim == eff_in_dim here
        m_params = c * c_out
        s_params = self.in_points * self.out_points

        params = nn.Dense(
            G * (m_params + s_params),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="parameter_generator",
        )(query)
        params = params.reshape(B, Q, G, m_params + s_params)
        Mmat = params[..., :m_params].reshape(B, Q, G, c, c_out)
        Smat = params[..., m_params:].reshape(B, Q, G, self.out_points, self.in_points)

        out = jnp.einsum("bqgpc,bqgcd->bqgpd", x.astype(self.dtype), Mmat)
        out = nn.relu(_ln2d(out))
        out = jnp.einsum("bqgop,bqgpd->bqgod", Smat, out)
        out = nn.relu(_ln2d(out))

        out = out.reshape(B, Q, G * self.out_points * c_out)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="out_proj")(out)
        return query + out
