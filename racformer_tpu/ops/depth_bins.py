"""SID (spacing-increasing discretization) depth bins.

Matches the quadratic bin layout of the reference LSS view transformer
(`/root/reference/models/necks/view_transformer_racformer.py:52-54` for the
bin centers and `:593-630` for the inverse depth->index map).

With depth config (d_min, d_max, D):
  bin_size = 2 * (d_max - d_min) / (D * (1 + D))
  value(i) = (i + 0.5)^2 * bin_size / 2 - bin_size / 8 + d_min
  index(v) = -0.5 + 0.5 * sqrt(1 + 8 * (v - d_min) / bin_size)   (then floored)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sid_bin_size(d_min: float, d_max: float, num_bins: int) -> float:
    return 2.0 * (d_max - d_min) / (num_bins * (1.0 + num_bins))


def sid_bin_values(d_min: float, d_max: float, num_bins: int) -> jnp.ndarray:
    """Bin-center depth values, shape [num_bins]."""
    bin_size = sid_bin_size(d_min, d_max, num_bins)
    idx = jnp.arange(num_bins, dtype=jnp.float32)
    return (idx + 0.5) ** 2 * bin_size / 2.0 - bin_size / 8.0 + d_min


def depth_to_sid_index(depth: jax.Array, d_min: float, d_max: float, num_bins: int) -> jax.Array:
    """Continuous depth -> integer SID bin index.

    Out-of-range or non-finite depths map to ``num_bins`` (the reference uses
    this as the "background" index, `view_transformer_racformer.py:615-618`).
    """
    bin_size = sid_bin_size(d_min, d_max, num_bins)
    arg = 1.0 + 8.0 * (depth - d_min) / bin_size
    idx = -0.5 + 0.5 * jnp.sqrt(jnp.maximum(arg, 0.0))
    invalid = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx) | (arg < 0)
    idx = jnp.where(invalid, float(num_bins), idx)
    return idx.astype(jnp.int32)
