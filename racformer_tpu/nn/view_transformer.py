"""LSS (lift-splat-shoot) view transformer with radar-assisted depth.

TPU-native re-design of `LSSViewTransformerBEVDepth_racformer`
(`/root/reference/models/necks/view_transformer_racformer.py:17-699`): the
frustum is a static template; the per-sample projection + voxel quantization
happens in-graph (`ops.bev_pool.frustum_grid`) and the splat is a masked
segment_sum (`ops.bev_pool.bev_pool`) — no dynamic filtering/sorting, no
custom backward.

Radar conditioning (`:680-699`): the per-pixel radar depth map is min-pooled
to the feature stride, SID-quantized to a (D+1) one-hot grid; the RCS map is
max-pooled and 64-bin one-hot embedded through a 1x1 conv (64 -> 32).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bev_pool import bev_pool, frustum_grid, make_frustum
from ..ops.depth_bins import depth_to_sid_index, sid_bin_values
from .depthnet import DepthNet


def downsample_min_depth(depth: jax.Array, ds: int) -> jax.Array:
    """[BN, H, W] -> [BN, H/ds, W/ds] min over each ds x ds block, zeros
    treated as missing (`get_downsampled_depth`,
    `view_transformer_racformer.py:593-611`)."""
    BN, H, W = depth.shape
    d = jnp.where(depth == 0.0, 1e5, depth)
    d = d.reshape(BN, H // ds, ds, W // ds, ds)
    return jnp.min(d, axis=(2, 4))


def downsample_max_rcs(rcs: jax.Array, ds: int) -> jax.Array:
    """[BN, H, W] -> block max with < -64 treated as missing
    (`get_downsampled_rcs`, `view_transformer_racformer.py:633-655`)."""
    BN, H, W = rcs.shape
    r = jnp.where(rcs < -64.0, -1e5, rcs)
    r = r.reshape(BN, H // ds, ds, W // ds, ds)
    return jnp.max(r, axis=(2, 4))


def rcs_one_hot(rcs: jax.Array, lo: float = -64.0, hi: float = 64.0, bins: int = 64) -> jax.Array:
    """64-bin one-hot RCS grid; out-of-range -> all-zero
    (`view_transformer_racformer.py:656-662`)."""
    bin_size = (hi - lo) / bins
    idx = (rcs - (lo - bin_size)) / bin_size
    idx = jnp.where((idx < bins + 1) & (idx >= -1), idx, -1.0)
    idx = idx.astype(jnp.int32)  # truncation, matching torch .long()
    oh = jax.nn.one_hot(idx, bins + 1, dtype=jnp.float32)
    return oh[..., 1:]  # drop the "missing" bin


class LSSViewTransformer(nn.Module):
    """One-frame view transform: image feats + radar maps -> BEV feature map."""

    input_size: Tuple[int, int] = (256, 704)
    downsample: int = 16
    depth_bins: int = 96
    depth_range: Tuple[float, float] = (1.0, 65.0)
    out_channels: int = 256
    grid_lower: Tuple[float, float, float] = (-51.2, -51.2, -5.0)
    grid_interval: Tuple[float, float, float] = (0.8, 0.8, 8.0)
    grid_size: Tuple[int, int, int] = (128, 128, 1)
    dtype: Any = jnp.float32

    def setup(self):
        self.depth_net = DepthNet(
            mid_channels=256,
            context_channels=self.out_channels,
            depth_channels=self.depth_bins,
            dtype=self.dtype,
            name="depth_net",
        )
        self.rcs_embedding = nn.Dense(32, dtype=self.dtype, name="rcs_embedding")

    @property
    def bin_values(self):
        return sid_bin_values(self.depth_range[0], self.depth_range[1], self.depth_bins)

    def __call__(self, feats, radar_depth, radar_rcs, img2lidar, mlp_input, train: bool = False):
        """Args:
          feats: [B, N, Hf, Wf, C] 1/16 image features for one frame.
          radar_depth / radar_rcs: [B, N, H_img, W_img] raw per-pixel maps.
          img2lidar: [B, N, 4, 4] inverse projection matrices.
          mlp_input: [B, N, 9] camera embeddings.

        Returns (bev [B, ny, nx, out_channels], depth_logits [B, N, Hf, Wf, D]).
        """
        B, N, Hf, Wf, C = feats.shape
        ds = self.downsample
        d_lo, d_hi = self.depth_range

        rd = downsample_min_depth(radar_depth.reshape(B * N, *radar_depth.shape[2:]), ds)
        rad_idx = depth_to_sid_index(rd, d_lo, d_hi, self.depth_bins)
        rad_grids = jax.nn.one_hot(rad_idx, self.depth_bins + 1, dtype=jnp.float32)

        rr = downsample_max_rcs(radar_rcs.reshape(B * N, *radar_rcs.shape[2:]), ds)
        rcs_oh = rcs_one_hot(rr)
        rcs_emb = self.rcs_embedding(rcs_oh.astype(self.dtype))

        x = self.depth_net(
            feats.reshape(B * N, Hf, Wf, C),
            rad_grids,
            rcs_emb,
            mlp_input.reshape(B * N, 9).astype(self.dtype),
            train=train,
        )
        depth_logits = x[..., : self.depth_bins]
        context = x[..., self.depth_bins :]
        depth = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=-1)

        frustum = make_frustum(self.input_size, ds, self.bin_values)

        def pool_one(i2l, dep, ctx):
            # dep: [N, Hf, Wf, D] -> [N, D, Hf, Wf]
            rank, valid = frustum_grid(
                frustum, i2l, self.grid_lower, self.grid_interval, self.grid_size
            )
            return bev_pool(
                dep.transpose(0, 3, 1, 2), ctx, rank, valid, self.grid_size
            )

        bev = jax.vmap(pool_one)(
            img2lidar,
            depth.reshape(B, N, Hf, Wf, self.depth_bins),
            context.astype(jnp.float32).reshape(B, N, Hf, Wf, self.out_channels),
        )
        return bev, depth_logits.reshape(B, N, Hf, Wf, self.depth_bins)
