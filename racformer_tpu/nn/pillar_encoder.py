"""Radar pillar branch: PFN-style point encoder + dense BEV scatter + conv stack.

Capability match for the reference's radar path
(`/root/reference/models/racformer.py:77-148`): Voxelization +
PillarFeatureNet(7ch -> 64) + PointPillarsScatter(128x128) + a 3-layer
Conv-BN-ReLU stack (64 -> 64 -> 256). Realized TPU-natively with the dense
segment ops in `ops.pillars`, including the reference's `max_num_points=10`
per-pillar cap (`configs/..._f8.py:122-127`) via a static-shape first-k rank
filter (see `ops.pillars.cap_pillar_points`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.pillars import PillarGrid, augment_pillar_points, pillar_bev_features
from .layers import ConvBN


class RadarPillarEncoder(nn.Module):
    feat_channels: int = 64
    out_channels: int = 256
    # reference hard-voxelization cap (first k points per pillar in point
    # order); 0 disables
    max_pts_per_pillar: int = 10
    grid: PillarGrid = PillarGrid(
        pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
        voxel_size=(0.8, 0.8, 8.0),
        nx=128,
        ny=128,
    )
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, mask, train: bool = False):
        """Args:
          points: [B, P, 7] padded radar points (x, y, z, rcs, vx, vy, t).
          mask: [B, P] validity.

        Returns [B, ny, nx, out_channels].

        The z coordinate is zeroed before pillarization, matching
        `extract_pts_feat` (`models/racformer.py:135-137`).
        """
        points = jnp.asarray(points).at[..., 2].set(0.0)
        feats, ids, valid = jax.vmap(
            lambda p, m: augment_pillar_points(
                p, m, self.grid, self.max_pts_per_pillar)
        )(points, mask)

        x = nn.Dense(
            self.feat_channels, use_bias=False, dtype=self.dtype, name="pfn_linear"
        )(feats.astype(self.dtype))
        # PFN BatchNorm1d(eps=1e-3, momentum=0.01). Train-time stats include
        # the zeroed padding points — the reference's PFN has the same
        # zero-padded-stats quirk; eval uses running averages either way.
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            use_fast_variance=False, dtype=self.dtype, name="pfn_bn",
        )(x)
        x = nn.relu(x)

        bev = jax.vmap(lambda f, i, v: pillar_bev_features(f, i, v, self.grid))(
            x, ids, valid
        )  # [B, ny, nx, feat]

        bev = ConvBN(self.feat_channels, 3, dtype=self.dtype, name="conv1")(bev, train)
        bev = ConvBN(self.feat_channels, 3, dtype=self.dtype, name="conv2")(bev, train)
        bev = ConvBN(self.out_channels, 3, dtype=self.dtype, name="conv3")(bev, train)
        return bev
