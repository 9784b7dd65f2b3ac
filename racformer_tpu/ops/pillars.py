"""Radar pillar ops: dense, fixed-shape pillarization on the BEV grid.

TPU-native replacement for mmdet3d's `Voxelization` + `PointPillarsScatter`
machinery used by the reference radar branch (`/root/reference/models/racformer.py:77-99,
129-177`). Instead of hard voxelization into a dynamic `[num_voxels, max_pts, C]`
tensor, we keep the padded point set `[P_max, C]` and use segment reductions
over the (small) 128x128 pillar grid directly:

  * cluster means via `segment_sum` / counts,
  * per-point feature augmentation (cluster + center offsets),
  * the PFN's per-pillar max-pool via `segment_max` straight into the grid.

This is mathematically equivalent to PillarFeatureNet (max is order-free) with
one deliberate deviation: no `max_num_points=10` subsampling per pillar (the
reference's cap exists only to bound the dense voxel tensor; with max-pooling
the cap only discards information). Radar clouds are ~1-2k points, so the
padded point count stays small and everything is static-shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PillarGrid(NamedTuple):
    pc_range: tuple  # (x0, y0, z0, x1, y1, z1)
    voxel_size: tuple  # (vx, vy, vz)
    nx: int
    ny: int


def pillar_indices(points_xy: jax.Array, mask: jax.Array, grid: PillarGrid):
    """points_xy: [P, 2]; mask: [P] bool -> (ids [P] int32 in [0, ny*nx], valid [P]).

    Invalid / out-of-range points get the dummy id ny*nx.
    """
    vx, vy = grid.voxel_size[0], grid.voxel_size[1]
    x0, y0 = grid.pc_range[0], grid.pc_range[1]
    ix = jnp.floor((points_xy[..., 0] - x0) / vx).astype(jnp.int32)
    iy = jnp.floor((points_xy[..., 1] - y0) / vy).astype(jnp.int32)
    valid = mask & (ix >= 0) & (ix < grid.nx) & (iy >= 0) & (iy < grid.ny)
    ids = jnp.where(valid, iy * grid.nx + ix, grid.ny * grid.nx)
    return ids, valid


def augment_pillar_points(points: jax.Array, mask: jax.Array, grid: PillarGrid):
    """Build the 13-channel PFN input per point.

    points: [P, 7] (x, y, z, rcs, vx_comp, vy_comp, t_lag); mask: [P].
    Returns (features [P, 13], ids [P], valid [P]):
      [raw 7 | xyz - cluster_mean 3 | xyz - pillar_center 3]
    matching mmdet3d's PillarFeatureNet with `with_cluster_center` and
    `with_voxel_center` (non-legacy 3-channel center offset).
    """
    num_seg = grid.ny * grid.nx + 1
    ids, valid = pillar_indices(points[:, :2], mask, grid)
    vmask = valid[:, None].astype(points.dtype)

    xyz = points[:, :3] * vmask
    seg_sum = jax.ops.segment_sum(xyz, ids, num_segments=num_seg)
    seg_cnt = jax.ops.segment_sum(vmask, ids, num_segments=num_seg)
    mean = seg_sum / jnp.maximum(seg_cnt, 1.0)
    f_cluster = points[:, :3] - jnp.take(mean, ids, axis=0)

    vx, vy, vz = grid.voxel_size
    x0, y0, z0 = grid.pc_range[0], grid.pc_range[1], grid.pc_range[2]
    ix = (ids % grid.nx).astype(points.dtype)
    iy = ((ids // grid.nx) % grid.ny).astype(points.dtype)
    cx = ix * vx + (vx / 2.0 + x0)
    cy = iy * vy + (vy / 2.0 + y0)
    cz = jnp.full_like(cx, vz / 2.0 + z0)
    f_center = points[:, :3] - jnp.stack([cx, cy, cz], axis=-1)

    feats = jnp.concatenate([points, f_cluster, f_center], axis=-1)
    feats = feats * vmask
    return feats, ids, valid


def pillar_bev_features(point_feats: jax.Array, ids: jax.Array, valid: jax.Array, grid: PillarGrid):
    """Per-pillar max-pool of per-point features onto the dense BEV canvas.

    point_feats: [P, F]; returns [ny, nx, F] with empty pillars = 0
    (PointPillarsScatter semantics, zero canvas).
    """
    num_seg = grid.ny * grid.nx + 1
    neg = jnp.finfo(point_feats.dtype).min
    data = jnp.where(valid[:, None], point_feats, neg)
    pooled = jax.ops.segment_max(data, ids, num_segments=num_seg)
    cnt = jax.ops.segment_sum(
        valid.astype(jnp.int32), ids, num_segments=num_seg
    )
    pooled = jnp.where(cnt[:, None] > 0, pooled, 0.0)
    return pooled[:-1].reshape(grid.ny, grid.nx, -1)
