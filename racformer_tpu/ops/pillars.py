"""Radar pillar ops: dense, fixed-shape pillarization on the BEV grid.

TPU-native replacement for mmdet3d's `Voxelization` + `PointPillarsScatter`
machinery used by the reference radar branch (`/root/reference/models/racformer.py:77-99,
129-177`). Instead of hard voxelization into a dynamic `[num_voxels, max_pts, C]`
tensor, we keep the padded point set `[P_max, C]` and use segment reductions
over the (small) 128x128 pillar grid directly:

  * cluster means via `segment_sum` / counts,
  * per-point feature augmentation (cluster + center offsets),
  * the PFN's per-pillar max-pool via `segment_max` straight into the grid.

This is mathematically equivalent to PillarFeatureNet (max is order-free),
including the reference's `max_num_points=10` per-pillar cap
(`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:122-127`): hard
voxelization keeps the FIRST k points of each voxel in point order, which
`cap_pillar_points` reproduces with a static-shape stable-sort rank instead
of a dynamic `[num_voxels, max_pts, C]` tensor. The cap feeds both the
cluster means and the max-pool, exactly like the dense formulation. Radar
clouds are ~1-2k points, so the padded point count stays small and
everything is static-shaped.
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


def cap_pillar_points(ids: jax.Array, valid: jax.Array, max_pts: int,
                      dummy_id: int) -> jax.Array:
    """First-k-per-pillar cap: returns `valid` with every point whose
    within-pillar arrival rank is >= max_pts turned off.

    Matches mmdet3d hard voxelization's `max_num_points` semantics (the
    deterministic variant keeps the first `max_pts` points of each voxel in
    point order; `/root/reference/models/racformer.py:151-177` + config
    `:122-127`). Static-shaped: a stable argsort groups each pillar's points
    while preserving arrival order, the rank is position minus segment
    start, and the rank is scattered back to point order.
    """
    P = ids.shape[0]
    key = jnp.where(valid, ids, dummy_id)
    order = jnp.argsort(key, stable=True)
    sk = jnp.take(key, order)
    pos = jnp.arange(P, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    start = jax.lax.associative_scan(jnp.maximum,
                                     jnp.where(is_start, pos, 0))
    rank_sorted = pos - start
    rank = jnp.zeros((P,), jnp.int32).at[order].set(rank_sorted)
    return valid & (rank < max_pts)


def augment_pillar_points(points: jax.Array, mask: jax.Array, grid: PillarGrid,
                          max_pts_per_pillar: int = 0):
    """Build the 13-channel PFN input per point.

    points: [P, 7] (x, y, z, rcs, vx_comp, vy_comp, t_lag); mask: [P].
    Returns (features [P, 13], ids [P], valid [P]):
      [raw 7 | xyz - cluster_mean 3 | xyz - pillar_center 3]
    matching mmdet3d's PillarFeatureNet with `with_cluster_center` and
    `with_voxel_center` (non-legacy 3-channel center offset).

    `max_pts_per_pillar > 0` applies the reference's hard-voxelization cap
    BEFORE the cluster means, so capped points contribute to neither the
    means nor the downstream max-pool (exact `max_num_points=10` semantics).
    """
    num_seg = grid.ny * grid.nx + 1
    ids, valid = pillar_indices(points[:, :2], mask, grid)
    if max_pts_per_pillar and max_pts_per_pillar > 0:
        valid = cap_pillar_points(ids, valid, max_pts_per_pillar,
                                  grid.ny * grid.nx)
        ids = jnp.where(valid, ids, grid.ny * grid.nx)
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
