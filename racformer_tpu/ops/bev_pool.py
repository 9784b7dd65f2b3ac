"""LSS / BEVPoolv2 view transform as in-graph segment reduction.

TPU-native replacement for the reference CUDA op
(`/root/reference/models/csrc/bev_pool_v2/src/bev_pool_cuda.cu:21-48` plus the
index preparation in `models/necks/view_transformer_racformer.py:202-260`).

The CUDA path filters valid frustum points (dynamic shapes), sorts them by
voxel rank, and runs one thread per (interval, channel). On TPU we keep the
full static point set (B*N*D*Hf*Wf) and express the pool as a masked
`segment_sum` into the flattened BEV grid — invalid points get weight zero and
a dummy segment. Autodiff is free. The camera axis is processed via `lax.scan`
to bound the peak memory of the depth x feature outer product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_frustum(input_size, downsample, bin_values):
    """Frustum template [D, Hf, Wf, 3] of (x_pix, y_pix, depth) in input-image
    pixel coordinates (mirrors `view_transformer_racformer.py:87-109`)."""
    H_in, W_in = input_size
    Hf, Wf = H_in // downsample, W_in // downsample
    D = bin_values.shape[0]
    xs = jnp.linspace(0.0, W_in - 1, Wf)
    ys = jnp.linspace(0.0, H_in - 1, Hf)
    x = jnp.broadcast_to(xs[None, None, :], (D, Hf, Wf))
    y = jnp.broadcast_to(ys[None, :, None], (D, Hf, Wf))
    d = jnp.broadcast_to(bin_values[:, None, None], (D, Hf, Wf))
    return jnp.stack([x, y, d], axis=-1)


def frustum_grid(frustum, img2lidar, grid_lower, grid_interval, grid_size):
    """Project the frustum into lidar space and quantize to voxel indices.

    Args:
      frustum: [D, Hf, Wf, 3] (x_pix, y_pix, depth).
      img2lidar: [N, 4, 4] inverse projection per camera.
      grid_lower / grid_interval: length-3 (x, y, z).
      grid_size: static (nx, ny, nz) ints.

    Returns (vox_idx [N, D, Hf, Wf] int32 flattened rank y*nx+x (+z plane),
             valid [N, D, Hf, Wf] bool).

    Mirrors `get_lidar_coor` (`view_transformer_racformer.py:112-153`): the
    frustum (u, v, d) is homogenized as (u*d, v*d, d, 1) before applying
    img2lidar (with d clamped to >= eps).
    """
    eps = 1e-5
    nx, ny, nz = grid_size
    d = jnp.maximum(frustum[..., 2:3], eps)
    uvd1 = jnp.concatenate(
        [frustum[..., 0:2] * d, frustum[..., 2:3], jnp.ones_like(d)], axis=-1
    )  # [D, Hf, Wf, 4]
    # [N, D, Hf, Wf, 3] = einsum over the 4x4
    xyz = jnp.einsum("nij,dhwj->ndhwi", img2lidar[:, :3, :], uvd1)
    coor = (xyz - jnp.asarray(grid_lower)) / jnp.asarray(grid_interval)
    # torch `.long()` truncates toward zero (`voxel_pooling_prepare_v2`,
    # view_transformer_racformer.py:227); match that rather than floor.
    ci = coor.astype(jnp.int32)
    # NOTE: the bounds check runs on the *truncated* coords, exactly like the
    # reference (`view_transformer_racformer.py:233-235`): coords in (-1, 0)
    # truncate to 0 and are kept. Deliberately matched for parity.
    valid = (
        (ci[..., 0] >= 0) & (ci[..., 0] < nx)
        & (ci[..., 1] >= 0) & (ci[..., 1] < ny)
        & (ci[..., 2] >= 0) & (ci[..., 2] < nz)
    )
    rank = (ci[..., 2] * ny + ci[..., 1]) * nx + ci[..., 0]
    rank = jnp.where(valid, rank, nx * ny * nz)  # dummy segment for invalid
    return rank, valid


def bev_pool(depth, feat, vox_rank, valid, grid_size):
    """Weighted splat of camera features into the BEV grid.

    Args:
      depth: [N, D, Hf, Wf] softmaxed depth distribution.
      feat:  [N, Hf, Wf, C] context features.
      vox_rank: [N, D, Hf, Wf] int32 from :func:`frustum_grid`.
      valid: [N, D, Hf, Wf] bool.
      grid_size: static (nx, ny, nz).

    Returns [ny, nx, nz * C] (z collapsed into channels, matching the
    reference's `torch.cat(bev_feat.unbind(2), 1)` with nz == 1).
    """
    nx, ny, nz = grid_size
    C = feat.shape[-1]
    num_seg = nx * ny * nz + 1  # + dummy

    def cam_step(acc, xs):
        d, f, r, v = xs  # [D,Hf,Wf], [Hf,Wf,C], [D,Hf,Wf], [D,Hf,Wf]
        w = jnp.where(v, d, 0.0)
        prod = w[..., None] * f[None, :, :, :]  # [D, Hf, Wf, C]
        seg = jax.ops.segment_sum(
            prod.reshape(-1, C), r.reshape(-1), num_segments=num_seg
        )
        return acc + seg, None

    init = jnp.zeros((num_seg, C), dtype=feat.dtype)
    out, _ = jax.lax.scan(cam_step, init, (depth, feat, vox_rank, valid))
    out = out[:-1].reshape(nz, ny, nx, C)
    # collapse z into channels: [ny, nx, nz*C]
    return jnp.concatenate([out[z] for z in range(nz)], axis=-1)
