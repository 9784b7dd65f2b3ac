"""Box codecs and polar (theta, d) transforms.

Semantics match the reference toolkit (`/root/reference/models/bbox/utils.py:7-107`
and `/root/reference/models/utils.py:48-103`), re-expressed as pure JAX functions
operating on trailing-axis feature vectors. All functions are shape-polymorphic
over leading axes and safe under `jit`/`vmap`/`grad`.

Box layouts used throughout the framework:
  * "raw" 9-dim box:       [cx, cy, cz, w, l, h, yaw, vx, vy]
  * "normalized" 10-dim:   [cx, cy, log w, log l, cz, log h, sin yaw, cos yaw, vx, vy]
  * "encoded" 10-dim:      [nx, ny, nz, log w, log l, log h, sin yaw, cos yaw, vx, vy]
    where nx/ny/nz are pc_range-normalized centers in [0, 1]
  * "polar query" 10-dim:  [theta, d, nz, log w, log l, log h, sin yaw, cos yaw, vx, vy]
    with theta in [0, 1] (angle / 2pi) and d the BEV radius / 65 m.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_bbox(bboxes: jax.Array) -> jax.Array:
    """[..., >=7] raw box -> 10-dim (or 8-dim) normalized box.

    Mirrors `normalize_bbox` (`models/bbox/utils.py:7-23`): note the permuted
    output order [cx, cy, w, l, cz, h, sin, cos, (vx, vy)] with log sizes.
    """
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts.append(bboxes[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(normalized: jax.Array) -> jax.Array:
    """Inverse of :func:`normalize_bbox` (`models/bbox/utils.py:26-46`)."""
    rot = jnp.arctan2(normalized[..., 6:7], normalized[..., 7:8])
    cx, cy, cz = normalized[..., 0:1], normalized[..., 1:2], normalized[..., 4:5]
    w = jnp.exp(normalized[..., 2:3])
    l = jnp.exp(normalized[..., 3:4])
    h = jnp.exp(normalized[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if normalized.shape[-1] > 8:
        parts.append(normalized[..., 8:10])
    return jnp.concatenate(parts, axis=-1)


def encode_bbox(bboxes: jax.Array, pc_range=None) -> jax.Array:
    """Raw box -> pc_range-normalized encoded box (`models/bbox/utils.py:49-63`)."""
    xyz = bboxes[..., 0:3]
    if pc_range is not None:
        lo = jnp.asarray(pc_range[0:3], dtype=bboxes.dtype)
        hi = jnp.asarray(pc_range[3:6], dtype=bboxes.dtype)
        xyz = (xyz - lo) / (hi - lo)
    wlh = jnp.log(bboxes[..., 3:6])
    rot = bboxes[..., 6:7]
    parts = [xyz, wlh, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts.append(bboxes[..., 7:9])
    return jnp.concatenate(parts, axis=-1)


def decode_bbox(bboxes: jax.Array, pc_range=None) -> jax.Array:
    """Encoded box -> raw box (`models/bbox/utils.py:66-80`)."""
    xyz = bboxes[..., 0:3]
    if pc_range is not None:
        lo = jnp.asarray(pc_range[0:3], dtype=bboxes.dtype)
        hi = jnp.asarray(pc_range[3:6], dtype=bboxes.dtype)
        xyz = xyz * (hi - lo) + lo
    wlh = jnp.exp(bboxes[..., 3:6])
    rot = jnp.arctan2(bboxes[..., 6:7], bboxes[..., 7:8])
    parts = [xyz, wlh, rot]
    if bboxes.shape[-1] > 8:
        parts.append(bboxes[..., 8:10])
    return jnp.concatenate(parts, axis=-1)


def theta_d_pair_to_xy(theta: jax.Array, d: jax.Array,
                       map_size: float = 102.4, r: float = 65.0):
    """Unstacked variant of :func:`theta_d_to_xy`: separate (theta, d)
    arrays in, separate clamped (x, y) out. The hot BEV sampling path uses
    this to avoid materializing trailing-2 stacked tensors (bad TPU
    layouts) that are immediately unstacked again."""
    center = map_size / 2.0
    ang = theta * TWO_PI
    rad = d * r
    x = jnp.clip((center + rad * jnp.cos(ang)) / map_size, 0.0, 1.0)
    y = jnp.clip((center + rad * jnp.sin(ang)) / map_size, 0.0, 1.0)
    return x, y


def theta_d_to_xy(theta_d: jax.Array, map_size: float = 102.4, r: float = 65.0) -> jax.Array:
    """Polar (theta, d) -> normalized BEV (x, y), both in [0, 1].

    theta is the angle normalized by 2*pi, d the radius normalized by ``r``.
    The xy outputs are clamped to [0, 1]. Trailing channels pass through.
    Mirrors `theta_d2xy_coods` (`models/bbox/utils.py:82-90`).
    """
    x, y = theta_d_pair_to_xy(theta_d[..., 0:1], theta_d[..., 1:2],
                              map_size, r)
    xy = jnp.concatenate([x, y], axis=-1)
    return jnp.concatenate([xy, theta_d[..., 2:]], axis=-1)


def xy_to_theta_d(xy: jax.Array, map_size: float = 102.4, r: float = 65.0, norm: bool = True) -> jax.Array:
    """Normalized BEV (x, y) -> polar (theta, d). Inverse of :func:`theta_d_to_xy`.

    Mirrors `xy2theta_d_coods` (`models/bbox/utils.py:93-106`).
    """
    if norm:
        dx = xy[..., 0:1] * map_size - map_size / 2.0
        dy = xy[..., 1:2] * map_size - map_size / 2.0
        d = jnp.sqrt(dx * dx + dy * dy) / r
        theta = jnp.arctan2(dy, dx)
        theta = jnp.mod(theta + TWO_PI, TWO_PI) / TWO_PI
    else:
        dx, dy = xy[..., 0:1], xy[..., 1:2]
        d = jnp.sqrt(dx * dx + dy * dy)
        theta = jnp.mod(jnp.arctan2(dy, dx) + TWO_PI, TWO_PI)
    return jnp.concatenate([theta, d, xy[..., 2:]], axis=-1)


def rotation_2d_in_bev(points: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate point offsets about +z by per-box yaw.

    points: [..., P, 3], angles: [..., 1]. Uses the current (non-legacy) box
    convention of `rotation_3d_in_axis` (`models/utils.py:48-84`), i.e.
    p' = p @ [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]].
    """
    ang = angles[..., 0]
    c, s = jnp.cos(ang), jnp.sin(ang)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    xr = x * c[..., None] - y * s[..., None]
    yr = x * s[..., None] + y * c[..., None]
    return jnp.stack([xr, yr, z], axis=-1)


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Numerically-clamped logit (`models/utils.py:87-101`)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
