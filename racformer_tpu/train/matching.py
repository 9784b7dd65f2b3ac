"""Hungarian set matching for the DETR-style loss.

Cost semantics match `PolarHungarianAssigner3D`
(`/root/reference/models/bbox/assigners/polar_hungarian_assigner_3d.py:16-97`)
with the configured costs (`configs/racformer_r50_nuimg_704x256_f8.py:193-199`):
focal classification cost (w 2.0), code-weighted 10-dim L1 regression cost
(w 0.25), and wrap-around angular ThetaL1 cost (w 3.0).

TPU design: costs are computed in-graph over a static [Q, max_gt] matrix
(invalid GT columns get a large constant so they can't affect valid matches);
only the `linear_sum_assignment` itself runs host-side through
`jax.pure_callback` (the reference also syncs to CPU scipy per sample,
`polar_hungarian_assigner_3d.py:77-88`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bbox_codec import normalize_bbox

BIG = 1.0e8


def match_cost(cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_mask,
               code_weights, cls_weight=2.0, reg_weight=0.25, theta_weight=3.0,
               alpha=0.25, gamma=2.0):
    """cls_scores: [Q, C] logits; bbox_preds: [Q, 10] normalized-layout preds;
    gt_bboxes: [G, 9] raw; gt_labels: [G]; gt_mask: [G]. Returns [Q, G]."""
    eps = 1e-12
    p = jax.nn.sigmoid(cls_scores)
    pos_cost = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    cls_cost = (pos_cost - neg_cost)[:, gt_labels] * cls_weight  # [Q, G]

    gt_norm = normalize_bbox(gt_bboxes)  # [G, 10]
    cw = jnp.asarray(code_weights)
    pred_w = bbox_preds * cw
    gt_w = gt_norm * cw
    reg_cost = jnp.sum(
        jnp.abs(pred_w[:, None, :] - gt_w[None, :, :]), axis=-1
    ) * reg_weight

    # angular cost: atan2 of the (code-weight-scaled) BEV centers — the scale
    # cancels inside atan2, matching the reference's effective behavior
    # (`match_cost.py:50-66`)
    tp = jnp.mod(jnp.arctan2(pred_w[:, 1], pred_w[:, 0]) + 2 * jnp.pi, 2 * jnp.pi) / (2 * jnp.pi)
    tg = jnp.mod(jnp.arctan2(gt_w[:, 1], gt_w[:, 0]) + 2 * jnp.pi, 2 * jnp.pi) / (2 * jnp.pi)
    dt = jnp.abs(tp[:, None] - tg[None, :])
    theta_cost = jnp.abs(jnp.mod(dt + 0.5, 1.0) - 0.5) * theta_weight

    cost = cls_cost + reg_cost + theta_cost
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    return jnp.where(gt_mask[None, :], cost, BIG)


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """cost: [S, Q, G] -> matched query index per GT column [S, G]."""
    from scipy.optimize import linear_sum_assignment

    S, Q, G = cost.shape
    out = np.zeros((S, G), np.int32)
    for s in range(S):
        rows, cols = linear_sum_assignment(cost[s])
        out[s, cols] = rows.astype(np.int32)
    return out


def hungarian_assign(cost: jax.Array) -> jax.Array:
    """cost: [..., Q, G] -> matched query per GT [..., G] (host scipy)."""
    batch_shape = cost.shape[:-2]
    Q, G = cost.shape[-2:]
    flat = cost.reshape(-1, Q, G)
    out = jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((flat.shape[0], G), jnp.int32),
        jax.lax.stop_gradient(flat),
        vmap_method="sequential",
    )
    return out.reshape(*batch_shape, G)
