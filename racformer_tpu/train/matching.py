"""Hungarian set matching for the DETR-style loss.

Cost semantics match `PolarHungarianAssigner3D`
(`/root/reference/models/bbox/assigners/polar_hungarian_assigner_3d.py:16-97`)
with the configured costs (`configs/racformer_r50_nuimg_704x256_f8.py:193-199`):
focal classification cost (w 2.0), code-weighted 10-dim L1 regression cost
(w 0.25), and wrap-around angular ThetaL1 cost (w 3.0).

TPU design: costs are computed in-graph over a static [Q, max_gt] matrix
(invalid GT columns get a large constant so they can't affect valid matches),
and the assignment itself is an in-graph Jonker-Volgenant Hungarian
(:func:`_lap_single`) — the reference syncs to CPU scipy per (layer x sample)
(`polar_hungarian_assigner_3d.py:77-88`), a serialization point SURVEY.md §3.1
flags, and this TPU runtime does not support host callbacks at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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


def match_cost_cartesian(cls_scores, bbox_preds, gt_bboxes, gt_labels,
                         gt_mask, code_weights=None, cls_weight=2.0,
                         reg_weight=0.25, with_velo=True, alpha=0.25,
                         gamma=2.0):
    """Non-polar `HungarianAssigner3D` cost
    (`/root/reference/models/bbox/assigners/hungarian_assigner_3d.py:16-97`):
    focal classification + code-weighted L1 on cartesian normalized boxes,
    no angular term; `with_velo=False` drops the velocity dims (first 8
    only, ref `:64-67`). Same shapes/contract as :func:`match_cost`."""
    eps = 1e-12
    p = jax.nn.sigmoid(cls_scores)
    pos_cost = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    neg_cost = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    cls_cost = (pos_cost - neg_cost)[:, gt_labels] * cls_weight  # [Q, G]

    gt_norm = normalize_bbox(gt_bboxes)  # [G, 10]
    pred_w, gt_w = bbox_preds, gt_norm
    if code_weights is not None:
        cw = jnp.asarray(code_weights)
        pred_w = pred_w * cw
        gt_w = gt_w * cw
    d = 10 if with_velo else 8
    reg_cost = jnp.sum(
        jnp.abs(pred_w[:, None, :d] - gt_w[None, :, :d]), axis=-1
    ) * reg_weight

    cost = cls_cost + reg_cost
    cost = jnp.nan_to_num(cost, nan=100.0, posinf=100.0, neginf=-100.0)
    return jnp.where(gt_mask[None, :], cost, BIG)


_INF = 1.0e18


def _lap_single(cost_gq: jax.Array) -> jax.Array:
    """Exact linear assignment for one [G, Q] cost matrix (G <= Q).

    Jonker-Volgenant shortest-augmenting-path Hungarian (the e-maxx
    formulation with a virtual column 0), expressed with bounded
    `lax.while_loop`s so it runs fully in-graph. This replaces the
    reference's host-side scipy `linear_sum_assignment`
    (`polar_hungarian_assigner_3d.py:77-88`): the TPU runtime here does not
    support host callbacks, and in-graph matching also removes the
    per-step device->host sync. Returns matched query index per GT row [G].
    """
    G, Q = cost_gq.shape
    # columns are 1..Q (queries), column 0 is the virtual root; rows 1..G
    cost = jnp.pad(cost_gq, ((1, 0), (1, 0)))  # [G+1, Q+1]

    def augment_row(i, carry):
        u, v, p = carry  # u: [G+1], v: [Q+1], p: [Q+1] col -> row

        p = p.at[0].set(i)
        minv = jnp.full(Q + 1, _INF)
        way = jnp.zeros(Q + 1, jnp.int32)
        used = jnp.zeros(Q + 1, bool)

        def dijkstra_cond(st):
            _, _, _, _, j0, p_, _ = st
            return p_[j0] != 0

        def dijkstra_body(st):
            u_, v_, minv_, way_, j0, p_, used_ = st
            used_ = used_.at[j0].set(True)
            i0 = p_[j0]
            cur = cost[i0] - u_[i0] - v_
            better = (~used_) & (cur < minv_)
            minv_ = jnp.where(better, cur, minv_)
            way_ = jnp.where(better, j0, way_)
            masked = jnp.where(used_, _INF, minv_)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # potentials: u[p[j]] += delta and v[j] -= delta for used columns
            # j; minv[j] -= delta for the rest
            add_u = jax.ops.segment_sum(
                jnp.where(used_, delta, 0.0), p_, num_segments=G + 1
            )
            u_ = u_ + add_u
            v_ = v_ - jnp.where(used_, delta, 0.0)
            minv_ = jnp.where(used_, minv_, minv_ - delta)
            return (u_, v_, minv_, way_, j1, p_, used_)

        st = (u, v, minv, way, jnp.int32(0), p, used)
        u, v, minv, way, j0, p, used = jax.lax.while_loop(
            dijkstra_cond, dijkstra_body, st
        )

        def aug_cond(st):
            j0_, _ = st
            return j0_ != 0

        def aug_body(st):
            j0_, p_ = st
            j1 = way[j0_]
            p_ = p_.at[j0_].set(p_[j1])
            return (j1, p_)

        _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, p))
        return (u, v, p)

    u0 = jnp.zeros(G + 1)
    v0 = jnp.zeros(Q + 1)
    p0 = jnp.zeros(Q + 1, jnp.int32)
    _, _, p = jax.lax.fori_loop(1, G + 1, augment_row, (u0, v0, p0))

    # invert: row i (1..G) -> column j with p[j] == i
    cols = jnp.arange(Q + 1)
    match = jax.ops.segment_sum(
        cols * (p > 0), p, num_segments=G + 1
    )  # each row matched exactly once
    return (match[1:] - 1).astype(jnp.int32)  # 0-based query index


def hungarian_assign(cost: jax.Array) -> jax.Array:
    """cost: [..., Q, G] -> matched query per GT [..., G] (exact, in-graph)."""
    batch_shape = cost.shape[:-2]
    Q, G = cost.shape[-2:]
    flat = jax.lax.stop_gradient(cost).reshape(-1, Q, G)
    out = jax.vmap(lambda c: _lap_single(c.T))(flat.astype(jnp.float32))
    return out.reshape(*batch_shape, G)
