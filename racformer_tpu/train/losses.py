"""Detection losses: set-based focal + L1 over all decoder layers, DN loss,
and the SID depth focal loss.

Semantics match `RaCFormer_head.loss` / `dn_loss_single`
(`/root/reference/models/racformer_head.py:249-485`) and
`get_depth_loss` (`/root/reference/models/necks/view_transformer_racformer.py:665-678`).
All reductions are global sums over the (possibly sharded) batch — under GSPMD
this reproduces the reference's cross-rank `reduce_mean` normalizers for free.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.bbox_codec import normalize_bbox
from ..ops.depth_bins import depth_to_sid_index
from .matching import hungarian_assign, match_cost

CODE_WEIGHTS = (2.0, 2.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)


def sigmoid_focal_loss(logits, labels, num_classes, alpha=0.25, gamma=2.0):
    """Per-element mmdet-style sigmoid focal loss, summed over classes.

    labels == num_classes means background (all-negative)."""
    y = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce_pos = -jax.nn.log_sigmoid(logits)
    ce_neg = -jax.nn.log_sigmoid(-logits)
    loss = alpha * y * (1 - p) ** gamma * ce_pos + (1 - alpha) * (1 - y) * p ** gamma * ce_neg
    return jnp.sum(loss, axis=-1)


def categorical_focal_loss(logits, labels, alpha=0.25, gamma=2.0):
    """kornia-style multi-class focal loss (softmax) used for depth bins
    (`models/necks/focalloss.py`)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    pt = jnp.take_along_axis(p, labels[..., None], axis=-1)[..., 0]
    logpt = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -alpha * (1 - pt) ** gamma * logpt


def _depth_fg_labels(gt_depth, d_lo, d_hi, num_bins, downsample):
    B, N, H, W = gt_depth.shape
    d = jnp.where(gt_depth == 0.0, 1e5, gt_depth)
    d = d.reshape(B, N, H // downsample, downsample, W // downsample, downsample)
    d = jnp.min(d, axis=(3, 5))
    labels = depth_to_sid_index(d, d_lo, d_hi, num_bins)  # [B, N, Hf, Wf]
    return labels, labels < num_bins


def depth_fg_count(gt_depth, d_lo=1.0, d_hi=65.0, num_bins=96, downsample=16):
    """Number of foreground (lidar-hit) depth cells — the normalizer of
    :func:`depth_loss`. Exposed so gradient accumulation can normalize each
    microbatch by the FULL batch's count (exact full-batch equivalence)."""
    _, fg = _depth_fg_labels(gt_depth, d_lo, d_hi, num_bins, downsample)
    return jnp.sum(fg).astype(jnp.float32)


def depth_loss(depth_logits, gt_depth, d_lo=1.0, d_hi=65.0, num_bins=96,
               downsample=16, weight=2.0, fg_norm=None):
    """depth_logits: [B, N, Hf, Wf, D]; gt_depth: [B, N, H, W] sparse lidar
    depth (0 = missing). Min-pool to stride, SID-quantize, focal on fg pixels.

    `fg_norm` overrides the foreground-count normalizer (already clamped and
    scaled by the caller) — used by gradient accumulation to normalize every
    microbatch by the full batch's count / accum_steps, which makes the
    accumulated sum EXACTLY the fused full-batch loss."""
    labels, fg = _depth_fg_labels(gt_depth, d_lo, d_hi, num_bins, downsample)
    safe_labels = jnp.where(fg, labels, 0)
    loss = categorical_focal_loss(depth_logits.astype(jnp.float32), safe_labels)
    loss = jnp.sum(jnp.where(fg, loss, 0.0))
    norm = jnp.maximum(jnp.sum(fg), 1.0) if fg_norm is None else fg_norm
    return weight * loss / norm


def _layer_loss(cls_scores, bbox_preds, labels, bbox_targets, bbox_weights,
                norm, num_classes, cls_weight=2.0, bbox_weight=0.25):
    """One decoder layer's focal + L1 (`racformer_head.py:374-427`).

    `norm` is the already-clamped positive-count normalizer (callers clamp —
    accumulation passes a fractional per-microbatch share that must NOT be
    re-clamped here)."""
    cw = jnp.asarray(CODE_WEIGHTS)
    loss_cls = cls_weight * jnp.sum(
        sigmoid_focal_loss(cls_scores.astype(jnp.float32), labels, num_classes)
    ) / norm

    tgt = jnp.nan_to_num(bbox_targets, nan=0.0, posinf=0.0, neginf=0.0)
    finite = jnp.isfinite(bbox_targets).all(axis=-1, keepdims=True)
    w = bbox_weights * cw * finite
    loss_bbox = bbox_weight * jnp.sum(
        jnp.abs(bbox_preds.astype(jnp.float32) - tgt) * w
    ) / norm
    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def detection_loss(outs: Dict, gt_bboxes, gt_labels, gt_mask,
                   num_classes=10, with_match=False,
                   pos_norm=None) -> Dict[str, jax.Array]:
    """Full head loss over all decoder layers (+ DN losses when present).

    gt_bboxes: [B, G, 9] raw (gravity-center) boxes; gt_labels: [B, G];
    gt_mask: [B, G] validity.

    with_match=True additionally returns the per-layer Hungarian assignment
    under underscore-prefixed keys (`_matched_q` [L, B, G] int32 query index
    per GT, `_match_cost` [L, B, G] the matched pair's cost) — the working
    equivalent of the data the reference's dead `ISSaveHook` was meant to
    dump (`/root/reference/models/hook/is_save.py:75-90` reads a
    `pts_bbox_head.match_dict` the head never populates). Consumers:
    `train/hooks.py:MatchStatsHook`. Underscore keys are diagnostics, not
    losses — `make_train_step` routes them around the loss arithmetic.

    `pos_norm` (already clamped by the caller) overrides the positive-count
    normalizer of the set losses; the DN normalizer becomes
    `pos_norm * ngroup` (dn_valid is exactly gt_mask tiled over the noise
    groups, see `nn/head.py::_dn_prepare`). Gradient accumulation passes
    `max(global_num_pos, 1) / accum_steps` so summing the microbatch losses
    reproduces the fused full-batch loss EXACTLY — the reference's
    per-worker `reduce_mean` normalization over the full batch
    (`/root/reference/models/racformer_head.py:399-409`).
    """
    cls_scores = outs["all_cls_scores"]  # [L, B, Q, C]
    bbox_preds = outs["all_bbox_preds"]  # [L, B, Q, 10]
    L, B, Q, C = cls_scores.shape
    G = gt_bboxes.shape[1]

    safe_labels = jnp.where(gt_mask, gt_labels, 0)
    cost = jax.vmap(  # over layers
        jax.vmap(  # over batch
            lambda cs, bp, gb, gl, gm: match_cost(
                cs, bp, gb, gl, gm, CODE_WEIGHTS
            ),
            in_axes=(0, 0, 0, 0, 0),
        ),
        in_axes=(0, 0, None, None, None),
    )(cls_scores, bbox_preds, gt_bboxes, safe_labels, gt_mask)  # [L, B, Q, G]

    matched_q = hungarian_assign(cost)  # [L, B, G]

    match_aux = {}
    if with_match:
        match_aux["_matched_q"] = matched_q.astype(jnp.int32)
        match_aux["_match_cost"] = jnp.take_along_axis(
            cost, matched_q[:, :, None, :], axis=2
        )[:, :, 0, :].astype(jnp.float32)

    gt_norm = jax.vmap(normalize_bbox)(gt_bboxes)  # [B, G, 10]

    def build_targets(mq, gl, gm, gn):
        # mq: [G] matched query; scatter GT info onto queries
        safe_q = jnp.where(gm, mq, Q)
        labels = jnp.full((Q,), num_classes, jnp.int32)
        labels = labels.at[safe_q].set(gl, mode="drop")
        bt = jnp.zeros((Q, 10)).at[safe_q].set(gn, mode="drop")
        bw = jnp.zeros((Q, 1)).at[safe_q].set(1.0, mode="drop")
        return labels, bt, bw

    labels, bbox_targets, bbox_weights = jax.vmap(
        jax.vmap(build_targets, in_axes=(0, 0, 0, 0)),
        in_axes=(0, None, None, None),
    )(matched_q, safe_labels, gt_mask, gt_norm)

    num_pos = jnp.sum(gt_mask).astype(jnp.float32)  # per layer (same GT set)
    set_norm = jnp.maximum(num_pos, 1.0) if pos_norm is None else pos_norm

    losses = {}
    total = 0.0
    for l in range(L):
        lc, lb = _layer_loss(
            cls_scores[l], bbox_preds[l], labels[l], bbox_targets[l],
            bbox_weights[l], set_norm, num_classes,
        )
        key = "loss" if l == L - 1 else f"d{l}.loss"
        losses[f"{key}_cls"] = lc
        losses[f"{key}_bbox"] = lb
        total = total + lc + lb

    # --- DN loss (`racformer_head.py:264-324`) ---------------------------
    if "dn_cls_scores" in outs:
        dn_cls = outs["dn_cls_scores"]  # [L, B, S, C]
        dn_box = outs["dn_bbox_preds"]
        dn_valid = outs["dn_meta"]["dn_valid"]  # [B, S]
        S = dn_valid.shape[1]
        ngroup = S // G
        # slot s -> gt index s % G; targets are the CLEAN gt
        tgt_labels = jnp.tile(safe_labels, (1, ngroup))  # [B, S]
        tgt_boxes = jnp.tile(gt_norm, (1, ngroup, 1))  # [B, S, 10]
        num_tgt = jnp.sum(dn_valid).astype(jnp.float32)
        dn_norm = (jnp.maximum(num_tgt, 1.0) if pos_norm is None
                   else pos_norm * ngroup)

        cw = jnp.asarray(CODE_WEIGHTS)
        for l in range(L):
            lbl = jnp.where(dn_valid, tgt_labels, num_classes)
            focal = sigmoid_focal_loss(dn_cls[l].astype(jnp.float32), lbl, num_classes)
            lc = 2.0 * jnp.sum(jnp.where(dn_valid, focal, 0.0)) / dn_norm
            finite = jnp.isfinite(tgt_boxes).all(-1) & dn_valid
            t = jnp.nan_to_num(tgt_boxes)
            lb = 0.25 * jnp.sum(
                jnp.abs(dn_box[l].astype(jnp.float32) - t) * cw * finite[..., None]
            ) / dn_norm
            key = "loss" if l == L - 1 else f"d{l}.loss"
            losses[f"{key}_cls_dn"] = jnp.nan_to_num(lc)
            losses[f"{key}_bbox_dn"] = jnp.nan_to_num(lb)
            total = total + losses[f"{key}_cls_dn"] + losses[f"{key}_bbox_dn"]

    losses["loss_total"] = total
    losses.update(match_aux)
    return losses
