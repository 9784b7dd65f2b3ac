"""NMS-free box decoding.

Matches `NMSFreeCoder.decode_single`
(`/root/reference/models/bbox/coders/nms_free_coder.py:37-110`) and the z-shift
in `get_bboxes` (`models/racformer_head.py:487-507`): sigmoid scores, flat
top-300 across (query x class), denormalize, score threshold 0.05, post-center
range filter [-61.2, 61.2]. TPU version keeps static shapes: always returns
max_num boxes plus a validity mask instead of filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.bbox_codec import denormalize_bbox


def decode_boxes(
    cls_scores: jax.Array,
    bbox_preds: jax.Array,
    max_num: int = 300,
    score_threshold: float = 0.05,
    post_center_range=(-61.2, -61.2, -10.0, 61.2, 61.2, 10.0),
    legacy_version: str = "v1.0.0",
):
    """cls_scores: [B, Q, C] logits (last decoder layer); bbox_preds: [B, Q, 10].

    Returns dict(bboxes [B, max_num, 9], scores [B, max_num],
                 labels [B, max_num], valid [B, max_num]).
    Output boxes use the lidar bottom-center convention (z -= h/2).

    `legacy_version='v0.17.1'` applies the reference's legacy mmdet3d box
    convention flip — w/l swap + yaw := -yaw - pi/2
    (`models/racformer_head.py:497-501`); checkpoints released before the
    mmdet3d 1.0 coordinate refactor carry `version='v0.17.1'` and the val
    driver reads it from the checkpoint (`/root/reference/val.py:126-132`).
    """
    B, Q, C = cls_scores.shape
    max_num = min(max_num, Q * C)
    scores = jax.nn.sigmoid(cls_scores).reshape(B, Q * C)
    # the decoder does not scrub NaNs (a blanket nan_to_num would hide real
    # numeric bugs as zeros); the eval boundary is where they must not leak:
    # sigmoid(NaN)=NaN would otherwise make top_k select garbage boxes.
    # -inf -> never selected, and such boxes also fail the score threshold.
    scores = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(scores, max_num)
    labels = idx % C
    box_idx = idx // C
    boxes = jnp.take_along_axis(bbox_preds, box_idx[..., None], axis=1)
    boxes = denormalize_bbox(boxes)  # [B, max_num, 9]
    # range check runs on gravity centers (the reference filters before the
    # z-shift, `nms_free_coder.py:66-69` vs `racformer_head.py:495`)
    lim = jnp.asarray(post_center_range)
    in_range = jnp.all(boxes[..., :3] >= lim[:3], axis=-1) & jnp.all(
        boxes[..., :3] <= lim[3:], axis=-1
    )
    # gravity center -> bottom center
    boxes = boxes.at[..., 2].add(-0.5 * boxes[..., 5])
    if legacy_version == "v0.17.1":
        boxes = jnp.concatenate(
            [boxes[..., 0:3], boxes[..., 4:5], boxes[..., 3:4],
             boxes[..., 5:6], -boxes[..., 6:7] - jnp.pi / 2, boxes[..., 7:9]],
            axis=-1,
        )
    valid = (top_scores > score_threshold) & in_range
    return {
        "bboxes": boxes,
        "scores": top_scores,
        "labels": labels,
        "valid": valid,
    }
