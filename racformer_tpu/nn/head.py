"""RaCFormer detection head: polar query initialization, DN-DETR query
denoising, and the weight-shared polar decoder.

Matches `RaCFormer_head` (`/root/reference/models/racformer_head.py:14-247`):
900 queries = 150 rays x 6 distance clusters on concentric rings; learnable
`init_query_bbox` Embedding(Q, 10) with z=0.5, log-h=0.2, v=0 init; DN noise
in polar coordinates scaled by box arc length with group-blocked attention;
output boxes reassembled into the 10-dim normalized layout
[cx, cy, log w, log l, cz, h?, sin, cos, vx, vy] with metric centers.

TPU redesign: the reference's dynamic `max(known_num)` DN padding becomes a
static `max_gt` capacity with validity masking, so the whole head is one
fixed-shape jitted graph.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bbox_codec import encode_bbox, xy_to_theta_d
from .decoder import RaCFormerDecoder


def generate_ring_points(num_query: int, num_clusters: int) -> jnp.ndarray:
    """[Q, 2] (theta, d) ring layout (`racformer_head.py:69-79`)."""
    num_angles = num_query // num_clusters
    angles = jnp.linspace(0.0, 1.0, num_angles + 1)[:-1]
    distances = jnp.linspace(0.0, 1.0, num_clusters + 2)[1:-1]
    a = jnp.broadcast_to(angles[:, None], (num_angles, num_clusters))
    d = jnp.broadcast_to(distances[None, :], (num_angles, num_clusters))
    return jnp.stack([a, d], axis=-1).reshape(-1, 2)


def _init_query_bbox(key, num_query, num_clusters):
    """Reference init (`racformer_head.py:52-63`): Embedding default N(0,1)
    then z=0.5, log-h=0.2, v=0, (theta, d)=ring layout."""
    w = jax.random.normal(key, (num_query, 10), jnp.float32)
    w = w.at[:, 2:3].set(0.5)
    w = w.at[:, 5:6].set(0.2)
    w = w.at[:, 8:10].set(0.0)
    w = w.at[:, :2].set(generate_ring_points(num_query, num_clusters))
    return w


def dn_attn_mask(pad_size: int, single_pad: int, num_groups: int, num_query: int):
    """Group-blocked attention mask, True = blocked
    (`racformer_head.py:220-232`)."""
    total = pad_size + num_query
    mask = jnp.zeros((total, total), bool)
    # matching queries cannot see DN queries
    mask = mask.at[pad_size:, :pad_size].set(True)
    for g in range(num_groups):
        lo, hi = single_pad * g, single_pad * (g + 1)
        mask = mask.at[lo:hi, hi:pad_size].set(True)
        mask = mask.at[lo:hi, :lo].set(True)
    return mask


class RaCFormerHead(nn.Module):
    num_classes: int = 10
    num_query: int = 900
    num_clusters: int = 6
    embed_dims: int = 256
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    query_denoising: bool = True
    dn_groups: int = 10
    dn_bbox_noise_scale: float = 0.5
    dn_label_noise_scale: float = 0.5
    max_gt: int = 64  # static DN capacity per sample
    decoder_cfg: Any = None
    train_mode: bool = False
    dtype: Any = jnp.float32

    def _dn_prepare(self, gt_bboxes, gt_labels, gt_mask):
        """Build noised DN queries (static shapes).

        gt_bboxes: [B, G, 9] raw boxes (gravity-center xyz, wlh, yaw, vx, vy);
        gt_labels: [B, G] int; gt_mask: [B, G] bool.
        Returns (dn_bbox [B, S, 10], dn_feat_label [B, S] int,
                 dn_valid [B, S]) with S = dn_groups * max_gt.
        """
        B, G, _ = gt_bboxes.shape
        ngroup = self.dn_groups
        wlh = gt_bboxes[..., 3:6]
        enc = encode_bbox(gt_bboxes, self.pc_range)
        enc = xy_to_theta_d(enc)  # [B, G, 10] (theta, d, z, ...)

        # per-group independent noise
        key = self.make_rng("dn")
        k1, k2, k3 = jax.random.split(key, 3)
        rand = jax.random.uniform(k1, (B, ngroup, G, 3), minval=-1.0, maxval=1.0)
        e = jnp.broadcast_to(enc[:, None], (B, ngroup, G, enc.shape[-1]))
        w2 = jnp.broadcast_to(wlh[:, None], (B, ngroup, G, 3))

        r = 65.0
        diag = jnp.sqrt(w2[..., 0:1] ** 2 + w2[..., 1:2] ** 2)
        arc_ratio = diag / (2.0 * jnp.pi * jnp.maximum(e[..., 1:2], 1e-4) * r)
        theta_delta = rand[..., 0:1] * (arc_ratio / 2.0) * self.dn_bbox_noise_scale * e[..., 1:2]
        d_delta = rand[..., 1:2] * diag / (r * 2.0) * self.dn_bbox_noise_scale
        z_delta = rand[..., 2:3] * w2[..., 2:3] / 16.0 * self.dn_bbox_noise_scale

        theta = e[..., 0:1] + theta_delta
        theta = jnp.mod((theta + 1.0) * 2.0 * jnp.pi, 2.0 * jnp.pi) / (2.0 * jnp.pi)
        noised = jnp.concatenate(
            [theta, e[..., 1:2] + d_delta, e[..., 2:3] + z_delta, e[..., 3:]], axis=-1
        )
        noised = noised.at[..., 0:3].set(jnp.clip(noised[..., 0:3], 0.0, 1.0))

        labels = jnp.broadcast_to(gt_labels[:, None], (B, ngroup, G))
        flip = jax.random.uniform(k2, (B, ngroup, G)) < self.dn_label_noise_scale
        rand_lab = jax.random.randint(k3, (B, ngroup, G), 0, self.num_classes)
        labels = jnp.where(flip, rand_lab, labels)

        valid = jnp.broadcast_to(gt_mask[:, None], (B, ngroup, G))
        S = ngroup * G
        noised = jnp.where(valid[..., None], noised, 0.0).reshape(B, S, -1)
        labels = jnp.where(valid, labels, self.num_classes).reshape(B, S)
        return noised, labels, valid.reshape(B, S)

    @nn.compact
    def __call__(
        self,
        mlvl_feats,
        lss_bev,
        radar_bev,
        lidar2img,
        time_diff,
        gt_bboxes: Optional[jax.Array] = None,
        gt_labels: Optional[jax.Array] = None,
        gt_mask: Optional[jax.Array] = None,
    ):
        """Returns dict with 'all_cls_scores' [Lyr, B, Q, cls],
        'all_bbox_preds' [Lyr, B, Q, 10] (normalized layout, metric centers),
        plus DN splits when denoising is active."""
        B = lss_bev.shape[0]
        Q = self.num_query
        C = self.embed_dims

        init_q = self.param(
            "init_query_bbox",
            lambda k, nq=Q, nc=self.num_clusters: _init_query_bbox(k, nq, nc),
        )
        label_enc = nn.Embed(
            self.num_classes + 1, C - 1, dtype=self.dtype, name="label_enc"
        )

        query_bbox = jnp.broadcast_to(init_q[None], (B, Q, 10))
        base_feat = jnp.concatenate(
            [label_enc(jnp.full((1,), self.num_classes)), jnp.zeros((1, 1), self.dtype)],
            axis=-1,
        )  # [1, C]
        query_feat = jnp.broadcast_to(base_feat[None], (B, Q, C))

        use_dn = self.train_mode and self.query_denoising and gt_bboxes is not None
        dn_meta = None
        attn_mask = None
        if use_dn:
            dn_bbox, dn_labels, dn_valid = self._dn_prepare(gt_bboxes, gt_labels, gt_mask)
            S = dn_bbox.shape[1]
            dn_feat = jnp.concatenate(
                [label_enc(dn_labels), jnp.ones((B, S, 1), self.dtype)], axis=-1
            )
            dn_feat = jnp.where(dn_valid[..., None], dn_feat, 0.0)
            query_bbox = jnp.concatenate([dn_bbox, query_bbox], axis=1)
            query_feat = jnp.concatenate([dn_feat, query_feat], axis=1)
            attn_mask = dn_attn_mask(S, self.max_gt, self.dn_groups, Q)
            dn_meta = {"pad_size": S, "dn_valid": dn_valid}

        dec_cfg = dict(self.decoder_cfg or {})
        num_layers = dec_cfg.pop("num_layers", 6)
        d_region_list = dec_cfg.pop("d_region_list", (0.08, 0.07, 0.06, 0.05, 0.04, 0.03))
        cls_scores, bbox_preds = RaCFormerDecoder(
            num_layers=num_layers,
            d_region_list=d_region_list,
            layer_cfg=dec_cfg,
            train_mode=self.train_mode,
            dtype=self.dtype,
            name="decoder",
        )(query_bbox, query_feat, mlvl_feats, lss_bev, radar_bev, attn_mask,
          lidar2img, time_diff)

        # de-normalize centers and reorder to the loss/coder layout
        # (`racformer_head.py:102-111`)
        lo = jnp.asarray(self.pc_range[0:3])
        hi = jnp.asarray(self.pc_range[3:6])
        xyz = bbox_preds[..., 0:3] * (hi - lo) + lo
        bbox_preds = jnp.concatenate(
            [xyz[..., 0:2], bbox_preds[..., 3:5], xyz[..., 2:3], bbox_preds[..., 5:10]],
            axis=-1,
        )

        outs = {}
        if dn_meta is not None:
            S = dn_meta["pad_size"]
            outs["dn_cls_scores"] = cls_scores[:, :, :S]
            outs["dn_bbox_preds"] = bbox_preds[:, :, :S]
            outs["dn_meta"] = dn_meta
            cls_scores = cls_scores[:, :, S:]
            bbox_preds = bbox_preds[:, :, S:]
        outs["all_cls_scores"] = cls_scores
        outs["all_bbox_preds"] = bbox_preds
        return outs
