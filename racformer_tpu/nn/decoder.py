"""RaCFormer query decoder: 6 weight-shared iterations as a `lax.scan`.

Matches `RaCFormerTransformerDecoder(Layer)`
(`/root/reference/models/racformer_transformer.py:61-279`): per iteration —
polar position encoding, scale-adaptive self-attention, radar-BEV and LSS-BEV
deformable sampling branches, image radial sampling + adaptive mixing, 3-way
fusion, FFN, per-iteration cls/reg heads and polar box refinement with the
per-layer shrinking `d_region` schedule.

The reference shares one layer's weights across all 6 iterations
(`racformer_transformer.py:84-89`), which maps exactly onto `nn.scan` with
`variable_broadcast='params'` — one compiled layer body, 6 sequential steps.
Feature maps are loop invariants (broadcast args); only (query_bbox,
query_feat) ride the carry.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bbox_codec import inverse_sigmoid, theta_d_to_xy
from .adaptive_mixing import AdaptiveMixing
from .bev_sampling import BEVSampling
from .img_sampling import ImageRadialSampling
from .layers import FFN
from .sasa import ScaleAdaptiveSelfAttention


class PositionEncoder(nn.Module):
    """MLP on (theta, d, z): Linear-LN-ReLU x2 (`racformer_transformer.py:170-177`)."""

    embed_dims: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dims, dtype=self.dtype, name="fc2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        return nn.relu(x)


class Branch(nn.Module):
    """cls / reg prediction branch (`racformer_transformer.py:199-212`)."""

    out_dim: int
    with_ln: bool = False
    num_fcs: int = 2
    final_bias_init: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_fcs):
            x = nn.Dense(x.shape[-1], dtype=self.dtype, name=f"fc{i}")(x)
            if self.with_ln:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return nn.Dense(
            self.out_dim,
            bias_init=nn.initializers.constant(self.final_bias_init),
            dtype=self.dtype,
            name="out",
        )(x)


class RaCFormerDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_frames: int = 8
    num_points: int = 4
    num_points_bev: int = 4
    num_levels: int = 4
    num_classes: int = 10
    code_size: int = 10
    img_depth_num: int = 3
    bev_depth_num: int = 5
    num_ray: int = 150
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    bev_spatial_shape: tuple = (128, 128)
    image_hw: tuple = (256, 704)
    train_mode: bool = False
    bev_pallas: Any = None  # None = auto (ops.deform_attn.resolve_bev_pallas)
    img_pallas: Any = None  # None = auto (ops.msmv.resolve_img_pallas)
    fused_gather: bool = False  # fused-epilogue eval kernels (round 5)
    dtype: Any = jnp.float32

    def refine_bbox(self, bbox_proposal, bbox_delta):
        """Polar residual update (`racformer_transformer.py:230-236`)."""
        dz = inverse_sigmoid(bbox_proposal[..., 1:3])
        dz_new = nn.sigmoid(bbox_delta[..., 1:3] + dz)
        theta = bbox_proposal[..., 0:1] + (
            nn.sigmoid(bbox_delta[..., 0:1]) * 2.0 - 1.0
        ) / self.num_ray
        return jnp.concatenate([theta, dz_new, bbox_delta[..., 3:]], axis=-1)

    @nn.compact
    def __call__(self, carry, d_region, mlvl_feats, lss_bev, radar_bev,
                 attn_mask, lidar2img, time_diff):
        query_bbox, query_feat = carry
        train = self.train_mode

        query_pos = PositionEncoder(self.embed_dims, dtype=self.dtype, name="position_encoder")(
            query_bbox[..., :3]
        )
        query_feat = query_feat + query_pos

        q = ScaleAdaptiveSelfAttention(
            self.embed_dims, 8, pc_range=self.pc_range, dtype=self.dtype, name="self_attn"
        )(query_bbox, query_feat, attn_mask, train=train)
        query_feat = nn.LayerNorm(dtype=self.dtype, name="norm1")(q)

        bev_fold = self.num_points_bev if self.fused_gather else 0
        q_radar = BEVSampling(
            self.embed_dims, self.num_frames, 4, self.num_points_bev,
            self.bev_depth_num, self.pc_range, self.bev_spatial_shape,
            bev_pallas=self.bev_pallas, bev_fused=bev_fold, dtype=self.dtype,
            name="sampling_radar_bev",
        )(query_bbox, query_feat, radar_bev, time_diff, d_region, train=train)
        q_radar = nn.LayerNorm(dtype=self.dtype, name="norm_radar_bev")(q_radar)

        q_lss = BEVSampling(
            self.embed_dims, self.num_frames, 4, self.num_points_bev,
            self.bev_depth_num, self.pc_range, self.bev_spatial_shape,
            bev_pallas=self.bev_pallas, bev_fused=bev_fold, dtype=self.dtype,
            name="sampling_lss_bev",
        )(query_bbox, query_feat, lss_bev, time_diff, d_region, train=train)
        q_lss = nn.LayerNorm(dtype=self.dtype, name="norm_lss_bev")(q_lss)

        sampled = ImageRadialSampling(
            self.embed_dims, self.num_frames, 4, self.num_points,
            self.num_levels, self.img_depth_num, self.pc_range,
            img_pallas=self.img_pallas, fused_cat=self.fused_gather,
            dtype=self.dtype, name="sampling",
        )(query_bbox, query_feat, mlvl_feats, lidar2img, time_diff,
          self.image_hw, d_region, pre_fused=True)
        # remat boundary tags (see RaCFormerDecoder): policy "save_sampled"
        # keeps these three sampling outputs across the scan so the decoder
        # backward recomputes only the mixing/FFN/head region — a two-region
        # remat split at the sampling|mixing boundary
        from jax.ad_checkpoint import checkpoint_name

        sampled = checkpoint_name(sampled, "sampled_img")
        q_radar = checkpoint_name(q_radar, "sampled_bev")
        q_lss = checkpoint_name(q_lss, "sampled_bev")

        mixed = AdaptiveMixing(
            in_points=self.num_points * self.num_frames * self.img_depth_num,
            out_points=128,
            n_groups=4,
            embed_dims=self.embed_dims,
            dtype=self.dtype,
            name="mixing",
        )(sampled, query_feat)
        query_feat = nn.LayerNorm(dtype=self.dtype, name="norm2")(mixed)

        fused = nn.Dense(self.embed_dims, dtype=self.dtype, name="fusion")(
            jnp.concatenate([query_feat, q_radar, q_lss], axis=-1)
        )
        query_feat = nn.LayerNorm(dtype=self.dtype, name="norm_fusion")(fused)

        query_feat = FFN(512, dtype=self.dtype, name="ffn")(query_feat, train=train)
        query_feat = nn.LayerNorm(dtype=self.dtype, name="norm3")(query_feat)

        # focal-style prior bias on the cls logits (bias_init_with_prob(0.01))
        cls_score = Branch(
            self.num_classes, with_ln=True, final_bias_init=-4.59511985013459,
            dtype=self.dtype, name="cls_branch",
        )(query_feat)
        bbox_delta = Branch(self.code_size, dtype=self.dtype, name="reg_branch")(query_feat)
        bbox_pred = self.refine_bbox(query_bbox, bbox_delta.astype(jnp.float32))

        # absolute velocity via the first history frame's time delta
        # (`racformer_transformer.py:264-269`)
        if self.num_frames > 1:
            td = jnp.where(jnp.abs(time_diff) < 1e-5, 1.0, time_diff)
            bbox_pred = jnp.concatenate(
                [bbox_pred[..., :8], bbox_pred[..., 8:] / td[:, 1:2, None]], axis=-1
            )

        new_carry = (jax.lax.stop_gradient(bbox_pred), query_feat)
        return new_carry, (cls_score.astype(jnp.float32), theta_d_to_xy(bbox_pred))


class RaCFormerDecoder(nn.Module):
    num_layers: int = 6
    d_region_list: Sequence[float] = (0.08, 0.07, 0.06, 0.05, 0.04, 0.03)
    layer_cfg: Any = None
    train_mode: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_bbox, query_feat, mlvl_feats, lss_bev, radar_bev,
                 attn_mask, lidar2img, time_diff):
        """Returns (cls_scores [Lyr, B, Q, cls], bbox_preds [Lyr, B, Q, 10]).

        lss_bev / radar_bev: [B, T, H, W, C] raw BEV maps. Loop-invariant work
        (radar ConvGRU temporal encoding, positional encoding, deform-attn
        value projections) runs ONCE here — the reference recomputes all of it
        inside every weight-shared iteration (`racformer_transformer.py:
        248-251,484-485,532-537`), 6x the cost for bit-identical results.
        """
        cfg = dict(self.layer_cfg or {})
        cfg.setdefault("dtype", self.dtype)
        cfg["train_mode"] = self.train_mode
        embed_dims = cfg.get("embed_dims", 256)
        bev_shape = cfg.get("bev_spatial_shape", (128, 128))
        gather_dtype = cfg.pop("gather_dtype", jnp.bfloat16)

        from .conv_gru import RadarBEVTemporalEncoder
        from .bev_sampling import BEVValueProj

        # the pyramid arrives pre-fused (zero-bordered, y-fused rows) from
        # `RaCFormer.encode_frame`, so the streaming frame cache pays the
        # map build only for the newest frame

        radar_bev = RadarBEVTemporalEncoder(
            embed_dims, dtype=self.dtype,
            name="sampling_radar_bev_temporal_encoder",
        )(radar_bev)
        radar_value = BEVValueProj(
            embed_dims, 4, bev_shape, dtype=self.dtype,
            gather_dtype=gather_dtype, name="sampling_radar_bev_value",
        )(radar_bev)
        lss_value = BEVValueProj(
            embed_dims, 4, bev_shape, dtype=self.dtype,
            gather_dtype=gather_dtype, name="sampling_lss_bev_value",
        )(lss_bev)

        # remat the scanned layer: without it the scan saves every iteration's
        # intermediates for backward (the gathered deform-attn samples alone
        # are ~24 GB at flagship train shapes); the reference equivalently
        # wraps each decoder sub-module in torch activation checkpointing
        # (`racformer_transformer.py:317-321,423-427,542-546,612-616`)
        # (measured: a save_only_these_names policy keeping the sampled
        # image features made no difference at B=1 — full remat stays)
        # NOTE (measured, v5e device-plane): unrolling the 6 eval iterations
        # as a Python loop over a reused module LOSES to the scan — every
        # unrolled layer re-stages the large shared weights (the 67 MB
        # AdaptiveMixing generator alone added ~39 ms/step of copies) while
        # the while-loop keeps them resident across iterations.
        # remat policy knob (config `decoder.remat_policy` > env
        # RACFORMER_REMAT_POLICY > full remat). "dots_no_batch" saves
        # non-batch matmul outputs across the scan (less backward recompute,
        # more HBM); "full" recomputes everything. Swept on the v5e in
        # docs/experiments/remat_policy_ab.py.
        import os as _os

        pol_name = cfg.pop("remat_policy", None) or _os.environ.get(
            "RACFORMER_REMAT_POLICY", "full")
        policies = {
            "full": None,
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            # two-region split at the sampling|mixing boundary: the backward
            # recomputes only mixing/FFN/head, not the Pallas gathers (their
            # saved size is ~130 MB/layer at flagship shapes vs the ~24 GB
            # full-intermediates set) — VERDICT r4 item 3
            "save_sampled": jax.checkpoint_policies.save_only_these_names(
                "sampled_img", "sampled_bev"),
            # cheaper variant: save only the BEV sampling outputs (tiny)
            "save_bev": jax.checkpoint_policies.save_only_these_names(
                "sampled_bev"),
        }
        if pol_name not in policies:
            raise ValueError(
                f"unknown decoder remat_policy {pol_name!r}; "
                f"expected one of {sorted(policies)}")
        policy = policies[pol_name]
        layer_cls = nn.remat(RaCFormerDecoderLayer, prevent_cse=False,
                             policy=policy)
        scan = nn.scan(
            layer_cls,
            variable_broadcast="params",
            variable_axes={"intermediates": 0},  # per-iteration DUMP capture
            split_rngs={"params": False, "dropout": True},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        d_regions = jnp.asarray(self.d_region_list[: self.num_layers], jnp.float32)
        carry = (query_bbox, query_feat)
        _, (cls_scores, bbox_preds) = scan(name="layer", **cfg)(
            carry, d_regions, mlvl_feats, lss_value, radar_value, attn_mask,
            lidar2img, time_diff,
        )
        # No NaN scrubbing here: a blanket nan_to_num on every decoder output
        # would silently zero real numeric bugs through 6 iterations. Like
        # the reference, NaN handling lives at the consumers that need it —
        # the assigner cost (train/matching.py NaN->100, mirroring
        # `polar_hungarian_assigner_3d.py`) and the loss target masks.
        return cls_scores, bbox_preds
