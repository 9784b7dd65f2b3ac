"""RaCFormer: full radar-camera fusion detector assembly.

Capability match for the reference detector (`/root/reference/models/racformer.py:19-348`):
device-side image normalization, ResNet-50 + FPN trunk over all B*T*N images in
one batch, CustomFPN -> radar-assisted LSS view transform per frame, radar
pillar BEV branch per frame, and the polar-query decoder head.

TPU redesign vs the reference:
  * the reference loops frames through the LSS/radar branches with
    eval()+no_grad for history (`models/racformer.py:316-331`); here all T
    frames run in one batched call and history-frame *outputs* get
    `stop_gradient`, which cuts the same gradients without serializing the
    device (BN batch stats then cover all frames instead of frame 0 only — a
    documented, quality-neutral deviation).
  * `encode_frame` / `decode_window` split the network so streaming inference
    (the reference's `simple_test_online` feature cache,
    `models/racformer.py:476-557`) keeps an 8-frame ring buffer of features in
    HBM and pays only one frame of trunk compute per sample.
  * everything is channel-last and fully static-shaped; the whole forward jits
    into a single XLA program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.fpn import FPN, CustomFPN
from ..nn.head import RaCFormerHead
from ..nn.pillar_encoder import RadarPillarEncoder
from ..nn.resnet import ResNet50
from ..nn.view_transformer import LSSViewTransformer
from ..ops.pillars import PillarGrid

IMG_MEAN = (123.675, 116.280, 103.530)  # RGB
IMG_STD = (58.395, 57.120, 57.375)


def preprocess_images(imgs: jax.Array, bgr_to_rgb: bool = True) -> jax.Array:
    """Normalize raw uint8-range images [..., H, W, 3] (device-side, the
    reference also normalizes on-GPU, `models/racformer.py:197-224`)."""
    x = imgs.astype(jnp.float32)
    if bgr_to_rgb:
        x = x[..., ::-1]
    mean = jnp.asarray(IMG_MEAN)
    std = jnp.asarray(IMG_STD)
    return (x - mean) / std


class RaCFormer(nn.Module):
    num_cams: int = 6
    num_frames: int = 8
    embed_dims: int = 256
    num_query: int = 900
    num_clusters: int = 6
    num_levels: int = 4
    num_groups: int = 4
    num_classes: int = 10
    # optional config-file `decoder` block (num_layers, d_region_list,
    # num_points, num_points_bev, img_depth_num, bev_depth_num, num_ray)
    # merged over the built-in decoder defaults — the reference reads the same
    # knobs from its config (`configs/racformer_r50_nuimg_704x256_f8.py:27-43`)
    decoder: Any = None
    image_hw: tuple = (256, 704)
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    depth_bins: int = 96
    bev_size: tuple = (128, 128)
    query_denoising: bool = True
    num_decoder_layers: int = 6
    max_gt: int = 64
    train_mode: bool = False
    trunk_dtype: Any = jnp.bfloat16
    head_dtype: Any = jnp.float32
    # parity-debug option: EXACT reference train-mode BN semantics for the
    # BEV branches — frame 0 runs the LSS view transformer + radar encoder
    # in train mode (batch stats from frame 0 only), history frames run in
    # eval mode (running stats) under stop_gradient
    # (`/root/reference/models/racformer.py:316-331`). The default batched
    # path computes BN stats over all T frames instead — the documented
    # deviation this flag exists to bound (docs/PARITY.md).
    bn_frame0_only: bool = False
    # fused-epilogue eval gathers (round 5): ONE kernel call per sampling
    # site per decoder iteration applies the bilinear lerp, the level /
    # attention weights, the y-mix and the fold-sum in-kernel — the image
    # pyramid is stored level-CONCATENATED and the per-level calls plus the
    # XLA weighted-sum epilogues disappear (the round-5 decode profile's
    # 11.7 ms image epilogue + ~16 ms of BEV relayout/slice/sum per step).
    # None = auto: explicit config > RACFORMER_FUSED_GATHER env > ON for
    # TPU. Forced OFF in train mode (the fused kernel has no custom VJP;
    # training keeps the per-level machinery + Pallas scatter backward).
    fused_gather: Any = None

    def _fused(self) -> bool:
        from ..ops.bilinear import resolve_pallas

        if self.train_mode:
            return False
        return resolve_pallas("RACFORMER_FUSED_GATHER", self.fused_gather)

    def setup(self):
        self.img_backbone = ResNet50(dtype=self.trunk_dtype, name="img_backbone")
        self.img_neck = FPN(
            self.embed_dims, self.num_levels, dtype=self.trunk_dtype, name="img_neck"
        )
        self.img_lss_neck = CustomFPN(
            self.embed_dims, dtype=self.trunk_dtype, name="img_lss_neck"
        )
        voxel = (
            (self.pc_range[3] - self.pc_range[0]) / self.bev_size[1],
            (self.pc_range[4] - self.pc_range[1]) / self.bev_size[0],
            self.pc_range[5] - self.pc_range[2],
        )
        self.img_lss_view_transformer = LSSViewTransformer(
            input_size=self.image_hw,
            depth_bins=self.depth_bins,
            out_channels=self.embed_dims,
            grid_lower=(self.pc_range[0], self.pc_range[1], self.pc_range[2]),
            grid_interval=voxel,
            grid_size=(self.bev_size[1], self.bev_size[0], 1),
            dtype=self.trunk_dtype,
            name="img_lss_view_transformer",
        )
        self.radar_encoder = RadarPillarEncoder(
            out_channels=self.embed_dims,
            grid=PillarGrid(
                pc_range=self.pc_range, voxel_size=voxel,
                nx=self.bev_size[1], ny=self.bev_size[0],
            ),
            dtype=jnp.float32,
            name="radar_encoder",
        )
        decoder_cfg = dict(
            num_layers=self.num_decoder_layers,
            embed_dims=self.embed_dims,
            num_frames=self.num_frames,
            num_levels=self.num_levels,
            num_classes=self.num_classes,
            pc_range=self.pc_range,
            bev_spatial_shape=self.bev_size,
            image_hw=self.image_hw,
        )
        if self.decoder:
            over = dict(self.decoder)
            if "d_region_list" in over:
                over["d_region_list"] = tuple(over["d_region_list"])
            decoder_cfg.update(over)
        decoder_cfg["fused_gather"] = self._fused()
        self.pts_bbox_head = RaCFormerHead(
            num_classes=self.num_classes,
            num_query=self.num_query,
            num_clusters=self.num_clusters,
            embed_dims=self.embed_dims,
            pc_range=self.pc_range,
            query_denoising=self.query_denoising,
            max_gt=self.max_gt,
            decoder_cfg=decoder_cfg,
            train_mode=self.train_mode,
            dtype=self.head_dtype,
            name="pts_bbox_head",
        )

    def _trunk(self, imgs):
        """Backbone + necks over [S, N, H, W, 3] -> (sampler-ready fpn list,
        lss_feat [S, N, hf, wf, C]). The reference also runs the backbone
        over ALL frames in one batch (`models/racformer.py:300`)."""
        S, N, H, W, _ = imgs.shape
        x = imgs.reshape(S * N, H, W, 3)
        c2, c3, c4, c5 = self.img_backbone(x)
        fpn = self.img_neck([c2, c3, c4, c5])
        # group channels for the decoder's image sampler here (per frame)
        # rather than per decode call: [SN, h, w, G*c] -> [S, G, N, h, w, c]
        G = self.num_groups
        c = self.embed_dims // G
        from ..ops.bilinear import fuse_rows, pad_for_sampling

        fpn = [
            f.reshape(S, N, f.shape[1], f.shape[2], G, c).transpose(0, 4, 1, 2, 3, 5)
            for f in fpn
        ]
        # emit SAMPLER-READY maps: zero-bordered + y-fused rows, W-aligned
        # so the Pallas gather never re-pads inside the decoder scan. Built
        # here (per frame) so the streaming cache stores them and each step
        # fuses only the newest frame's pyramid; the train path fuses each
        # frame exactly once per step either way. `ImageRadialSampling`
        # reconstructs the per-level true dims from these strides:
        for l, f in enumerate(fpn):
            assert f.shape[3:5] == (H // (4 << l), W // (4 << l)), (
                f.shape, l, (H, W))
        fpn = [fuse_rows(pad_for_sampling(f, align=True)) for f in fpn]
        if self._fused():
            # fused-epilogue eval form: ONE level-concatenated map per
            # (frame, group) — level l of camera n at rows
            # n * rcat + roffs[l] (geometry mirrored by
            # `ImageRadialSampling`/`msmv_sample_fold`). Built here so the
            # streaming cache stores it and each step pays only the newest
            # frame's concat; the narrow levels' W-padding to the level-0
            # width costs ~40% more cache HBM, traded for one kernel call
            # per iteration instead of four + the weighted-sum epilogue.
            wmax = max(f.shape[-2] for f in fpn)
            fpn = [jnp.pad(f, [(0, 0)] * (f.ndim - 2)
                           + [(0, wmax - f.shape[-2]), (0, 0)]) for f in fpn]
            fpn = [jnp.concatenate(fpn, axis=-3)]  # rows per camera
        lss_feat = self.img_lss_neck([c4, c5])  # [SN, H/16, W/16, C]
        hf, wf = lss_feat.shape[1], lss_feat.shape[2]
        lss_feat = lss_feat.astype(jnp.float32).reshape(S, N, hf, wf, self.embed_dims)
        return fpn, lss_feat

    def _bev_branches(self, lss_feat, radar_points, radar_mask, radar_depth,
                      radar_rcs, img2lidar, train):
        """LSS view transform + radar pillar branch for S (frame-)samples."""
        S, N = lss_feat.shape[0], lss_feat.shape[1]
        mlp_input = img2lidar[..., :3, :3].reshape(S, N, 9)
        lss_bev, depth_logits = self.img_lss_view_transformer(
            lss_feat, radar_depth, radar_rcs, img2lidar, mlp_input, train=train
        )
        radar_bev = self.radar_encoder(radar_points, radar_mask, train=train)
        return lss_bev, radar_bev, depth_logits

    def encode_frame(self, imgs, radar_points, radar_mask, radar_depth,
                     radar_rcs, img2lidar):
        """One (batched) frame's features.

        imgs: [S, N, H, W, 3] normalized; radar_points: [S, P, 7];
        radar_depth / radar_rcs: [S, N, H, W]; img2lidar: [S, N, 4, 4]
        (S = B or B*T).

        Returns (fpn_feats: L x [S, N, h, w, C], lss_bev [S, ny, nx, C],
                 radar_bev [S, ny, nx, C], depth_logits [S, N, hf, wf, D]).
        """
        fpn, lss_feat = self._trunk(imgs)
        lss_bev, radar_bev, depth_logits = self._bev_branches(
            lss_feat, radar_points, radar_mask, radar_depth, radar_rcs,
            img2lidar, train=self.train_mode)
        return fpn, lss_bev, radar_bev, depth_logits

    def decode_window(self, fpn_feats, lss_bev, radar_bev, lidar2img, time_diff,
                      gt_bboxes=None, gt_labels=None, gt_mask=None):
        """Head over a T-frame feature window.

        fpn_feats: L x [B, T, G, N, h, w, c] (pre-grouped by `encode_frame`);
        lss_bev / radar_bev: [B, T, ny, nx, C]; lidar2img: [B, T, N, 4, 4];
        time_diff: [B, T].

        Pyramid features stay in the trunk dtype (bf16): the decoder's
        bilinear gathers are HBM-bandwidth bound and dominate decode time;
        f32 math resumes right after each gather.
        """
        B, T = lss_bev.shape[0], lss_bev.shape[1]
        mlvl = list(fpn_feats)
        return self.pts_bbox_head(
            mlvl,
            lss_bev.astype(self.head_dtype),
            radar_bev.astype(self.head_dtype),
            lidar2img,
            time_diff,
            gt_bboxes=gt_bboxes,
            gt_labels=gt_labels,
            gt_mask=gt_mask,
        )

    def __call__(
        self,
        imgs: jax.Array,
        radar_points: jax.Array,
        radar_mask: jax.Array,
        radar_depth: jax.Array,
        radar_rcs: jax.Array,
        lidar2img: jax.Array,
        img2lidar: jax.Array,
        time_diff: jax.Array,
        gt_bboxes: Optional[jax.Array] = None,
        gt_labels: Optional[jax.Array] = None,
        gt_mask: Optional[jax.Array] = None,
    ):
        """Offline forward: all T frames recomputed (the reference's
        `simple_test_offline` / `forward_train` path).

        imgs: [B, T, N, H, W, 3] normalized (see :func:`preprocess_images`).
        Returns the head's output dict + frame-0 'depth_logits'.
        """
        B, T, N, H, W, _ = imgs.shape
        P = radar_points.shape[2]
        ny, nx = self.bev_size

        if self.train_mode and self.bn_frame0_only and T > 1:
            # EXACT reference BN semantics (parity-debug,
            # `models/racformer.py:316-331`): trunk over all frames batched
            # (like the reference), then the BEV branches run frame 0 in
            # train mode and frames 1..T-1 in eval mode under stop_gradient.
            fpn, lss_feat = self._trunk(imgs.reshape(B * T, N, H, W, 3))
            lss_feat = lss_feat.reshape(B, T, *lss_feat.shape[1:])
            sel0 = lambda a: a[:, 0]
            selr = lambda a: a[:, 1:].reshape(B * (T - 1), *a.shape[2:])
            lss0, radar0, depth_logits = self._bev_branches(
                sel0(lss_feat), sel0(radar_points), sel0(radar_mask),
                sel0(radar_depth), sel0(radar_rcs), sel0(img2lidar),
                train=True)
            lssr, radarr, _ = self._bev_branches(
                selr(lss_feat), selr(radar_points), selr(radar_mask),
                selr(radar_depth), selr(radar_rcs), selr(img2lidar),
                train=False)
            lss_bev = jnp.concatenate(
                [lss0[:, None], jax.lax.stop_gradient(
                    lssr.reshape(B, T - 1, ny, nx, -1))], axis=1)
            radar_bev = jnp.concatenate(
                [radar0[:, None], jax.lax.stop_gradient(
                    radarr.reshape(B, T - 1, ny, nx, -1))], axis=1)
            fpn = [f.reshape(B, T, *f.shape[1:]) for f in fpn]
        else:
            fpn, lss_bev, radar_bev, depth_logits = self.encode_frame(
                imgs.reshape(B * T, N, H, W, 3),
                radar_points.reshape(B * T, P, -1),
                radar_mask.reshape(B * T, P),
                radar_depth.reshape(B * T, N, H, W),
                radar_rcs.reshape(B * T, N, H, W),
                img2lidar.reshape(B * T, N, 4, 4),
            )
            fpn = [f.reshape(B, T, *f.shape[1:]) for f in fpn]
            lss_bev = lss_bev.reshape(B, T, ny, nx, self.embed_dims)
            radar_bev = radar_bev.reshape(B, T, ny, nx, self.embed_dims)
            hf, wf = depth_logits.shape[2], depth_logits.shape[3]
            depth_logits = depth_logits.reshape(
                B, T, N, hf, wf, self.depth_bins)[:, 0]

            if self.train_mode:
                # history frames contribute no parameter gradients through
                # the BEV branches (reference: eval()+no_grad per frame > 0,
                # `models/racformer.py:316-331`)
                lss_bev = jnp.concatenate(
                    [lss_bev[:, :1], jax.lax.stop_gradient(lss_bev[:, 1:])],
                    axis=1)
                radar_bev = jnp.concatenate(
                    [radar_bev[:, :1], jax.lax.stop_gradient(radar_bev[:, 1:])],
                    axis=1)

        outs = self.decode_window(
            fpn, lss_bev, radar_bev, lidar2img, time_diff,
            gt_bboxes=gt_bboxes, gt_labels=gt_labels, gt_mask=gt_mask,
        )
        outs["depth_logits"] = depth_logits
        return outs
