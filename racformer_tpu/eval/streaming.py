"""Streaming inference: per-frame feature cache in HBM.

The TPU-primary eval path (SURVEY.md §3.2): equivalent of the reference's
`simple_test_online` (`/root/reference/models/racformer.py:476-557`), which
caches per-frame image/BEV/radar-BEV features keyed by filename so each new
sample computes only one new frame. Here the cache is a fixed ring buffer of
jnp arrays (newest frame at index 0), and both the single-frame encoder and
the windowed decoder are jitted once.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..model.racformer import RaCFormer, preprocess_images
from .decode import decode_boxes


class StreamingEvaluator:
    def __init__(self, model: RaCFormer, variables, eval_cfg: Optional[Dict] = None):
        self.model = model
        self.variables = variables
        self.T = model.num_frames
        self.cache = None  # (fpn list, lss, radar, lidar2img, ts) — device pytree
        ecfg = eval_cfg or {}

        def encode(v, imgs, radar_points, radar_mask, radar_depth, radar_rcs,
                   img2lidar):
            # the radar rasterizer writes whole COLUMNS (no-elevation smear,
            # data/depth_maps.py:radar_to_depth_rcs_maps), so the dense
            # [S, N, H, W] maps carry only [S, N, W] of information. Accept
            # the column form and broadcast on device — this cuts the
            # per-frame host->device payload by ~8.6 MB (measured 320 ms of
            # the 515 ms streaming step was tunnel transfer,
            # docs/experiments/overhead_split.py).
            H = imgs.shape[2]
            if radar_depth.ndim == 3:
                S, N, W = radar_depth.shape
                radar_depth = jnp.broadcast_to(
                    radar_depth[:, :, None, :], (S, N, H, W))
            if radar_rcs.ndim == 3:
                S, N, W = radar_rcs.shape
                radar_rcs = jnp.broadcast_to(
                    radar_rcs[:, :, None, :], (S, N, H, W))
            fpn, lss, radar, _ = model.apply(
                v, preprocess_images(imgs), radar_points, radar_mask,
                radar_depth, radar_rcs, img2lidar, method=model.encode_frame,
            )
            return fpn, lss, radar

        def init_cache(feats, lidar2img, ts):
            # bootstrap: duplicate the first frame across the window (the
            # reference pads missing history with the first frame,
            # `loaders/pipelines/loading.py:668-676`)
            fpn, lss, radar = feats
            T = self.T
            return (
                [jnp.repeat(f[:, None], T, axis=1) for f in fpn],
                jnp.repeat(lss[:, None], T, axis=1),
                jnp.repeat(radar[:, None], T, axis=1),
                jnp.repeat(lidar2img[:, None], T, axis=1),
                jnp.full((1, T), ts),
            )

        def update_decode(v, cache, feats, lidar2img, ts):
            # window shift (newest at index 0) fused with the decoder so no
            # eager per-step device ops remain
            fpn, lss, radar = feats
            cfpn, clss, cradar, cl2i, cts = cache
            T = self.T
            fpn_w = [
                jnp.concatenate([f[:, None], cf[:, : T - 1]], axis=1)
                for f, cf in zip(fpn, cfpn)
            ]
            lss_w = jnp.concatenate([lss[:, None], clss[:, : T - 1]], axis=1)
            radar_w = jnp.concatenate([radar[:, None], cradar[:, : T - 1]], axis=1)
            l2i_w = jnp.concatenate([lidar2img[:, None], cl2i[:, : T - 1]], axis=1)
            ts_w = jnp.concatenate([jnp.reshape(ts, (1, 1)), cts[:, : T - 1]], axis=1)
            new_cache = (fpn_w, lss_w, radar_w, l2i_w, ts_w)

            time_diff = (ts_w[:, :1] - ts_w).astype(jnp.float32)
            outs = model.apply(
                v, fpn_w, lss_w, radar_w, l2i_w, time_diff,
                method=model.decode_window,
            )
            decoded = decode_boxes(
                outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1],
                max_num=ecfg.get("max_num", 300),
                score_threshold=ecfg.get("score_threshold", 0.05),
                post_center_range=tuple(ecfg.get(
                    "post_center_range", (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0))),
                legacy_version=ecfg.get("legacy_version", "v1.0.0"),
            )
            return new_cache, decoded

        def fused_step(v, cache, imgs, radar_points, radar_mask, radar_depth,
                       radar_rcs, lidar2img, img2lidar, ts):
            # steady-state path: ONE dispatch per frame (encode + window
            # shift + decode + box decode); one host->device round-trip less
            # than the two-program bootstrap path, same math by construction
            feats = encode(v, imgs, radar_points, radar_mask, radar_depth,
                           radar_rcs, img2lidar)
            return update_decode(v, cache, feats, lidar2img, ts)

        self._encode = jax.jit(encode)
        self._init_cache = jax.jit(init_cache)
        self._update_decode = jax.jit(update_decode, donate_argnums=(1,))
        self._fused_step = jax.jit(fused_step, donate_argnums=(1,))

    def reset(self):
        """Call at scene boundaries (a new scene must not see old frames)."""
        self.cache = None

    def step(self, frame: Dict, blocking: bool = True) -> Dict:
        """frame: dict with imgs [N, H, W, 3] (raw 0-255; uint8 preferred —
        it is the pipeline-native form and 4x cheaper to upload),
        radar_points [P, 7], radar_mask [P], radar_depth/rcs [N, H, W]
        dense maps OR [N, W] column maps (the rasterizer's true payload),
        lidar2img [N, 4, 4], img2lidar [N, 4, 4], timestamp (float seconds,
        RELATIVE to the scene start — epoch-seconds have a 128 s float32
        ULP, which would quantize inter-frame time_diff to 0 on device;
        val.py rebases).

        Returns decoded boxes for the current frame.
        """
        if abs(float(frame["timestamp"])) > 1e6:
            raise ValueError(
                "timestamp looks absolute (epoch seconds); pass scene-"
                "relative seconds — float32 on device cannot resolve "
                "sub-second deltas at ~1e9 magnitudes")
        b = lambda x: jnp.asarray(x)[None]
        l2i = b(frame["lidar2img"])
        ts = jnp.float32(frame["timestamp"])

        if self.cache is None:
            feats = self._encode(
                self.variables, b(frame["imgs"]), b(frame["radar_points"]),
                b(frame["radar_mask"]), b(frame["radar_depth"]),
                b(frame["radar_rcs"]), b(frame["img2lidar"]),
            )
            self.cache = self._init_cache(feats, l2i, ts)
            self.cache, out = self._update_decode(
                self.variables, self.cache, feats, l2i, ts)
        else:
            self.cache, out = self._fused_step(
                self.variables, self.cache, b(frame["imgs"]),
                b(frame["radar_points"]), b(frame["radar_mask"]),
                b(frame["radar_depth"]), b(frame["radar_rcs"]), l2i,
                b(frame["img2lidar"]), ts,
            )
        return jax.device_get(out) if blocking else out
