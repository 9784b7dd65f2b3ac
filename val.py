#!/usr/bin/env python
"""Evaluation driver.

CLI-compatible surface with the reference (`/root/reference/val.py`):
  python val.py --config racformer_tpu/configs/..._mini.py \
      [--checkpoint ckpt_dir_or_step] [--synthetic] [--streaming]

Runs the jitted forward over the val set, decodes NMS-free boxes, and reports
nuScenes-protocol metrics (self-contained implementation in
racformer_tpu/eval/metrics.py — no devkit dependency).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--override", nargs="+", default=[])
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--streaming", action="store_true",
                   help="per-frame streaming eval with temporal feature cache")
    p.add_argument("--max-samples", type=int, default=None)
    return p.parse_args()


def main():
    args = parse_args()

    import os as _os

    import jax

    # the container's sitecustomize force-registers the axon TPU platform;
    # honor an explicit JAX_PLATFORMS/RACFORMER_PLATFORM env override (the env
    # var alone is ignored once the backend is registered)
    plat = _os.environ.get("RACFORMER_PLATFORM") or _os.environ.get("JAX_PLATFORMS")
    if plat and plat != "axon":
        jax.config.update("jax_platforms", plat.split(",")[0])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from racformer_tpu.config import Config
    from racformer_tpu.data import NuScenesRadarDataset, SyntheticDataset
    from racformer_tpu.eval import decode_boxes
    from racformer_tpu.eval.metrics import nuscenes_metrics
    from racformer_tpu.model import RaCFormer, preprocess_images

    cfg = Config.fromfile(args.config).merge_override(args.override)
    model_cfg = dict(cfg.model)
    model = RaCFormer(**model_cfg, train_mode=False)

    max_samples = args.max_samples or cfg.get("max_samples")
    ann = cfg.data["val"]["ann_file"]
    is_vod = cfg.get("dataset_type") == "vod"
    if is_vod and os.path.exists(ann) and not args.synthetic:
        from racformer_tpu.data.vod import VoDDataset

        dataset = VoDDataset(
            ann,
            data_root=os.path.dirname(os.path.dirname(ann)),
            image_hw=model.image_hw,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
            max_samples=max_samples,
        )
    elif args.synthetic or not os.path.exists(ann):
        dataset = SyntheticDataset(
            num_samples=max_samples or 8,
            num_cams=model.num_cams,
            num_frames=model.num_frames,
            hw=model.image_hw,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
        )
    else:
        dataset = NuScenesRadarDataset(
            ann,
            num_frames=model.num_frames,
            frame_interval=int(cfg.data["val"].get("frame_interval", 6)),
            image_hw=model.image_hw,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
            training=False,
            max_samples=max_samples,
        )

    sample = dataset[0]
    batch = {
        k: jnp.asarray(v)[None] for k, v in sample.items() if k != "token"
    }
    arg_keys = ("imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
                "lidar2img", "img2lidar", "time_diff")

    variables = jax.jit(
        lambda b: model.init(
            jax.random.PRNGKey(0), preprocess_images(b["imgs"]),
            *[b[k] for k in arg_keys[1:]],
        )
    )(batch)

    if args.checkpoint:
        if os.path.isfile(args.checkpoint):
            # a pickled {'params': ..., 'batch_stats': ...} variables file
            # (produced by the weight converter or a training export)
            import pickle

            with open(args.checkpoint, "rb") as f:
                variables = pickle.load(f)
        else:
            # an orbax work_dir from train.py: restore the latest TrainState
            from racformer_tpu.train import TrainState
            from racformer_tpu.train.checkpoint import CheckpointManager

            template = TrainState(
                variables["params"], variables.get("batch_stats", {}), None,
                jnp.zeros((), jnp.int32),
            )
            ckpt = CheckpointManager(args.checkpoint, verify=False)
            restored = ckpt.restore_latest(template)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
            _, state = restored
            variables = {"params": state.params, "batch_stats": state.batch_stats}

    ecfg = dict(cfg.get("eval_cfg", {}))

    preds, gts = [], []
    t_total, n = 0.0, 0
    num = len(dataset)

    if args.streaming:
        # per-frame feature-cache path (the reference's simple_test_online,
        # promoted to the primary FPS protocol)
        from racformer_tpu.eval.streaming import StreamingEvaluator

        ev = StreamingEvaluator(model, variables, eval_cfg=ecfg)
        for i in range(num):
            s = dataset[i]
            frame = dict(
                imgs=s["imgs"][0], radar_points=s["radar_points"][0],
                radar_mask=s["radar_mask"][0], radar_depth=s["radar_depth"][0],
                radar_rcs=s["radar_rcs"][0], lidar2img=s["lidar2img"][0],
                img2lidar=s["img2lidar"][0], timestamp=float(i) * 0.5,
            )
            t0 = time.perf_counter()
            out = ev.step(frame, blocking=False)
            jax.block_until_ready(out)
            if i > 0:
                t_total += time.perf_counter() - t0
                n += 1
            out = jax.device_get(out)
            preds.append({k: v[0] for k, v in out.items()})
            if "gt_bboxes" in s:
                gts.append(dict(bboxes=s["gt_bboxes"], labels=s["gt_labels"],
                                mask=s["gt_mask"]))
    else:
        @jax.jit
        def predict(b):
            outs = model.apply(
                variables, preprocess_images(b["imgs"]), *[b[k] for k in arg_keys[1:]]
            )
            return decode_boxes(
                outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1],
                max_num=ecfg.get("max_num", 300),
                score_threshold=ecfg.get("score_threshold", 0.05),
                post_center_range=tuple(ecfg.get(
                    "post_center_range", (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0))),
            )

        for i in range(num):
            s = dataset[i]
            b = {k: jnp.asarray(v)[None] for k, v in s.items() if k != "token"}
            t0 = time.perf_counter()
            out = predict(b)
            jax.block_until_ready(out)
            if i > 0:  # skip compile
                t_total += time.perf_counter() - t0
                n += 1
            out = jax.device_get(out)
            preds.append({k: v[0] for k, v in out.items()})
            if "gt_bboxes" in s:
                gts.append(dict(bboxes=s["gt_bboxes"], labels=s["gt_labels"],
                                mask=s["gt_mask"]))

    fps = n / t_total if t_total > 0 else 0.0
    print(f"eval: {num} samples, {fps:.2f} samples/s")

    if gts:
        if is_vod:
            from racformer_tpu.eval.kitti_eval import kitti_vod_metrics

            vp = [
                {"bboxes": p["bboxes"][p["valid"]][:, :7],
                 "scores": p["scores"][p["valid"]],
                 "labels": p["labels"][p["valid"]]}
                for p in preds
            ]
            vg = [{"bboxes": g["bboxes"][g["mask"], :7],
                   "labels": g["labels"][g["mask"]]} for g in gts]
            metrics = kitti_vod_metrics(vp, vg)
        else:
            metrics = nuscenes_metrics(
                preds, gts, front_only=bool(cfg.get("eval_front_only", False))
            )
        print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}, indent=2))


if __name__ == "__main__":
    main()
