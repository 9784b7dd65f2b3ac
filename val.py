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
    p.add_argument("--streams", type=int, default=1,
                   help="with --streaming: run N independent scene streams "
                        "in lockstep (throughput protocol; batch axis shards "
                        "over the data mesh on multi-chip hosts). 1 = the "
                        "single-stream latency protocol")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=1,
                   help="samples per chip; the effective batch is this times "
                        "jax.device_count() (sharded over the data mesh)")
    p.add_argument("--plot-dir", default=None,
                   help="write PR/TP-curve diagnostics + LaTeX table here "
                        "(tools/eval_plots.py, the reference's render.py set)")
    p.add_argument("--dump-eval", default=None,
                   help="pickle (preds, gts) here for offline re-analysis")
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
    from racformer_tpu.model import RaCFormer, preprocess_images

    cfg = Config.fromfile(args.config).merge_override(args.override)
    model_cfg = dict(cfg.model)
    if "num_classes" not in model_cfg and cfg.get("class_names"):
        model_cfg["num_classes"] = len(cfg.class_names)
    if cfg.get("decoder"):
        model_cfg.setdefault("decoder", dict(cfg.decoder))
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
            ida_cfg=dict(cfg.ida_aug) if cfg.get("ida_aug") else None,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
            training=False,
            max_samples=max_samples,
        )

    sample = dataset[0]
    batch = {
        k: jnp.asarray(v)[None] for k, v in sample.items()
        if k not in ("token", "scene", "timestamp")
    }
    arg_keys = ("imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
                "lidar2img", "img2lidar", "time_diff")

    variables = jax.jit(
        lambda b: model.init(
            jax.random.PRNGKey(0), preprocess_images(b["imgs"]),
            *[b[k] for k in arg_keys[1:]],
        )
    )(batch)

    legacy_version = "v1.0.0"
    if args.checkpoint:
        if os.path.isfile(args.checkpoint) and args.checkpoint.endswith((".pth", ".pt")):
            # a released torch checkpoint: convert in place and honor its
            # legacy `version` field (the reference reads it into VERSION.name
            # for the v0.17.1 box-convention flip, `val.py:126-132`)
            import torch

            from racformer_tpu.tools.convert_weights import load_pretrained

            ckpt = torch.load(args.checkpoint, map_location="cpu",
                              weights_only=False)
            legacy_version = ckpt.get("version", legacy_version) or legacy_version
            variables = dict(variables)
            variables["params"] = load_pretrained(
                args.checkpoint, variables["params"],
                state_dict=ckpt.get("state_dict", ckpt))
        elif os.path.isfile(args.checkpoint):
            # a pickled {'params': ..., 'batch_stats': ...} variables file
            # (produced by the weight converter or a training export);
            # an optional 'version' entry carries the legacy box convention
            import pickle

            with open(args.checkpoint, "rb") as f:
                variables = pickle.load(f)
            legacy_version = variables.pop("version", legacy_version)
        else:
            # an orbax work_dir from train.py: restore (params, batch_stats)
            # only — eval has no optimizer state to rebuild a full template
            from racformer_tpu.train.checkpoint import CheckpointManager

            ckpt = CheckpointManager(args.checkpoint, verify=False)
            restored = ckpt.restore_latest_eval(
                variables["params"], variables.get("batch_stats", {}))
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {args.checkpoint}")
            _, params, batch_stats = restored
            variables = {"params": params, "batch_stats": batch_stats}

    ecfg = dict(cfg.get("eval_cfg", {}))
    ecfg.setdefault("legacy_version", legacy_version)

    preds, gts = [], []
    t_total, n = 0.0, 0
    num = len(dataset)

    if args.streaming and args.streams > 1:
        # multi-stream throughput protocol: N independent scene streams in
        # lockstep (per-stream in-graph scene resets); on a multi-chip host
        # the stream axis shards over the data mesh, each chip running its
        # own streams with batch-local gathers
        from racformer_tpu.eval.streaming import (
            StreamingEvaluator, run_multistream)

        mesh = None
        ndev = jax.device_count()
        if ndev > 1 and args.streams % ndev == 0:
            mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
        elif ndev > 1:
            print(f"warning: --streams {args.streams} not a multiple of the "
                  f"device count {ndev}; running all streams on one device "
                  f"(pass a multiple of {ndev} to shard over the mesh)")
        ev = StreamingEvaluator(model, variables, eval_cfg=ecfg, mesh=mesh)
        preds, gts, fps = run_multistream(ev, dataset, args.streams)
    elif args.streaming:
        # per-frame feature-cache path (the reference's simple_test_online,
        # promoted to the primary FPS protocol)
        from racformer_tpu.eval.offline import gather_gt_sample
        from racformer_tpu.eval.streaming import (
            StreamingEvaluator, prepare_frame, radar_maps_are_columns,
            sample_timestamp)

        # single-stream is a SINGLE-device latency protocol: on a multi-chip
        # host the batch-local auto rule (device_count > 1) would switch the
        # patch gathers to the measured-slower batched/partitioned forms for
        # no benefit — pin them to the single-chip fast path unless the user
        # overrode explicitly (ops/bilinear.resolve_batch_local precedence)
        os.environ.setdefault("RACFORMER_BATCH_LOCAL", "0")
        ev = StreamingEvaluator(model, variables, eval_cfg=ecfg)
        prev_scene = None
        use_radar_cols = None
        scene_t0 = 0.0
        for i in range(num):
            s = dataset[i]
            # reset the temporal cache at scene boundaries so frames never
            # bleed across scenes (the reference keys its feature cache by
            # filename for the same reason, `models/racformer.py:503-556`)
            scene = s.get("scene", None)
            ts_abs = sample_timestamp(s, i)
            if scene is not None and scene != prev_scene:
                if prev_scene is not None:
                    ev.reset()
                prev_scene = scene
                scene_t0 = ts_abs
            elif scene is None and i == 0:
                scene_t0 = ts_abs
            if use_radar_cols is None:
                use_radar_cols = radar_maps_are_columns(s)
            # rebase to the scene start IN FLOAT64 before the device float32
            # cast: epoch-seconds (~1.5e9) have a 128 s float32 ULP, which
            # would quantize every inter-frame time_diff to 0
            frame = prepare_frame(s, ts_abs - scene_t0, use_radar_cols)
            t0 = time.perf_counter()
            out = ev.step(frame, blocking=False)
            jax.block_until_ready(out)
            if i > 0:
                t_total += time.perf_counter() - t0
                n += 1
            out = jax.device_get(out)
            preds.append({k: v[0] for k, v in out.items()})
            g = gather_gt_sample(s)
            if g is not None:
                gts.append(g)
    else:
        # batched offline eval, sharded over the data mesh — shared with
        # train.py's in-training periodic eval (eval/offline.py)
        from racformer_tpu.eval.offline import OfflineEvaluator

        ev = OfflineEvaluator(model, eval_cfg=ecfg,
                              batch_per_chip=max(1, int(args.batch_size)))
        preds, gts, fps = ev.run(variables, dataset)

    if args.streaming and args.streams == 1:
        fps = n / t_total if t_total > 0 else 0.0
    print(f"eval: {num} samples, {fps:.2f} samples/s")

    if gts:
        from racformer_tpu.eval.offline import detection_metrics

        metrics = detection_metrics(
            preds, gts, is_vod=is_vod,
            class_names=list(cfg.get("class_names", [])) or None,
            front_only=bool(cfg.get("eval_front_only", False)),
            return_curves=bool(args.plot_dir),
        )
        if not is_vod:
            if args.plot_dir:
                # the metrics call indexes labels into the protocol
                # CLASS_NAMES, so the plots must too
                from racformer_tpu.tools.eval_plots import render_all

                render_all(metrics, args.plot_dir)
                print(f"eval plots -> {args.plot_dir}")
        if args.dump_eval:
            import pickle

            with open(args.dump_eval, "wb") as f:
                pickle.dump((preds, gts), f)
        print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()
                          if isinstance(v, (int, float))}, indent=2))


if __name__ == "__main__":
    main()
