#!/usr/bin/env python
"""Training driver.

CLI-compatible surface with the reference (`/root/reference/train.py`):
  python train.py --config racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py \
      [--work-dir out] [--override k=v ...] [--resume] [--synthetic]

Distributed model: single-controller JAX over a `data` mesh axis spanning all
local chips (the reference spawns 8 DDP processes via torchrun; here one
process drives the mesh and XLA inserts the gradient collectives).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--override", nargs="+", default=[])
    p.add_argument("--resume", action="store_true")
    p.add_argument("--load-from", default=None, help="pretrained params pickle")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic dataset (no nuScenes needed)")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema", action="store_true",
                   help="track EMA weights (MEGVIIEMAHook equivalent)")
    p.add_argument("--fp16-loss-scale", type=float, default=None,
                   help="static loss scale for parity debugging (mirrors the "
                        "reference's fp16 = dict(loss_scale=512.)); also "
                        "readable from cfg.fp16['loss_scale']")
    p.add_argument("--match-stats", action="store_true",
                   help="dump per-decoder-layer Hungarian match statistics "
                        "each epoch (working ISSaveHook equivalent)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host pod slice: initialize jax.distributed "
                        "(run the same command on every host)")
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
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from racformer_tpu.config import Config
    from racformer_tpu.data import NuScenesRadarDataset, SyntheticDataset
    from racformer_tpu.model import RaCFormer, preprocess_images
    from racformer_tpu.train import TrainState, make_optimizer, make_train_step
    from racformer_tpu.train.checkpoint import CheckpointManager
    from racformer_tpu.train.hooks import DepthWeightCurriculum
    from racformer_tpu.utils import MetricLogger

    if args.distributed:
        # multi-host: DCN coordination comes from the TPU pod environment;
        # afterwards jax.devices() spans all hosts and the single GSPMD mesh
        # below covers the slice (the reference's torchrun/NCCL equivalent)
        jax.distributed.initialize()

    cfg = Config.fromfile(args.config).merge_override(args.override)
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0]
    )
    os.makedirs(work_dir, exist_ok=True)
    if jax.process_index() == 0:
        from racformer_tpu.utils.logging import backup_code

        backup_code(work_dir)
        with open(os.path.join(work_dir, "config_dump.py"), "w") as f:
            f.write(cfg.dump())

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("data",))
    n_dev = len(devices)
    batch_per_chip = int(cfg.get("batch_size_per_chip", 2))
    global_batch = batch_per_chip * n_dev

    model_cfg = dict(cfg.model)
    if "num_classes" not in model_cfg and cfg.get("class_names"):
        model_cfg["num_classes"] = len(cfg.class_names)
    if cfg.get("decoder"):
        model_cfg.setdefault("decoder", dict(cfg.decoder))
    model = RaCFormer(**model_cfg, train_mode=True)

    # --- dataset ---------------------------------------------------------
    ann = cfg.data["train"]["ann_file"]
    if args.synthetic or not os.path.exists(ann):
        dataset = SyntheticDataset(
            num_samples=int(cfg.get("synthetic_samples",
                                    max(64, global_batch * 4))),
            num_cams=model.num_cams,
            num_frames=model.num_frames,
            hw=model.image_hw,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
        )
    elif cfg.get("dataset_type") == "vod":
        from racformer_tpu.data.vod import VoDDataset

        dataset = VoDDataset(
            ann,
            data_root=cfg.data["train"].get("data_root", ""),
            image_hw=model.image_hw,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
            training=True,
        )
    else:
        dataset = NuScenesRadarDataset(
            ann,
            num_frames=model.num_frames,
            frame_interval=tuple(cfg.data["train"].get("frame_interval", (4, 8))),
            image_hw=model.image_hw,
            ida_cfg=dict(cfg.ida_aug) if cfg.get("ida_aug") else None,
            bev_aug_cfg=dict(cfg.bev_aug) if cfg.get("bev_aug") else None,
            max_radar_points=cfg.radar["max_points"],
            max_gt=model.max_gt,
            training=True,
            seed=args.seed,
        )

    steps_per_epoch = max(len(dataset) // global_batch, 1)
    total_epochs = int(cfg.get("total_epochs", 36))
    total_steps = args.max_steps or steps_per_epoch * total_epochs

    # --- init ------------------------------------------------------------
    sample = dataset.batch(list(range(global_batch)))
    host_keys = ("token", "scene", "timestamp")  # host-side metadata, not model inputs
    batch = {k: jnp.asarray(v) for k, v in sample.items() if k not in host_keys}
    rngs = {
        "params": jax.random.PRNGKey(args.seed),
        "dn": jax.random.PRNGKey(args.seed + 1),
        "dropout": jax.random.PRNGKey(args.seed + 2),
    }
    variables = jax.jit(
        lambda b: model.init(
            rngs, preprocess_images(b["imgs"]), b["radar_points"], b["radar_mask"],
            b["radar_depth"], b["radar_rcs"], b["lidar2img"], b["img2lidar"],
            b["time_diff"], gt_bboxes=b["gt_bboxes"], gt_labels=b["gt_labels"],
            gt_mask=b["gt_mask"],
        )
    )(batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if args.load_from or cfg.get("load_from"):
        from racformer_tpu.tools.convert_weights import load_pretrained

        path = args.load_from or cfg.load_from
        if os.path.exists(path):
            params = load_pretrained(path, params, cfg.get("revise_keys"))

    opt = dict(cfg.get("optimizer", {}))
    tx, sched = make_optimizer(
        params,
        base_lr=opt.get("base_lr", 4e-4),
        weight_decay=opt.get("weight_decay", 0.01),
        total_steps=total_steps,
        warmup_steps=opt.get("warmup_steps", 500),
        clip_norm=opt.get("clip_norm", 35.0),
    )
    state = TrainState(params, batch_stats, tx.init(params), jnp.zeros((), jnp.int32))

    ckpt = CheckpointManager(work_dir, max_keep=4)
    start_step = 0
    ema_params = None
    if args.resume:
        # EMA state rides inside the managed checkpoint (verified/rotated/
        # resumable — `/root/reference/models/hook/ema.py:100-118` equivalent)
        restored = (ckpt.restore_latest(state, ema_template=state.params)
                    if args.ema else ckpt.restore_latest(state))
        if restored:
            if args.ema:
                start_step, state, ema_params = restored
            else:
                start_step, state = restored
            print(f"resumed from step {start_step}")

    match_hook = None
    if args.match_stats or cfg.get("match_stats"):
        from racformer_tpu.train.hooks import MatchStatsHook

        match_hook = MatchStatsHook(
            os.path.join(work_dir, "match_stats"), rank=jax.process_index()
        )

    # accumulation is a per-chip memory measure: clamp it to a divisor of the
    # per-chip batch (e.g. the flagship config's accumulate_steps=2 is moot —
    # and indivisible — when run at batch_size_per_chip=1)
    accum = int(cfg.get("accumulate_steps", 1))
    if accum < 1:
        raise ValueError(f"accumulate_steps must be >= 1, got {accum}")
    if batch_per_chip % accum:
        import math

        eff = math.gcd(accum, batch_per_chip)
        print(f"accumulate_steps={accum} does not divide "
              f"batch_size_per_chip={batch_per_chip}; using {eff}")
        accum = eff

    fp16 = dict(cfg.get("fp16") or {})
    loss_scale = (args.fp16_loss_scale if args.fp16_loss_scale is not None
                  else float(fp16.get("loss_scale", 0.0)))
    train_step = make_train_step(
        model, tx, depth_cfg=dict(cfg.get("depth", {})),
        accum_steps=accum,
        match_stats=match_hook is not None,
        loss_scale=loss_scale,
    )
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        train_step,
        in_shardings=(repl, {k: shard for k in batch}, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

    state = jax.device_put(state, repl)
    curriculum = DepthWeightCurriculum(start_epoch=18)
    logger = MetricLogger(work_dir, total_steps=total_steps,
                          rank=jax.process_index())
    # rbg PRNG: dropout draws tens of millions of bits per step; threefry is
    # measurably slower on TPU for that volume
    rng = jax.random.key(args.seed + 17, impl="rbg")

    ema_step = None
    if args.ema:
        from racformer_tpu.train.hooks import ema_update

        if ema_params is None:
            # deep-copy: device_put would alias state.params, whose buffers
            # the donated train step frees
            ema_params = jax.tree_util.tree_map(jnp.copy, state.params)
        else:
            ema_params = jax.device_put(ema_params, repl)
        ema_step = jax.jit(ema_update, donate_argnums=(0,))

    from racformer_tpu.train.hostdata import epoch_order, host_batch_indices

    n_proc = jax.process_count()
    local_batch = global_batch // n_proc

    def put_batch(sample):
        """Shard the host batch onto the mesh; on multi-host each process
        contributes its local slice of the global batch (the deterministic
        per-host sharding replacing DistributedGroupSampler)."""
        out = {}
        for k, v in sample.items():
            if k in host_keys:
                continue
            if n_proc > 1:
                out[k] = jax.make_array_from_process_local_data(shard, np.asarray(v))
            else:
                out[k] = jax.device_put(jnp.asarray(v), shard)
        return out

    # per-epoch reshuffle (DistributedGroupSampler.set_epoch equivalent):
    # each epoch draws a fresh permutation from (seed, epoch), identical on
    # every process; the cache holds the current + next epoch so the
    # prefetcher can run ahead across the boundary without re-deriving
    _orders: dict = {}

    def step_indices(step):
        epoch = step // steps_per_epoch
        if epoch not in _orders:
            for e in [k for k in _orders if k < epoch - 1]:
                del _orders[e]
            _orders[epoch] = epoch_order(args.seed, epoch, len(dataset))
        return host_batch_indices(_orders[epoch], step % steps_per_epoch,
                                  global_batch, n_proc, jax.process_index())

    # --- in-training periodic eval (the reference registers DistEvalHook
    # with `evaluation = dict(interval=2)`, `/root/reference/train.py:147-172`
    # + `configs/..._f8.py:334`): every `interval` epochs, run the sharded
    # offline predict path on the val split, log NDS/mAP, keep a `best`
    # checkpoint under work_dir/best -------------------------------------
    ev_cfg = dict(cfg.get("evaluation") or {})
    eval_interval = int(ev_cfg.get("interval", 2))
    eval_max = ev_cfg.get("max_samples")
    # mode="streaming" routes the in-training eval through the streaming
    # evaluator (1 frame of trunk compute per sample ~= 8x cheaper than the
    # offline full-window recompute; windows come from scene history instead
    # of the sample's own sweeps, so its metrics are an internally consistent
    # training signal, not the reference's offline protocol numbers).
    # Single-controller protocol: multi-process runs fall back to offline.
    eval_mode = str(ev_cfg.get("mode", "offline"))
    best_key = ev_cfg.get(
        "save_best", "mAP3D_all" if cfg.get("dataset_type") == "vod" else "NDS")
    _eval = {"runner": None, "dataset": None, "best": float("-inf"),
             "last_step": -1, "best_mgr": None}

    def _build_val_dataset():
        vann = cfg.data.get("val", {}).get("ann_file", "")
        if args.synthetic or not os.path.exists(vann):
            return SyntheticDataset(
                num_samples=int(eval_max or 8),
                num_cams=model.num_cams, num_frames=model.num_frames,
                hw=model.image_hw, max_radar_points=cfg.radar["max_points"],
                max_gt=model.max_gt,
            )
        if cfg.get("dataset_type") == "vod":
            from racformer_tpu.data.vod import VoDDataset

            return VoDDataset(
                vann, data_root=os.path.dirname(os.path.dirname(vann)),
                image_hw=model.image_hw,
                max_radar_points=cfg.radar["max_points"],
                max_gt=model.max_gt, max_samples=eval_max,
            )
        return NuScenesRadarDataset(
            vann, num_frames=model.num_frames,
            frame_interval=int(cfg.data["val"].get("frame_interval", 6)),
            image_hw=model.image_hw,
            ida_cfg=dict(cfg.ida_aug) if cfg.get("ida_aug") else None,
            max_radar_points=cfg.radar["max_points"], max_gt=model.max_gt,
            training=False, max_samples=eval_max,
        )

    def run_in_training_eval(step, cur_state):
        if _eval["last_step"] == step:
            return
        _eval["last_step"] = step
        from racformer_tpu.eval.offline import OfflineEvaluator, detection_metrics

        streaming = eval_mode == "streaming" and jax.process_count() == 1
        if eval_mode == "streaming" and not streaming and step == 0:
            print("evaluation.mode=streaming is a single-controller "
                  "protocol; multi-process run falls back to offline")
        variables = {"params": cur_state.params,
                     "batch_stats": cur_state.batch_stats}
        if _eval["runner"] is None:
            eval_model = RaCFormer(**model_cfg, train_mode=False)
            _eval["dataset"] = _build_val_dataset()
            if streaming:
                from racformer_tpu.eval.streaming import StreamingEvaluator

                _eval["runner"] = StreamingEvaluator(
                    eval_model, variables,
                    eval_cfg=dict(cfg.get("eval_cfg", {})))
            else:
                _eval["runner"] = OfflineEvaluator(
                    eval_model, eval_cfg=dict(cfg.get("eval_cfg", {})))
        if streaming:
            from racformer_tpu.eval.streaming import run_multistream

            # variables are a jitted-fn ARGUMENT, so updating the attribute
            # reuses the compiled step across evals (no retrace)
            _eval["runner"].variables = variables
            preds, gts_v, _ = run_multistream(
                _eval["runner"], _eval["dataset"],
                streams=int(ev_cfg.get("streams", 1)))
        else:
            preds, gts_v, _ = _eval["runner"].run(
                variables, _eval["dataset"], max_samples=eval_max)
        if not gts_v:
            return
        metrics = detection_metrics(
            preds, gts_v, is_vod=cfg.get("dataset_type") == "vod",
            class_names=list(cfg.get("class_names", [])) or None,
            front_only=bool(cfg.get("eval_front_only", False)),
        )
        scalars = {k: float(v) for k, v in metrics.items()
                   if isinstance(v, (int, float))}
        logger.log_eval(step + 1, scalars)
        score = scalars.get(best_key)
        if score is not None and score > _eval["best"]:
            # the orbax save is a COLLECTIVE (cross-process barriers sized
            # to process_count) — every process must enter it, or process 0
            # deadlocks waiting for peers that went back to training. The
            # decision is cross-process consistent because OfflineEvaluator
            # returns the full (preds, gts) on every process. Only the
            # metrics.json side-file is rank-0 work.
            _eval["best"] = score
            if _eval["best_mgr"] is None:
                _eval["best_mgr"] = CheckpointManager(
                    os.path.join(work_dir, "best"), max_keep=1, verify=False)
            _eval["best_mgr"].save(step + 1, jax.device_get(cur_state))
            if jax.process_index() == 0:
                import json as _json

                with open(os.path.join(work_dir, "best", "metrics.json"),
                          "w") as f:
                    _json.dump({"step": step + 1, best_key: score, **scalars},
                               f)

    # async input pipeline: sample loading in worker threads, batch k+1
    # device_put while step k runs (the reference uses 4 DataLoader worker
    # processes per GPU, `loaders/builder.py:28-43`)
    from racformer_tpu.data.prefetch import PrefetchLoader

    loader = PrefetchLoader(
        dataset, step_indices, total_steps, start_step=start_step,
        num_workers=int(cfg.get("data_workers", 4)), prefetch=2, put=put_batch,
    )
    log_every = int(cfg.get("log_interval", 10))
    pending = []  # (step, lazy device metrics, lazy gt refs) fetched in blocks

    # multi-host safety: the hook dumps per-rank slices (mirroring the
    # reference's per-rank match files), and device_get on the sharded gt
    # arrays would raise — see hostdata.host_local_rows
    from racformer_tpu.train.hostdata import host_local_rows as _local_rows

    row_lo = jax.process_index() * local_batch

    def flush_pending():
        for s, m, gt in pending:
            m = jax.device_get(m)
            logger.log_step(
                s, {k: v for k, v in m.items() if not k.startswith("_")},
                lr=float(sched(s)),
            )
            if match_hook is not None and gt is not None:
                # replicated [L, B, G] match metrics: keep this rank's rows
                mloc = {
                    k: np.asarray(v)[:, row_lo:row_lo + local_batch]
                    for k, v in m.items() if k.startswith("_")
                }
                match_hook.record(s, mloc, *[_local_rows(g) for g in gt])
        pending.clear()

    try:
        for step in range(start_step, total_steps):
            epoch = step // steps_per_epoch
            batch = loader.get(step)
            rng, sub = jax.random.split(rng)
            state, metrics = jitted(
                state, batch, jax.device_put(sub, repl),
                jnp.asarray(curriculum.weight(epoch), jnp.float32),
            )
            if ema_params is not None:
                ema_params = ema_step(ema_params, state.params, jnp.float32(step))
            # no per-step host sync: metrics stay on device and are fetched in
            # a block every `log_every` steps (the device runs ahead)
            pending.append((
                step, metrics,
                (batch["gt_labels"], batch["gt_mask"])
                if match_hook is not None else None,
            ))
            if len(pending) >= log_every or step == total_steps - 1:
                flush_pending()

            if (step + 1) % steps_per_epoch == 0 or step == total_steps - 1:
                flush_pending()
                if match_hook is not None:
                    match_hook.after_epoch(epoch)
                ckpt.save(
                    step + 1, jax.device_get(state),
                    ema=(jax.device_get(ema_params)
                         if ema_params is not None else None),
                )
                # eval fires on true epoch boundaries only (matching the
                # reference's epoch-interval DistEvalHook); a --max-steps
                # run that stops mid-epoch skips it
                if (eval_interval > 0
                        and (step + 1) % steps_per_epoch == 0
                        and (epoch + 1) % eval_interval == 0):
                    run_in_training_eval(step, state)
    finally:
        loader.close()
        if match_hook is not None:
            # spill any partial-epoch match stats on exit/crash rather than
            # dropping them (keyed by the last reached epoch)
            try:
                match_hook.after_epoch(step // steps_per_epoch)
            except NameError:
                pass

    print("training done")


if __name__ == "__main__":
    main()
