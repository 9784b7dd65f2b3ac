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
            num_samples=max(64, global_batch * 4),
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
    if args.resume:
        restored = ckpt.restore_latest(state)
        if restored:
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

    train_step = make_train_step(
        model, tx, depth_cfg=dict(cfg.get("depth", {})),
        accum_steps=accum,
        match_stats=match_hook is not None,
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

    ema_params = None
    ema_step = None
    if args.ema:
        from racformer_tpu.train.hooks import ema_update

        # deep-copy: device_put would alias state.params, whose buffers the
        # donated train step frees
        ema_params = jax.tree_util.tree_map(jnp.copy, state.params)
        ema_step = jax.jit(ema_update, donate_argnums=(0,))

    from racformer_tpu.train.hostdata import host_batch_indices

    order = np.random.default_rng(args.seed).permutation(len(dataset))
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

    def step_indices(step):
        return host_batch_indices(order, step, global_batch, n_proc,
                                  jax.process_index())

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
                ckpt.save(step + 1, jax.device_get(state))
                if ema_params is not None:
                    import pickle as _pkl

                    with open(os.path.join(work_dir, "ema_params.pkl"), "wb") as f:
                        _pkl.dump(jax.device_get(ema_params), f)
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
