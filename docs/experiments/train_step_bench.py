"""Slope-measured flagship train-step time on the real chip (B=1).

Round-1 baseline: 8.8 s/step, of which ~6.7 s was XLA's scatter-add backward
of the sampling gathers. This script measures the full jitted train step
(forward + backward + AdamW) with the slope protocol.

Usage: python train_step_bench.py [steps] [batch] [accum]

Round-3 addendum: pass batch=2 to measure the reference recipe's 2
samples/device (`configs/racformer_r50_nuimg_704x256_f8.py:295-308`);
pass accum=2 to run it as 2 x B=1 gradient-accumulation microbatches
(the fused B=2 pass OOMs on a 16 GB v5e — BASELINE.md round-3 table).
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model
from racformer_tpu.model import preprocess_images
from racformer_tpu.train import TrainState, make_optimizer, make_train_step

model = _flagship_model(train=True)
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
batch = _example_batch(model, B=B, P=1536, with_gt=True)
batch = {k: jnp.asarray(v) for k, v in batch.items()}
print(f"batch B={B}")

t0 = time.time()
variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
     "dropout": jax.random.PRNGKey(2)},
    preprocess_images(batch["imgs"]),
    batch["radar_points"], batch["radar_mask"], batch["radar_depth"],
    batch["radar_rcs"], batch["lidar2img"], batch["img2lidar"],
    batch["time_diff"],
    gt_bboxes=batch["gt_bboxes"], gt_labels=batch["gt_labels"],
    gt_mask=batch["gt_mask"],
)
print(f"init: {time.time() - t0:.1f}s")

params = variables["params"]
tx, _ = make_optimizer(params, total_steps=1000)
state = TrainState(params, variables.get("batch_stats", {}), tx.init(params),
                   jnp.zeros((), jnp.int32))
accum = int(sys.argv[3]) if len(sys.argv) > 3 else 1
train_step = make_train_step(model, tx, depth_cfg=dict(num_bins=96, downsample=16),
                             accum_steps=accum)
jitted = jax.jit(lambda s, b, r: train_step(s, b, r, 2.0))

rng = jax.random.PRNGKey(7)


def run(n, state):
    t0 = time.perf_counter()
    r = rng
    metrics = None
    for _ in range(n):
        r, sub = jax.random.split(r)
        state, metrics = jitted(state, batch, sub)
    lt = float(jax.device_get(metrics["loss_total"]))
    return time.perf_counter() - t0, lt, state


t0 = time.time()
_, lt, state = run(1, state)
print(f"compile+first step: {time.time() - t0:.1f}s loss={lt:.3f}")

n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
t1, lt1, state = run(n, state)
t2, lt2, state = run(2 * n, state)
print(f"train step (slope, n={n}): {(t2 - t1) / n:.3f} s/step "
      f"(t{n}={t1:.2f}s t{2*n}={t2:.2f}s, loss={lt2:.3f})")
