"""A/B the decoder scan's remat policy on the flagship train step (B=1).

VERDICT r3 item 1: the decoder backward while-loop (1.67 s of the 2.34 s
step) recomputes the full layer forward under full remat. Policies that save
matmul outputs trade HBM for recompute; this sweeps them same-process (the
shared dev chip's tenant variance makes cross-process timing useless).

Usage: python docs/experiments/remat_policy_ab.py [policy ...]
(default: full dots_no_batch)
"""
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model
from racformer_tpu.model import preprocess_images
from racformer_tpu.train import TrainState, make_optimizer, make_train_step

model = _flagship_model(train=True)
batch = {k: jnp.asarray(v) for k, v in
         _example_batch(model, B=1, P=1536, with_gt=True).items()}
variables = jax.jit(model.init)(
    {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
     "dropout": jax.random.PRNGKey(2)},
    preprocess_images(batch["imgs"]),
    batch["radar_points"], batch["radar_mask"], batch["radar_depth"],
    batch["radar_rcs"], batch["lidar2img"], batch["img2lidar"],
    batch["time_diff"], gt_bboxes=batch["gt_bboxes"],
    gt_labels=batch["gt_labels"], gt_mask=batch["gt_mask"],
)
params = variables["params"]
tx, _ = make_optimizer(params, total_steps=1000)
state0 = TrainState(params, variables.get("batch_stats", {}), tx.init(params),
                    jnp.zeros((), jnp.int32))
rng = jax.random.PRNGKey(7)

policies = sys.argv[1:] or ["full", "dots_no_batch"]
results = {}
for pol in policies:
    os.environ["RACFORMER_REMAT_POLICY"] = pol
    train_step = make_train_step(
        model, tx, depth_cfg=dict(num_bins=96, downsample=16))
    jitted = jax.jit(lambda s, b, r: train_step(s, b, r, 2.0))
    state = state0
    try:
        t0 = time.perf_counter()
        state, m = jitted(state, batch, rng)
        float(jax.device_get(m["loss_total"]))
        compile_s = time.perf_counter() - t0

        def run(n, s):
            t0 = time.perf_counter()
            mm = None
            for i in range(n):
                s, mm = jitted(s, batch, jax.random.fold_in(rng, i))
            float(jax.device_get(mm["loss_total"]))
            return time.perf_counter() - t0, s

        t2, state = run(2, state)
        t6, state = run(6, state)
        step_s = (t6 - t2) / 4
        results[pol] = step_s
        print(f"{pol:16s} compile {compile_s:7.1f}s  step {step_s:6.3f} s "
              f"(slope of 2->6)", flush=True)
    except Exception as e:
        results[pol] = None
        print(f"{pol:16s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

print("\nsummary:", {k: (round(v, 3) if v else "fail")
                     for k, v in results.items()})
