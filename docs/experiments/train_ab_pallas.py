"""Same-process A/B: flagship train step (B=1) with the Pallas patch gather
forward ON (round-3 default) vs OFF (XLA gather).

Driver: the round-3 train-step xplane profile jumped to ~9.2 s/step device
time (round 2: 2.5 s wall) right after the gather default flipped ON — at
TRAIN shapes the maps are 8x bigger than the per-frame eval slabs and the
kernel's full-map HBM->VMEM streaming may lose exactly as round 2 measured.
The scatter-add BACKWARD stays Pallas in both variants (custom VJP).

Usage: python train_ab_pallas.py [n]
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
train_step = make_train_step(model, tx, depth_cfg=dict(num_bins=96, downsample=16))

states = {}
jits = {}
for flag in ("1", "0"):
    os.environ["RACFORMER_IMG_PALLAS"] = flag
    os.environ["RACFORMER_BEV_PALLAS"] = flag
    states[flag] = TrainState(params, variables.get("batch_stats", {}),
                              tx.init(params), jnp.zeros((), jnp.int32))
    jitted = jax.jit(lambda s, b, r: train_step(s, b, r, 2.0))
    t0 = time.time()
    states[flag], m = jitted(states[flag], batch, jax.random.PRNGKey(3))
    print(f"pallas={flag}: compile+step {time.time() - t0:.1f}s "
          f"loss={float(jax.device_get(m['loss_total'])):.3f}", flush=True)
    jits[flag] = jitted

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def run(flag, k):
    t0 = time.perf_counter()
    s, m = states[flag], None
    r = jax.random.PRNGKey(11)
    for _ in range(k):
        r, sub = jax.random.split(r)
        s, m = jits[flag](s, batch, sub)
    float(jax.device_get(m["loss_total"]))
    return time.perf_counter() - t0


for rep in range(2):
    for flag in ("1", "0"):
        slope = (run(flag, 2 * n) - run(flag, n)) / n
        print(f"pallas={flag} rep{rep}: {slope:.3f} s/step", flush=True)
