"""Bound the two documented training deviations (VERDICT r3 item 7).

(a) BN batch statistics over all T frames (default batched path) vs the
    reference's frame-0-only train-mode stats + eval-mode history
    (`/root/reference/models/racformer.py:316-331`) — reproduced exactly by
    `RaCFormer(bn_frame0_only=True)`;
(b) gradient accumulation (accum_steps=2, per-microbatch loss normalization
    and BN updates) vs the fused step.

Protocol: identical init/weights/data/rng, 5 optimizer steps each, overlay
loss_total per step, report the max relative divergence. Tiny shapes, CPU
deterministic. Results recorded in docs/PARITY.md.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from test_model_forward import make_model, tiny_batch  # noqa: E402

from racformer_tpu.model import preprocess_images  # noqa: E402
from racformer_tpu.train import (TrainState, make_optimizer,  # noqa: E402
                                 make_train_step)

STEPS = 5
rng_np = np.random.default_rng(0)
batches = []
for s in range(STEPS):
    b, g = tiny_batch(np.random.default_rng(s), B=2)
    batches.append({k: jnp.asarray(v) for k, v in {**b, **g}.items()})


def run(model, accum):
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        preprocess_images(batches[0]["imgs"]),
        batches[0]["radar_points"], batches[0]["radar_mask"],
        batches[0]["radar_depth"], batches[0]["radar_rcs"],
        batches[0]["lidar2img"], batches[0]["img2lidar"],
        batches[0]["time_diff"], gt_bboxes=batches[0]["gt_bboxes"],
        gt_labels=batches[0]["gt_labels"], gt_mask=batches[0]["gt_mask"],
    )
    params = variables["params"]
    tx, _ = make_optimizer(params, total_steps=STEPS + 1)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, depth_cfg=dict(num_bins=16),
                           accum_steps=accum)
    jitted = jax.jit(lambda s, b, r: step(s, b, r, 2.0))
    losses = []
    for i in range(STEPS):
        state, m = jitted(state, batches[i], jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss_total"]))
    return np.asarray(losses)


def report(tag, a, b):
    rel = np.abs(a - b) / np.maximum(np.abs(a), 1e-9)
    print(f"\n{tag}")
    for i in range(STEPS):
        print(f"  step {i}: {a[i]:.6f} vs {b[i]:.6f}  rel {rel[i]:.2%}")
    print(f"  max relative divergence: {rel.max():.2%}")
    return rel.max()


base = run(make_model(train=True), accum=1)
f0 = run(make_model(train=True, bn_frame0_only=True), accum=1)
acc = run(make_model(train=True), accum=2)

m1 = report("(a) all-frame BN stats (default) vs reference frame0-only BN", base, f0)
m2 = report("(b) fused B=2 step vs accum_steps=2", base, acc)
print(f"\nsummary: bn_semantics_max_rel={m1:.4f} accum_max_rel={m2:.4f}")
