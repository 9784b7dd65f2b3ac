"""Per-LINE xplane profile of the flagship train step (B=1).

Round-3's category table (BASELINE.md) summed every event on the TPU planes,
so async DMA lines inflated "copy/layout" to 3.98 s on a 2.34 s step. This
variant reports totals PER PLANE/LINE so the TensorCore compute line (the
true critical path) separates from the DMA queues, answering VERDICT r3
item 1's "find the real non-overlapped share".

Also slope-measures the wall step time for ground truth.
"""
import collections
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

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
state = TrainState(params, variables.get("batch_stats", {}), tx.init(params),
                   jnp.zeros((), jnp.int32))
train_step = make_train_step(model, tx, depth_cfg=dict(num_bins=96, downsample=16))
jitted = jax.jit(lambda s, b, r: train_step(s, b, r, 2.0), donate_argnums=(0,))

rng = jax.random.PRNGKey(7)
state, metrics = jitted(state, batch, rng)
float(jax.device_get(metrics["loss_total"]))


def run(n, s):
    t0 = time.perf_counter()
    m = None
    for i in range(n):
        s, m = jitted(s, batch, jax.random.fold_in(rng, i))
    float(jax.device_get(m["loss_total"]))
    return time.perf_counter() - t0, s


t2, state = run(2, state)
t6, state = run(6, state)
print(f"slope wall step: {(t6 - t2) / 4:.3f} s/step")

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace_lines"
N = 2
with jax.profiler.trace(outdir):
    m = None
    for i in range(N):
        state, m = jitted(state, batch, jax.random.fold_in(rng, i))
    float(jax.device_get(m["loss_total"]))

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = None
for root, _, files in os.walk(outdir):
    for f in files:
        if f.endswith(".xplane.pb"):
            p = os.path.join(root, f)
            if path is None or os.path.getmtime(p) > os.path.getmtime(path):
                path = p
xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "TensorCore" not in plane.name:
        continue
    print(f"\n=== plane: {plane.name}")
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        tot = 0.0
        byname = collections.Counter()
        span_lo, span_hi = float("inf"), 0.0
        for e in line.events:
            dur = e.duration_ps / 1e12
            tot += dur
            byname[ev_meta.get(e.metadata_id, "")] += dur
            t0 = e.offset_ps / 1e12
            span_lo = min(span_lo, t0)
            span_hi = max(span_hi, t0 + dur)
        if tot == 0:
            continue
        span = (span_hi - span_lo) if span_hi > span_lo else 0.0
        print(f"  line '{line.name}': busy {tot / N * 1e3:8.1f} ms/step over "
              f"span {span / N * 1e3:8.1f} ms/step  ({len(line.events)} events)")
        for k, v in byname.most_common(6):
            print(f"      {v / N * 1e3:8.2f} ms/step  {k[:100]}")
