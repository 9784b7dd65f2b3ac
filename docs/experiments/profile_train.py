"""Per-op xplane profile of the flagship train step (B=1) on the real chip."""
import collections
import os
import re
import sys

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
jitted = jax.jit(lambda s, b, r: train_step(s, b, r, 2.0))

rng = jax.random.PRNGKey(7)
state, metrics = jitted(state, batch, rng)
float(jax.device_get(metrics["loss_total"]))

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
N = 2
with jax.profiler.trace(outdir):
    for i in range(N):
        state, metrics = jitted(state, batch, jax.random.fold_in(rng, i))
    float(jax.device_get(metrics["loss_total"]))

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

cat = collections.Counter()
byname = collections.Counter()
total = 0.0
for plane in xs.planes:
    if "/device:TPU" not in plane.name and "TensorCore" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for e in line.events:
            name = ev_meta.get(e.metadata_id, "")
            dur = e.duration_ps / 1e12
            total += dur
            byname[name] += dur
            n = name.lower()
            if "gather" in n:
                cat["gather"] += dur
            elif "scatter" in n:
                cat["scatter(XLA)"] += dur
            elif "custom-call" in n or "custom_call" in n:
                cat["pallas"] += dur
            elif re.search(r"conv|dot|einsum", n):
                cat["matmul/conv"] += dur
            elif "fusion" in n:
                cat["fusion(elementwise)"] += dur
            elif re.search(r"copy|transpose|reshape|bitcast", n):
                cat["copy/layout"] += dur
            elif re.search(r"reduce|sort|top-k|topk|while", n):
                cat["reduce/sort/while"] += dur
            else:
                cat["other"] += dur

print(f"\ntotal device time over {N} steps: {total * 1e3:.1f} ms "
      f"({total / N * 1e3:.1f} ms/step)")
for k, v in cat.most_common():
    print(f"  {k:24s} {v / N * 1e3:8.1f} ms/step")
print("\ntop ops:")
for k, v in byname.most_common(20):
    print(f"  {v / N * 1e3:8.2f} ms/step  {k[:110]}")
