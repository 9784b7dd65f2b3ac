"""Per-op profile of the streaming decode_window on the real chip.

Captures a jax.profiler trace of N chained decode_window calls and aggregates
device-plane event durations by op category. Round-1 snapshot (pre row-fusion):
928 -> 601 ms via bf16/patch-gathers/hoisting; this tells us where the
remaining time goes.

Usage: python profile_decode.py [outdir]
"""
import collections
import os
import re
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model
from racformer_tpu.eval.streaming import StreamingEvaluator
from racformer_tpu.model import preprocess_images

model = _flagship_model(train=False)
batch = _example_batch(model)
arg_keys = ("radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")
variables = jax.jit(model.init)(
    jax.random.PRNGKey(0),
    preprocess_images(jnp.asarray(batch["imgs"])),
    *[jnp.asarray(batch[k]) for k in arg_keys],
)

ev = StreamingEvaluator(model, variables)


def frame(t):
    return dict(
        imgs=batch["imgs"][0, t], radar_points=batch["radar_points"][0, t],
        radar_mask=batch["radar_mask"][0, t], radar_depth=batch["radar_depth"][0, t],
        radar_rcs=batch["radar_rcs"][0, t], lidar2img=batch["lidar2img"][0, t],
        img2lidar=batch["img2lidar"][0, t], timestamp=0.5 * t,
    )


# warm up / compile
for t in range(3):
    out = ev.step(frame(t), blocking=False)
jax.block_until_ready(out["scores"])

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/decode_trace"
N = 4
with jax.profiler.trace(outdir):
    for t in range(N):
        out = ev.step(frame(3 + t), blocking=False)
    float(jax.device_get(out["scores"][0, 0]))

# ---- parse the xplane ----
from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = None
for root, _, files in os.walk(outdir):
    for f in files:
        if f.endswith(".xplane.pb"):
            p = os.path.join(root, f)
            if path is None or os.path.getmtime(p) > os.path.getmtime(path):
                path = p
assert path, "no xplane found"
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
        if "XLA Ops" not in line.name and "Steps" not in line.name:
            pass
        for e in line.events:
            name = ev_meta.get(e.metadata_id, "")
            if not name or "XLA Ops" not in line.name:
                continue
            dur = e.duration_ps / 1e12
            total += dur
            byname[name] += dur
            n = name.lower()
            if "gather" in n:
                cat["gather"] += dur
            elif "scatter" in n:
                cat["scatter"] += dur
            elif "custom-call" in n or "custom_call" in n:
                cat["custom-call(pallas)"] += dur
            elif re.search(r"conv|dot|einsum", n):
                cat["matmul/conv"] += dur
            elif "fusion" in n:
                cat["fusion(elementwise)"] += dur
            elif re.search(r"copy|transpose|reshape|bitcast", n):
                cat["copy/layout"] += dur
            elif re.search(r"reduce|sort|top-k|topk", n):
                cat["reduce/sort"] += dur
            else:
                cat["other"] += dur

print(f"\ntotal device time over {N} steps: {total * 1e3:.1f} ms "
      f"({total / N * 1e3:.1f} ms/step)")
for k, v in cat.most_common():
    print(f"  {k:24s} {v / N * 1e3:8.1f} ms/step")
print("\ntop ops:")
for k, v in byname.most_common(18):
    print(f"  {v / N * 1e3:8.2f} ms/step  {k[:110]}")
