"""Split the streaming step's WALL cost: device compute vs host->device
transfer vs dispatch.

Round-3 driver: the xplane device profile sums ~280 ms/step (encode 45 +
decode ~235) but the slope-measured wall is ~525 ms/step (1.9 FPS) — nearly
half the step is NOT device compute. Candidates: per-step jnp.asarray uploads
(imgs f32 5.2 MB + radar_depth 4.3 MB + radar_rcs 4.3 MB ~= 14 MB/frame over
the tunnel) and the 2-program dispatch.

Variants (same process, alternating slopes):
  host:   step(frame) with numpy inputs (what bench.py does today)
  dev:    step(frame) with all inputs pre-put on device (zero transfer)
  u8:     numpy inputs but imgs as uint8 (4x fewer image bytes)

Usage: python docs/experiments/overhead_split.py [n_reps]
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

T = model.num_frames
KEYS = ("imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
        "lidar2img", "img2lidar")


def frame_host(t, u8=False):
    f = {k: batch[k][0, t] for k in KEYS}
    if u8:
        f["imgs"] = np.clip(f["imgs"], 0, 255).astype(np.uint8)
    f["timestamp"] = 0.5 * t
    return f


dev_frames = None


def frame_dev(t):
    f = dict(dev_frames[t])
    f["timestamp"] = 0.5 * t
    return f


def make_run(ev, frame_fn):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = ev.step(frame_fn(i % T), blocking=False)
        float(jax.device_get(out["scores"][0, 0]))
        return time.perf_counter() - t0
    return run


variants = {}
ev_host = StreamingEvaluator(model, variables)
variants["host"] = make_run(ev_host, frame_host)

dev_frames = [
    {k: jax.device_put(batch[k][0, t]) for k in KEYS} for t in range(T)
]
for f in dev_frames:
    jax.block_until_ready(f["imgs"])
ev_dev = StreamingEvaluator(model, variables)
variants["dev"] = make_run(ev_dev, frame_dev)

ev_u8 = StreamingEvaluator(model, variables)
variants["u8"] = make_run(ev_u8, lambda t: frame_host(t, u8=True))

# warm all variants (compile once; u8 triggers a separate encode trace)
for name, run in variants.items():
    run(T)
    print(f"warmed {name}", flush=True)

n = 6
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
for r in range(reps):
    for name, run in variants.items():
        slope = (run(2 * n) - run(n)) / n
        print(f"{name}{r}: {slope * 1e3:8.1f} ms/step  ({1.0 / slope:.2f} FPS)",
              flush=True)
