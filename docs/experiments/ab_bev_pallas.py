"""Same-process A/B: streaming decode with XLA vs Pallas BEV gather.

The dev tunnel shows up to ~2.5x run-to-run interference between processes,
so cross-process bench comparisons are meaningless. This builds TWO
streaming evaluators in one process (env flag flipped between traces) and
alternates slope measurements A,B,A,B,... so both variants see the same
machine state.

Usage: python ab_bev_pallas.py [n_reps]
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


def frame(t):
    return dict(
        imgs=batch["imgs"][0, t], radar_points=batch["radar_points"][0, t],
        radar_mask=batch["radar_mask"][0, t],
        radar_depth=batch["radar_depth"][0, t],
        radar_rcs=batch["radar_rcs"][0, t],
        lidar2img=batch["lidar2img"][0, t],
        img2lidar=batch["img2lidar"][0, t], timestamp=0.5 * t,
    )


def build(flag):
    os.environ["RACFORMER_BEV_PALLAS"] = flag
    ev = StreamingEvaluator(model, variables)
    for t in range(model.num_frames):  # compile + warm
        out = ev.step(frame(t), blocking=False)
    float(jax.device_get(out["scores"][0, 0]))
    return ev


def slope(ev, n=6):
    def run(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = ev.step(frame(i % model.num_frames), blocking=False)
        float(jax.device_get(out["scores"][0, 0]))
        return time.perf_counter() - t0

    return max((run(2 * n) - run(n)) / n, 1e-6)


ev_xla = build("0")
ev_pal = build("1")

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
for r in range(reps):
    a = slope(ev_xla)
    b = slope(ev_pal)
    print(f"rep {r}: xla {a*1e3:7.1f} ms/frame   pallas-bev {b*1e3:7.1f} "
          f"ms/frame   ratio {a/b:.3f}", flush=True)
