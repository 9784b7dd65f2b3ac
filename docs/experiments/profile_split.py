"""Split streaming-step profile: encode program vs decode program.

Round-3 finding driver: the whole-step trace shows ~953 ms/step of device
time but the decoder while-loop accounts for only ~355 ms — this script
attributes the rest by tracing the two jitted programs separately.

Usage: python docs/experiments/profile_split.py
"""
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model
from racformer_tpu.eval.streaming import StreamingEvaluator
from racformer_tpu.model import preprocess_images
from racformer_tpu.tools.profile_tpu import trace_and_summarize

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


T = model.num_frames
for t in range(3):
    out = ev.step(frame(t), blocking=False)
jax.block_until_ready(out["scores"])

b = lambda x: jnp.asarray(x)[None]


def encode_only(i):
    f = frame(i % T)
    feats = ev._encode(
        ev.variables, b(f["imgs"]), b(f["radar_points"]), b(f["radar_mask"]),
        b(f["radar_depth"]), b(f["radar_rcs"]), b(f["img2lidar"]))
    return feats[1]


print("===== ENCODE program =====")
encode_only(0)  # ensure compiled
jax.block_until_ready(encode_only(1))
trace_and_summarize(encode_only, n_steps=6, outdir="/tmp/r3_enc", top=20)

# fixed feats; decode repeatedly (cache donated, so re-feed each time)
f0 = frame(0)
feats = ev._encode(
    ev.variables, b(f0["imgs"]), b(f0["radar_points"]), b(f0["radar_mask"]),
    b(f0["radar_depth"]), b(f0["radar_rcs"]), b(f0["img2lidar"]))
l2i = b(f0["lidar2img"])


def decode_only(i):
    ts = jnp.float32(0.5 * i)
    ev.cache, out = ev._update_decode(ev.variables, ev.cache, feats, l2i, ts)
    return out["scores"]


print("===== DECODE program =====")
jax.block_until_ready(decode_only(0))
trace_and_summarize(decode_only, n_steps=6, outdir="/tmp/r3_dec", top=20)
