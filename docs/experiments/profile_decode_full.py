"""Full decode-program op table with execution counts.

Counts disambiguate loop nesting: with n_steps traced steps, a top-level op
shows ~n_steps executions, a while-body op ~6*n_steps. Writes the full sorted
table to /tmp/decode_ops.txt.
"""
import collections, os, sys
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model
from racformer_tpu.eval.streaming import StreamingEvaluator
from racformer_tpu.model import preprocess_images
from racformer_tpu.tools.profile_tpu import _latest_xplane

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
f0 = frame(0)
feats = ev._encode(
    ev.variables, b(f0["imgs"]), b(f0["radar_points"]), b(f0["radar_mask"]),
    b(f0["radar_depth"]), b(f0["radar_rcs"]), b(f0["img2lidar"]))
l2i = b(f0["lidar2img"])

def decode_only(i):
    ts = jnp.float32(0.5 * i)
    ev.cache, out = ev._update_decode(ev.variables, ev.cache, feats, l2i, ts)
    return out["scores"]

jax.block_until_ready(decode_only(0))
N = 6
outdir = "/tmp/r3_dec_full"
with jax.profiler.trace(outdir):
    out = None
    for i in range(N):
        out = decode_only(i)
    jax.block_until_ready(out)

from tensorflow.tsl.profiler.protobuf import xplane_pb2
path = _latest_xplane(outdir)
xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())
dur = collections.Counter(); cnt = collections.Counter()
for plane in xs.planes:
    if "/device:TPU" not in plane.name and "TensorCore" not in plane.name:
        continue
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for e in line.events:
            name = meta.get(e.metadata_id, "")
            if name:
                dur[name] += e.duration_ps / 1e12
                cnt[name] += 1

rows = sorted(dur.items(), key=lambda kv: -kv[1])
total = sum(dur.values())
inloop = sum(v for k, v in dur.items() if cnt[k] >= 3 * N and "while" not in k)
top = sum(v for k, v in dur.items() if cnt[k] < 3 * N)
with open("/tmp/decode_ops.txt", "w") as f:
    f.write(f"total {total/N*1e3:.1f} ms/step; inloop(cnt>={3*N}) "
            f"{inloop/N*1e3:.1f}; top-level {top/N*1e3:.1f}\n")
    for k, v in rows:
        f.write(f"{v/N*1e3:9.3f} ms/step  x{cnt[k]:4d}  {k[:240]}\n")
print(open("/tmp/decode_ops.txt").read()[:4000])
