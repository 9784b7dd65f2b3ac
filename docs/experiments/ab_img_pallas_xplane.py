"""Same-process A/B of XLA vs Pallas IMAGE patch gather, device-plane totals.

Same protocol as ab_bev_pallas_xplane.py (wall slopes on the shared tunnel
are useless; xplane device-op durations are stable). BEV gathers stay at
their default (Pallas on TPU); only the image MSMV sites toggle via
RACFORMER_IMG_PALLAS. The image case differs from BEV in two ways: the
per-slab operand is ~19 MB (vs 8.9) and the per-slab point count is 10800
(vs 72960), so the VMEM-streaming amortization is ~7x worse per byte.
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
    os.environ["RACFORMER_IMG_PALLAS"] = flag
    ev = StreamingEvaluator(model, variables)
    for t in range(model.num_frames):
        out = ev.step(frame(t), blocking=False)
    float(jax.device_get(out["scores"][0, 0]))
    return ev

def device_summary(ev, tag, N=6):
    outdir = f"/tmp/ab_img_xplane_{tag}"
    with jax.profiler.trace(outdir):
        out = None
        for i in range(N):
            out = ev.step(frame(i % model.num_frames), blocking=False)
        jax.block_until_ready(out["scores"])
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(_latest_xplane(outdir), "rb") as f:
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
    wh = sum(v for k, v in dur.items() if " while(" in k)
    top = sum(v for k, v in dur.items()
              if cnt[k] < 3 * N and " while(" not in k)
    print(f"{tag}: while {wh/N*1e3:7.1f} ms/step  top-level "
          f"{top/N*1e3:7.1f} ms/step  (step ~= while + top)", flush=True)
    return wh / N, top / N

ev_xla = build("0")
ev_pal = build("1")
for r in range(2):
    device_summary(ev_xla, f"xla{r}")
    device_summary(ev_pal, f"pal{r}")
