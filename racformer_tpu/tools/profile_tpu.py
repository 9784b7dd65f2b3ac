"""TPU per-op profiling helper (the framework's xprof-equivalent).

Capability match for the reference's profiling story (torch.profiler / nsys
usage implied by `models/csrc` kernel tuning); TPU-native version: capture a
`jax.profiler.trace`, parse the xplane protobuf, and aggregate device-plane
op durations by category — the workflow used for every perf decision in
docs/ROUND1.md and the round-2 kernels.

Library use:
    from racformer_tpu.tools.profile_tpu import trace_and_summarize
    summary = trace_and_summarize(step_fn, n_steps=4)

CLI (profiles the flagship streaming decode on the attached chip):
    python -m racformer_tpu.tools.profile_tpu [outdir] [n_steps]
"""

from __future__ import annotations

import collections
import os
import re
from typing import Callable, Dict, Optional

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

_CATEGORIES = (
    # collectives first: 'all-gather'/'reduce-scatter' must not land in the
    # compute gather/scatter buckets on multichip traces
    ("collectives", r"^(all-gather|all-reduce|reduce-scatter|"
                    r"collective-permute|all-to-all)"),
    ("gather", r"^gather"),
    ("scatter", r"^scatter"),
    ("custom-call(pallas)", r"^custom[-_]call|^tpu_custom_call"),
    ("matmul/conv", r"^(convolution|dot|einsum)"),
    ("fusion(elementwise)", r"^fusion"),
    ("copy/layout", r"^(copy|transpose|reshape|bitcast)"),
    ("reduce/sort", r"^(reduce|sort|top-?k)"),
    ("while(control)", r"^while"),
)


def _latest_xplane(outdir: str) -> Optional[str]:
    path = None
    for root, _, files in os.walk(outdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                p = os.path.join(root, f)
                if path is None or os.path.getmtime(p) > os.path.getmtime(path):
                    path = p
    return path


def parse_xplane(outdir: str) -> Dict[str, float]:
    """Aggregate device-plane XLA-op durations (seconds) by op name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = _latest_xplane(outdir)
    if path is None:
        raise FileNotFoundError(f"no .xplane.pb under {outdir}")
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    byname: Dict[str, float] = collections.Counter()
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
                    byname[name] += e.duration_ps / 1e12
    return dict(byname)


def _opcode(name: str) -> str:
    """The HLO opcode of an 'XLA Ops' event name like
    '%fusion.1 = bf16[...] fusion(...)' — match on THIS, not the full
    string (operand text routinely contains other ops' names)."""
    m = re.search(r"=\s*\S+\s+([\w-]+)\(", name)
    if m:
        return m.group(1)
    m = re.match(r"%?([A-Za-z][\w-]*)", name)
    return m.group(1) if m else name


def categorize(byname: Dict[str, float]) -> Dict[str, float]:
    cat: Dict[str, float] = collections.Counter()
    for name, dur in byname.items():
        n = _opcode(name).lower()
        for label, pat in _CATEGORIES:
            if re.search(pat, n):
                cat[label] += dur
                break
        else:
            cat["other"] += dur
    return dict(cat)


def trace_and_summarize(
    step: Callable[[int], object],
    n_steps: int = 4,
    outdir: str = "/tmp/racformer_trace",
    top: int = 15,
    printer: Callable[[str], None] = print,
) -> Dict[str, Dict[str, float]]:
    """Run `step(i)` n_steps times under a profiler trace and summarize.

    `step` should enqueue device work without blocking; the final result is
    synchronized after the loop. NOTE: the while(control) category counts a
    loop op's whole body, so categories overlap and do not sum to the step
    wall time — use them for ranking, not accounting.
    """
    import jax

    out = None
    with jax.profiler.trace(outdir):
        for i in range(n_steps):
            out = step(i)
        jax.block_until_ready(out)
    byname = parse_xplane(outdir)
    cat = categorize(byname)
    total = sum(byname.values())
    printer(f"device op time: {total / n_steps * 1e3:.1f} ms/step "
            f"over {n_steps} steps (categories overlap; while() includes "
            f"its body)")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        printer(f"  {k:24s} {v / n_steps * 1e3:8.1f} ms/step")
    printer("top ops:")
    for k, v in sorted(byname.items(), key=lambda kv: -kv[1])[:top]:
        printer(f"  {v / n_steps * 1e3:8.2f} ms/step  {k[:100]}")
    return {"by_op": byname, "by_category": cat}


def _main():
    import sys

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    import jax.numpy as jnp

    sys.path.insert(0, os.getcwd())
    import __graft_entry__ as ge
    from racformer_tpu.eval.streaming import StreamingEvaluator
    from racformer_tpu.model import preprocess_images

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/racformer_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    model = ge._flagship_model(train=False)
    batch = ge._example_batch(model)
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
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t], timestamp=0.5 * t,
        )

    T = model.num_frames
    for t in range(3):  # compile + warm the temporal cache
        out = ev.step(frame(t % T), blocking=False)
    jax.block_until_ready(out["scores"])

    trace_and_summarize(
        lambda i: ev.step(frame((3 + i) % T), blocking=False)["scores"],
        n_steps=n_steps, outdir=outdir)


if __name__ == "__main__":
    _main()
