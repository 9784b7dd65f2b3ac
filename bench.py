"""Official benchmark: streaming per-frame RaCFormer inference on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the streaming eval path (frame-cache, the reference's
`simple_test_online` FPS protocol — `models/racformer.py:476` "only used when
measuring FPS"): per new sample, one 6-camera frame of trunk compute + the
8-frame windowed decoder.

Two numbers (VERDICT r2 item 5 — e2e honesty):
  * value / "fps_device_resident": frame inputs pre-staged on device. This is
    the chip-throughput metric comparable to the reference's protocol (a
    PyTorch A100 run feeds host RAM -> GPU over local PCIe, ~1 ms for this
    payload; the axon dev tunnel instead moves bytes at ~45 MB/s, which is a
    dev-environment artifact, not a property of the chip or the framework).
  * "fps_e2e_tunnel": per-step host inputs in their minimal wire form
    (uint8 images + column radar maps, ~1.4 MB/frame) uploaded through this
    tunnel inside the timed loop.

Measurement method: the per-step cost is the SLOPE of total wall time between
an N-step and a 2N-step chained run, each terminated by a host fetch of a
scalar from the final output (the only reliable completion barrier on the
axon dev tunnel — `block_until_ready` under-reports there, and each host
fetch carries a large fixed latency that the slope cancels out). Median of 3
(the shared chip shows up to ~2.5x tenant interference).

Baseline: the reference repo publishes NO throughput numbers (BASELINE.md) and
the RaCFormer paper reports none either. A100_REFERENCE_FPS = 4.5 is an
ASSUMED reference point for RaCFormer-class R50 streaming detectors on 1xA100
fp16, bracketed by published numbers for the architecture family it extends:
SparseBEV r50 ~ 13-23 FPS (lighter: no radar branches, no LSS/depth net) and
BEVDepth-class LSS stacks ~ 3-5 FPS; RaCFormer runs both plus a radar pillar
branch and a ConvGRU temporal encoder. Sensitivity: at 3 FPS the device
number below is 1.7x; at 6 FPS it is 0.84x.
"""

from __future__ import annotations

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


A100_REFERENCE_FPS = 4.5  # assumed, see module docstring


def main():
    # The axon tunnel occasionally goes unresponsive, which makes the very
    # first backend touch (jax.devices()) hang indefinitely; fail loudly
    # instead so the caller records an error rather than stalling.
    import threading
    import os as _os

    watchdog = threading.Timer(300.0, lambda: (
        print(json.dumps({"metric": "streaming_eval_fps_per_chip",
                          "value": 0.0, "unit": "ERROR",
                          "vs_baseline": 0.0,
                          "error": "backend init (jax.devices) hung >300s — "
                                   "TPU tunnel unresponsive"}), flush=True),
        _os._exit(3)))
    watchdog.daemon = True
    watchdog.start()
    n_dev = len(jax.devices())
    watchdog.cancel()
    assert n_dev >= 1

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
    keys = ("imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar")

    def host_frame(t):
        """Minimal wire form: uint8 images, [N, W] column radar maps."""
        f = {k: batch[k][0, t] for k in keys}
        f["imgs"] = np.clip(f["imgs"], 0, 255).astype(np.uint8)
        f["radar_depth"] = f["radar_depth"][:, 0, :]
        f["radar_rcs"] = f["radar_rcs"][:, 0, :]
        f["timestamp"] = 0.5 * t
        return f

    dev_frames = [
        {k: jax.device_put(v) for k, v in host_frame(t).items()
         if k != "timestamp"} for t in range(T)
    ]
    for f in dev_frames:
        jax.block_until_ready(f["imgs"])

    def dev_frame(t):
        f = dict(dev_frames[t])
        f["timestamp"] = 0.5 * t
        return f

    def measure(frame_fn):
        ev = StreamingEvaluator(model, variables)

        def run(n):
            t0 = time.perf_counter()
            out = None
            for i in range(n):
                out = ev.step(frame_fn(i % T), blocking=False)
            # scalar host fetch = true completion barrier for the chain
            float(jax.device_get(out["scores"][0, 0]))
            return time.perf_counter() - t0

        run(T)  # warm up: fill window + compile + one fetch
        n = 8
        slopes = sorted(
            max((run(2 * n) - run(n)) / n, 1e-6) for _ in range(3))
        return 1.0 / slopes[1]

    def measure_loader():
        """Disk JPEGs -> native decode + column rasterize in worker threads
        (data/prefetch.py) -> streaming step: the FULL host pipeline inside
        the timed loop (VERDICT r2 item 5's loader-driven variant)."""
        import io
        import os
        import tempfile

        from PIL import Image

        from racformer_tpu.data import native
        from racformer_tpu.data.depth_maps import (project_to_image,
                                                   radar_to_depth_rcs_maps)
        from racformer_tpu.data.prefetch import PrefetchLoader

        N = batch["imgs"].shape[2]
        H, W = model.image_hw
        tmpdir = tempfile.mkdtemp(prefix="bench_jpegs_")
        paths = {}
        for t in range(T):
            for n in range(N):
                p = os.path.join(tmpdir, f"f{t}_c{n}.jpg")
                Image.fromarray(np.clip(batch["imgs"][0, t, n], 0, 255)
                                .astype(np.uint8)).save(p, quality=90)
                paths[(t, n)] = p
        l2i_all = batch["lidar2img"][0]
        pts_all = batch["radar_points"][0]
        mask_all = np.asarray(batch["radar_mask"][0], bool)

        class DiskFrames:
            def __getitem__(self, i):
                t = i % T
                imgs = []
                for n in range(N):
                    with open(paths[(t, n)], "rb") as f:
                        data = f.read()
                    img = (native.decode_jpeg(data, max_hw=(H, W))
                           if native.available() else None)
                    if img is None:
                        img = np.asarray(
                            Image.open(io.BytesIO(data)).convert("RGB"))
                    imgs.append(img)
                pts = pts_all[t][mask_all[t]]
                dep, rcs = [], []
                for n in range(N):
                    if native.available():
                        u, v, d = project_to_image(pts[:, :3], l2i_all[t, n])
                        uvdr = np.stack([u, v, d, pts[:, 3]], 1)
                        dm, rm = native.radar_columns(uvdr, (1, W))
                    else:
                        dm, rm = radar_to_depth_rcs_maps(
                            pts, l2i_all[t, n], (1, W))
                    dep.append(dm[0])
                    rcs.append(rm[0])
                return dict(
                    imgs=np.stack(imgs), radar_points=pts_all[t],
                    radar_mask=mask_all[t], radar_depth=np.stack(dep),
                    radar_rcs=np.stack(rcs), lidar2img=l2i_all[t],
                    img2lidar=np.asarray(batch["img2lidar"][0, t]),
                )

        ev = StreamingEvaluator(model, variables)
        n = 8
        total = T + 3 * (2 * n + n)
        loader = PrefetchLoader(DiskFrames(), lambda s: [s], total,
                                num_workers=2, prefetch=3)
        consumed = [0]

        def run(k):
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                s = consumed[0]
                b = loader.get(s)
                consumed[0] += 1
                f = {kk: v[0] for kk, v in b.items()}
                f["timestamp"] = 0.5 * (s % T)
                out = ev.step(f, blocking=False)
            float(jax.device_get(out["scores"][0, 0]))
            return time.perf_counter() - t0

        run(T)
        slopes = sorted(
            max((run(2 * n) - run(n)) / n, 1e-6) for _ in range(3))
        loader.close()
        return 1.0 / slopes[1]

    fps_dev = measure(dev_frame)
    fps_e2e = measure(host_frame)
    fps_loader = measure_loader()

    # --- chip-utilization accounting (VERDICT r3 item 5) -----------------
    # FLOPs/bytes per frame from XLA's cost analysis of the COMPILED fused
    # streaming step (the exact op set the chip runs, so matmuls/convs are
    # counted analytically and the sampling gathers show up as bytes moved).
    # Peak numbers for TPU v5e (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
    V5E_PEAK_BF16_FLOPS = 197e12
    V5E_HBM_BW = 819e9
    mfu = hbm_util = flops_per_frame = bytes_per_frame = None
    try:
        ev = StreamingEvaluator(model, variables)
        ev.step(dev_frame(0), blocking=False)  # bootstrap the window cache
        b = lambda x: jnp.asarray(x)[None]
        f = dev_frame(1)
        ca = ev._fused_step.lower(
            variables, ev.cache, b(f["imgs"]), b(f["radar_points"]),
            b(f["radar_mask"]), b(f["radar_depth"]), b(f["radar_rcs"]),
            b(f["lidar2img"]), b(f["img2lidar"]),
            jnp.float32(f["timestamp"]),
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_frame = float(ca.get("flops", 0.0))
        bytes_per_frame = float(ca.get("bytes accessed", 0.0))
        if flops_per_frame > 0:
            mfu = flops_per_frame * fps_dev / V5E_PEAK_BF16_FLOPS
        if bytes_per_frame > 0:
            hbm_util = bytes_per_frame * fps_dev / V5E_HBM_BW
    except Exception as e:  # cost analysis is backend-dependent
        print(f"# cost_analysis unavailable: {e!r}", flush=True)

    print(
        json.dumps(
            {
                "metric": "streaming_eval_fps_per_chip",
                "value": round(fps_dev, 3),
                "unit": ("frames/s (6cam streaming, 8-frame window, v5e, "
                         "slope-measured, device-resident inputs)"),
                "vs_baseline": round(fps_dev / A100_REFERENCE_FPS, 3),
                # the documented 3-6 FPS bracket for the assumed baseline
                # (see module docstring): low = ratio if the true A100
                # number is 6 FPS, high = ratio if it is 3 FPS
                "vs_baseline_low": round(fps_dev / 6.0, 3),
                "vs_baseline_high": round(fps_dev / 3.0, 3),
                "mfu": round(mfu, 4) if mfu is not None else None,
                "hbm_bw_util": (round(hbm_util, 4)
                                if hbm_util is not None else None),
                "flops_per_frame": flops_per_frame,
                "bytes_per_frame": bytes_per_frame,
                "util_note": ("mfu/hbm_bw_util = XLA cost-analysis "
                              "flops & bytes of the compiled fused "
                              "streaming step x measured FPS over TPU v5e "
                              "peaks (197 TFLOP/s bf16, 819 GB/s)"),
                "fps_e2e_tunnel": round(fps_e2e, 3),
                "fps_e2e_loader": round(fps_loader, 3),
                "e2e_note": ("e2e_tunnel: uint8 images + column radar maps "
                             "uploaded per-step through the ~45 MB/s axon "
                             "dev tunnel (a production host moves this in "
                             "~1 ms); e2e_loader: disk JPEGs -> native "
                             "libjpeg decode + column radar rasterization "
                             "in 2 prefetch worker threads -> streaming "
                             "step, the full host pipeline in the timed "
                             "loop"),
                "baseline_note": ("A100_REFERENCE_FPS=4.5 is assumed (no "
                                  "published figure); see bench.py docstring "
                                  "for the bracket"),
            }
        )
    )


if __name__ == "__main__":
    main()
