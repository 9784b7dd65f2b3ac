"""Official benchmark: streaming per-frame RaCFormer inference on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Measures the streaming eval path (frame-cache, the reference's
`simple_test_online` FPS protocol — `models/racformer.py:476` "only used when
measuring FPS"): per new sample, one 6-camera frame of trunk compute + the
8-frame windowed decoder.

Measurement method: the per-step cost is the SLOPE of total wall time between
an N-step and a 2N-step chained run, each terminated by a host fetch of a
scalar from the final output (the only reliable completion barrier on the
axon dev tunnel — `block_until_ready` under-reports there, and each host
fetch carries a large fixed latency that the slope cancels out).

Baseline context: the reference repo records no throughput numbers
(BASELINE.md); the working reference point is ~4.5 FPS for RaCFormer-class
R50 streaming inference on 1xA100 PyTorch fp16.
"""

from __future__ import annotations

import json
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp


A100_REFERENCE_FPS = 4.5


def main():
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
            imgs=batch["imgs"][0, t],
            radar_points=batch["radar_points"][0, t],
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t],
            timestamp=0.5 * t,
        )

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = ev.step(frame(i % model.num_frames), blocking=False)
        # scalar host fetch = true completion barrier for the whole chain
        float(jax.device_get(out["scores"][0, 0]))
        return time.perf_counter() - t0

    # warm up: fill window + compile both stages + one fetch
    run(model.num_frames)

    # the shared dev tunnel shows up to ~2.5x run-to-run interference from
    # other tenants (and occasional low-side slope glitches), so report the
    # MEDIAN of 3 slope measurements
    n = 8
    slopes = sorted(
        max((run(2 * n) - run(n)) / n, 1e-6) for _ in range(3)
    )
    per_step = slopes[1]

    fps = 1.0 / per_step
    print(
        json.dumps(
            {
                "metric": "streaming_eval_fps_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s (6cam streaming, 8-frame window, v5e, slope-measured)",
                "vs_baseline": round(fps / A100_REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
