"""Official benchmark: end-to-end RaCFormer inference throughput on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline context: the reference repo records no throughput numbers
(BASELINE.md); the working reference point is SparseBEV/RaCFormer-class
detectors at ~4-5 FPS on an A100 with PyTorch fp16 for the R50 8-frame
streaming configuration. vs_baseline is computed against 4.5 FPS.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_REFERENCE_FPS = 4.5


def main():
    from __graft_entry__ import _example_batch, _flagship_model
    from racformer_tpu.model import preprocess_images

    model = _flagship_model(train=False)
    batch = _example_batch(model)
    args = [
        jnp.asarray(batch[k])
        for k in (
            "imgs", "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff",
        )
    ]
    variables = model.init(jax.random.PRNGKey(0), preprocess_images(args[0]), *args[1:])

    @jax.jit
    def fwd(imgs, *rest):
        return model.apply(variables, preprocess_images(imgs), *rest)[
            "all_cls_scores"
        ]

    out = fwd(*args)
    out.block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": "offline_eval_fps_per_chip",
                "value": round(fps, 3),
                "unit": "samples/s (6cam x 8frame full forward, v5e)",
                "vs_baseline": round(fps / A100_REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
