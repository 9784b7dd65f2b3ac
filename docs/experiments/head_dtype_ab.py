"""A/B: decoder/head compute dtype fp32 vs bf16 on the real TPU chip.

The reference trains the whole model fp16 with loss-scale 512
(`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:282-308`); our
trunk runs bf16 but the head has been fp32 since round 1. The head is where
the streaming decode spends its non-gather time (AdaptiveMixing's generated
per-query mixing matmuls, SASA, FFN) and where the train step spends its
dominant 1.67 s backward-while — bf16 compute with fp32 master weights is
the TPU-native analogue of the reference recipe and halves both the MXU
cost and the epilogue bandwidth.

Protocol: slope method (wall time of N vs 2N chained steps, scalar fetch at
the end), same process for both arms. Run with the tunnel idle; one TPU
process at a time.

Usage: python docs/experiments/head_dtype_ab.py [streaming|train|both] [tiny]
(`tiny` runs toy shapes on CPU — an API smoke test, not a measurement)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def slope(fn, state0, n=6):
    """Per-step seconds via the N vs 2N chained-run slope."""

    def run(k):
        s = state0
        t0 = time.time()
        for i in range(k):
            s = fn(s, i)
        _ = float(jax.device_get(jax.tree_util.tree_leaves(s)[0].ravel()[0]))
        return time.time() - t0

    run(1)  # compile + warm
    t_n, t_2n = run(n), run(2 * n)
    return (t_2n - t_n) / n


TINY = False


def flagship(head_dtype, train):
    import __graft_entry__ as g

    return g._flagship_model(train=train, tiny=TINY, head_dtype=head_dtype)


def bench_train(head_dtype):
    import optax

    import __graft_entry__ as g
    from racformer_tpu.model import preprocess_images
    from racformer_tpu.train import TrainState, make_optimizer, make_train_step

    model = flagship(head_dtype, train=True)
    batch = g._example_batch(model, B=1, P=1200, with_gt=True)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        preprocess_images(batch["imgs"]),
        batch["radar_points"], batch["radar_mask"], batch["radar_depth"],
        batch["radar_rcs"], batch["lidar2img"], batch["img2lidar"],
        batch["time_diff"], gt_bboxes=batch["gt_bboxes"],
        gt_labels=batch["gt_labels"], gt_mask=batch["gt_mask"],
    )
    params = variables["params"]
    tx, _ = make_optimizer(params, total_steps=100)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(
        model, tx, depth_cfg=dict(num_bins=model.depth_bins, downsample=16)))
    rng = jax.random.PRNGKey(7)

    def one(s, i):
        s2, _ = step(s, batch, jax.random.fold_in(rng, i))
        return s2

    sec = slope(one, state, n=3)
    print(f"train step head_dtype={head_dtype}: {sec:.3f} s/step", flush=True)
    return sec


def bench_streaming(head_dtype):
    """Device-resident streaming FPS (bench.py's primary arm) per head dtype."""
    from racformer_tpu.eval.streaming import StreamingEvaluator
    from racformer_tpu.model import preprocess_images

    import __graft_entry__ as g

    model = flagship(head_dtype, train=False)
    batch = g._example_batch(model)
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
    dev_frames = []
    for t in range(T):
        f = {k: batch[k][0, t] for k in keys}
        f["imgs"] = np.clip(f["imgs"], 0, 255).astype(np.uint8)
        f["radar_depth"] = f["radar_depth"][:, 0, :]
        f["radar_rcs"] = f["radar_rcs"][:, 0, :]
        dev_frames.append({k: jax.device_put(v) for k, v in f.items()})
    jax.block_until_ready([f["imgs"] for f in dev_frames])

    ev = StreamingEvaluator(model, variables)

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            f = dict(dev_frames[i % T])
            f["timestamp"] = 0.5 * (i % T)
            out = ev.step(f, blocking=False)
        float(jax.device_get(out["scores"][0, 0]))
        return time.perf_counter() - t0

    run(T)
    n = 8
    slopes = sorted(max((run(2 * n) - run(n)) / n, 1e-6) for _ in range(3))
    fps = 1.0 / slopes[1]
    print(f"streaming head_dtype={head_dtype}: {fps:.2f} FPS "
          f"({1e3 * slopes[1]:.0f} ms/frame)", flush=True)
    return fps


if __name__ == "__main__":
    arm = sys.argv[1] if len(sys.argv) > 1 else "train"
    if "tiny" in sys.argv[2:]:
        TINY = True
        jax.config.update("jax_platforms", "cpu")
    if arm in ("train", "both"):
        r32 = bench_train(jnp.float32)
        r16 = bench_train(jnp.bfloat16)
        print(f"train speedup: {r32 / r16:.2f}x", flush=True)
    if arm in ("streaming", "both"):
        s32 = bench_streaming(jnp.float32)
        s16 = bench_streaming(jnp.bfloat16)
        print(f"streaming speedup: {s16 / s32:.2f}x", flush=True)
