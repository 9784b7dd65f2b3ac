"""How much of the 2.34 s train step is the in-graph Hungarian assigner?

The xplane 'while' category (2.23 s) lumps the decoder backward scan, the
Jonker-Volgenant assigner (train/matching.py — 6 layers x B solves of a
[Q=900, G] rectangular problem per step), and the LSS pools. This isolates
the assigner at flagship shapes with the slope protocol so the BASELINE.md
breakdown can attribute it separately.

Usage: python docs/experiments/assigner_cost.py [Q] [G] [L] [B]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np

from racformer_tpu.train.losses import CODE_WEIGHTS
from racformer_tpu.train.matching import hungarian_assign, match_cost


def main(Q=900, G=64, L=6, B=1):
    rng = np.random.default_rng(0)
    cls_scores = jnp.asarray(rng.normal(size=(L, B, Q, 10)), jnp.float32)
    bbox_preds = jnp.asarray(rng.normal(size=(L, B, Q, 10)), jnp.float32)
    gt_bboxes = jnp.asarray(rng.uniform(-40, 40, size=(B, G, 9)), jnp.float32)
    gt_labels = jnp.asarray(rng.integers(0, 10, size=(B, G)), jnp.int32)
    gt_mask = jnp.asarray(rng.uniform(size=(B, G)) < 0.5)

    @jax.jit
    def assign(cs, bp, it):
        # fold the iteration index into the scores so the chain has a real
        # data dependency (no CSE across steps)
        cs = cs + (it * 1e-6).astype(cs.dtype)
        cost = jax.vmap(jax.vmap(
            lambda c, b, gb, gl, gm: match_cost(c, b, gb, gl, gm, CODE_WEIGHTS),
            in_axes=(0, 0, 0, 0, 0)), in_axes=(0, 0, None, None, None),
        )(cs, bp, gt_bboxes, gt_labels, gt_mask)
        return hungarian_assign(cost)

    def run(n):
        t0 = time.perf_counter()
        out = None
        carry = jnp.zeros(())
        for i in range(n):
            out = assign(cls_scores, bbox_preds, carry)
            carry = out.astype(jnp.float32).sum() * 0.0 + i
        _ = int(jax.device_get(out[0, 0, 0]))
        return time.perf_counter() - t0

    run(2)  # compile + warm
    n = 8
    slopes = sorted(max((run(2 * n) - run(n)) / n, 1e-9) for _ in range(3))
    print(f"assigner (L={L}, B={B}, Q={Q}, G={G}): "
          f"{1e3 * slopes[1]:.1f} ms/step (median-of-3 slope)", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
