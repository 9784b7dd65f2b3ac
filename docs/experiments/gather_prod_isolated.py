"""Round-5: isolate the PRODUCTION gather kernel at exact production shapes.

The round-5 decode profile (profile_decode_full.py) shows the 6 in-loop
gather custom-calls running at ~42 ns/patch (111 ms / 2.53 M patches per
step), while the round-2 microbench measured 7.4 ns/patch for the same
compute shape — a 6x gap. This measures `ops.gather_kernel.gather_patch_rows`
standalone at the exact production operand shapes to decide whether the gap
is kernel-internal (GROUP=128 staging, scratch port conflicts) or
program-level (operand copies, scheduling).

Shapes (from the round-5 decode profile, flagship streaming step):
  BEV site:  packed [8,15,38,128]  val [8,524,144,128]   (72960 pts/slab)
  IMG L/4:   packed [32,3,29,128]  val [32,402,192,128]  (10800 pts/slab)
  IMG L/32:  packed [32,3,29,128]  val [32, 66, 40,128]

Usage: python docs/experiments/gather_prod_isolated.py
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from racformer_tpu.ops.gather_kernel import (  # noqa: E402
    GROUP, _chunk_layout, gather_patch_rows)

CASES = {
    # name: (S, K, R, Wpad, true_W)
    "bev": (8, 72000, 524, 144, 128),
    "img_l0": (32, 10800, 402, 192, 176),
    "img_l1": (32, 10800, 210, 104, 88),
    "img_l3": (32, 10800, 66, 40, 22),
}


def build(name, rng):
    S, K, R, Wpad, W = CASES[name]
    chunk, nch, kpad = _chunk_layout(K)
    row = rng.integers(0, R, (S, kpad), dtype=np.int32)
    x0 = rng.integers(0, W, (S, kpad), dtype=np.int32)
    xb = (x0 // 8) * 8
    o = (x0 - xb).astype(np.float32) + rng.uniform(0, 1, (S, kpad)).astype(
        np.float32)
    packed = ((row << 16) | xb).reshape(S, nch, chunk // GROUP, GROUP)
    of = o.reshape(S, nch, chunk // GROUP, GROUP)
    val = rng.standard_normal((S, R, Wpad, 128)).astype(np.float32)
    return (jnp.asarray(packed), jnp.asarray(of),
            jnp.asarray(val, jnp.bfloat16), chunk, S * K)


def slope(fn, args, n1=8, n2=24):
    def run(n):
        t0 = time.perf_counter()
        out = None
        v = args[2]
        for _ in range(n):
            out = fn(args[0], args[1], v, args[3], False)
            # chain: make the next call depend on the last output
            v = v + (out[0, 0, 0, 0] * jnp.asarray(0, v.dtype))
        float(jax.device_get(out[0, 0, 0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    for name in CASES:
        args = build(name, rng)
        per = slope(gather_patch_rows, args)
        npts = args[4]
        print(f"{name}: {per * 1e3:.3f} ms/call  "
              f"{per / npts * 1e9:.1f} ns/patch  ({npts} pts)")


if __name__ == "__main__":
    main()
