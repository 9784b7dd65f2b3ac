"""Measure XLA gather cost vs slice shape: does pre-fusing the 2x2 patch
neighborhood into channels (fewer gathered rows per patch) beat the current
(1,2,2,C) patch gather?

Variants on deform-attn flagship shapes (SM=32 slab-heads, 576K patches):
  a) baseline: gather slice (1,2,2,64) from [SM,Hp,Wp,64]   (2 rows/patch)
  b) y-fused:  gather slice (1,1,2,128) from [SM,Hp,Wp,128] (1 row, 2 cols)
  c) xy-fused: gather slice (1,1,1,256) from [SM,Hp,Wp,256] (1 row, 1 col)
Each variant computes the identical bilinear result; (b)/(c) maps are built
in-graph by shift-concat (cost included in the timing).
"""
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

SM, H, W, C, PAD = 32, 128, 128, 64, 2
Hp, Wp = H + 2 * PAD, W + 2 * PAD
K = 18000

rng = np.random.default_rng(0)
val = jnp.asarray(rng.normal(size=(SM, Hp, Wp, C)), jnp.bfloat16)
xf = rng.uniform(0, W - 1, size=(SM, K)).astype(np.float32)
yf = rng.uniform(0, H - 1, size=(SM, K)).astype(np.float32)
x0 = jnp.asarray(np.floor(xf).astype(np.int32) + PAD)
y0 = jnp.asarray(np.floor(yf).astype(np.int32) + PAD)
wx = jnp.asarray((xf - np.floor(xf))[..., None], jnp.bfloat16)
wy = jnp.asarray((yf - np.floor(yf))[..., None], jnp.bfloat16)
slab = jnp.broadcast_to(jnp.arange(SM, dtype=jnp.int32)[:, None], (SM, K))


def gather_nd(op, idx, slice_sizes, offset_dims, collapsed):
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=offset_dims, collapsed_slice_dims=collapsed,
        start_index_map=tuple(range(idx.shape[-1])))
    return jax.lax.gather(op, idx, dnums, slice_sizes=slice_sizes,
                          mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def variant_a(val):
    idx = jnp.stack([slab.reshape(-1), y0.reshape(-1), x0.reshape(-1)], -1)
    p = gather_nd(val, idx, (1, 2, 2, C), (1, 2, 3), (0,))
    p = p.reshape(SM, K, 2, 2, C)
    top = p[:, :, 0, 0] * (1 - wx) + p[:, :, 0, 1] * wx
    bot = p[:, :, 1, 0] * (1 - wx) + p[:, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def variant_b(val):
    v2 = jnp.concatenate([val[:, :-1], val[:, 1:]], axis=-1)  # [SM,Hp-1,Wp,2C]
    v2 = jax.lax.optimization_barrier(v2)
    idx = jnp.stack([slab.reshape(-1), y0.reshape(-1), x0.reshape(-1)], -1)
    p = gather_nd(v2, idx, (1, 1, 2, 2 * C), (1, 2, 3), (0,))
    p = p.reshape(SM, K, 2, 2 * C)
    v00, v10 = p[:, :, 0, :C], p[:, :, 0, C:]
    v01, v11 = p[:, :, 1, :C], p[:, :, 1, C:]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def variant_c(val):
    v2 = jnp.concatenate([val[:, :-1], val[:, 1:]], axis=-1)
    v4 = jnp.concatenate([v2[:, :, :-1], v2[:, :, 1:]], axis=-1)
    v4 = jax.lax.optimization_barrier(v4)  # [SM,Hp-1,Wp-1,4C]
    idx = jnp.stack([slab.reshape(-1), y0.reshape(-1), x0.reshape(-1)], -1)
    p = gather_nd(v4, idx, (1, 1, 1, 4 * C), (1, 2, 3), (0,))
    p = p.reshape(SM, K, 4, C)
    top = p[:, :, 0] * (1 - wx) + p[:, :, 2] * wx
    bot = p[:, :, 1] * (1 - wx) + p[:, :, 3] * wx
    return top * (1 - wy) + bot * wy


fns = {"a": variant_a, "b": variant_b, "c": variant_c}

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
    ra = np.asarray(variant_a(val), np.float32)
    for k, f in [("b", variant_b), ("c", variant_c)]:
        r = np.asarray(f(val), np.float32)
        np.testing.assert_allclose(r, ra, rtol=1e-2, atol=1e-2)
        print(f"variant {k} matches a")
else:
    def slope(call):
        def run(n):
            t0 = time.perf_counter()
            v = val
            out = None
            for _ in range(n):
                out = call(v)
                v = v + (out[0, 0, 0] * 0).astype(v.dtype)
            float(jax.device_get(out[0, 0, 0]))
            return time.perf_counter() - t0
        run(1)
        t1, t2 = run(4), run(8)
        return (t2 - t1) / 4

    for k, f in fns.items():
        per = slope(jax.jit(f))
        print(f"variant {k}: {per * 1e3:.2f} ms "
              f"({per / (SM * K) * 1e9:.1f} ns/patch)")
