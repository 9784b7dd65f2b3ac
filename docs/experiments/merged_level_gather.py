"""Merge the 4 per-level image-sampling gathers into ONE gather.

Per decode step the image sampler issues 4 gathers (one per FPN level) with
4 index-build chains, 4 lerp epilogues and a 4-term weighted accumulation
(~125 ms/step combined in the decode profile). Stacking the levels
vertically into one operand (common padded width, per-level row offsets)
turns that into one gather over 4x the points plus one weighted reduce.

Usage: python merged_level_gather.py

RESULT (v5e): merged LOSES — 25.0 ns/patch vs 21.2 for the 4 separate
gathers (the single big gather gains nothing per-slice and pays a larger
operand + wider index batch). Kept as a recorded dead end.
"""
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from racformer_tpu.ops.bilinear import PAD, bilinear_sample_views_nhwc

SN = 192                      # slabs x views after folding
LEVELS = [(64, 176), (32, 88), (16, 44), (8, 22)]   # (H, W) per level
C = 64
Q, P = 900, 12                # points per slab row (production: 43200/row/4?)
K = Q * P

rng = np.random.default_rng(0)
x_norm = rng.uniform(0, 1, (SN // 6, Q, P)).astype(np.float32)
y_norm = rng.uniform(0, 1, (SN // 6, Q, P)).astype(np.float32)
S = SN // 6
view = rng.integers(0, 6, (S, Q, P)).astype(np.int32)
slab = np.arange(S, dtype=np.int32)[:, None, None]
sv = slab * 6 + view
w_lvl = rng.uniform(0.1, 1, (S, Q, P, 4)).astype(np.float32)

# per-level fused maps (y-fused padded, bf16) as the cache stores them
fused = []
for H, W in LEVELS:
    R0, Wp = H + 2 * PAD - 1, W + 2 * PAD
    fused.append(jnp.asarray(
        rng.standard_normal((SN, R0, Wp, 2 * C)), jnp.bfloat16))

# merged operand: common width, rows stacked
WPM = max(f.shape[2] for f in fused)
row_off = np.cumsum([0] + [f.shape[1] for f in fused])[:4]
merged = jnp.concatenate([
    jnp.pad(f, ((0, 0), (0, 0), (0, WPM - f.shape[2]), (0, 0)))
    for f in fused
], axis=1)

xj, yj, svj = jnp.asarray(x_norm), jnp.asarray(y_norm), jnp.asarray(sv)
wj = jnp.asarray(w_lvl)


def separate(maps, xn, yn, v, w):
    acc = None
    for l, f in enumerate(maps):
        H, W = LEVELS[l]
        out = bilinear_sample_views_nhwc(
            f, v, xn * (W - 1), yn * (H - 1), pre_fused=True,
            blocked_views=True)
        term = out * w[..., l:l + 1].astype(out.dtype)
        acc = term if acc is None else acc + term
    return acc


def merged_call(m, xn, yn, v, w):
    # one gather over 4x points: fold the level into y via row offsets
    xs, ys, vs, ws = [], [], [], []
    for l, (H, W) in enumerate(LEVELS):
        # pre-clamp PER LEVEL so out-of-range points land in the level's own
        # zero border instead of bleeding into the neighboring row band; the
        # sampler's internal merged-extent clamp then never fires
        xs.append(jnp.clip(xn * (W - 1), -PAD, W))
        ys.append(jnp.clip(yn * (H - 1), -PAD, H) + row_off[l])
        vs.append(v)
        ws.append(w[..., l])
    xcat = jnp.stack(xs, axis=-1)
    ycat = jnp.stack(ys, axis=-1)
    vcat = jnp.stack(vs, axis=-1)
    wcat = jnp.stack(ws, axis=-1)
    out = bilinear_sample_views_nhwc(
        m, vcat, xcat, ycat, pre_fused=True, blocked_views=True)
    return jnp.sum(out * wcat[..., None].astype(out.dtype), axis=-2)


def slope(call, *args):
    def run(n):
        t0 = time.perf_counter()
        out = None
        v0 = args[0]
        for _ in range(n):
            out = call(v0, *args[1:])
            v0 = jax.tree_util.tree_map(
                lambda a: a + out.reshape(-1)[0].astype(a.dtype) *
                jnp.asarray(0, a.dtype), v0)
        float(jax.device_get(out.reshape(-1)[0].astype(jnp.float32)))
        return time.perf_counter() - t0
    run(1)
    t1, t2 = run(4), run(8)
    return (t2 - t1) / 4

c1 = jax.jit(lambda m, xn, yn, v, w: separate(m, xn, yn, v, w))
c2 = jax.jit(merged_call)
a = np.asarray(c1(fused, xj, yj, svj, wj), np.float32)
b = np.asarray(c2(merged, xj, yj, svj, wj), np.float32)
print("maxdiff:", np.abs(a - b).max(), "rel:",
      np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
p1 = slope(c1, fused, xj, yj, svj, wj)
p2 = slope(c2, merged, xj, yj, svj, wj)
n = S * K * 4
print(f"separate: {p1*1e3:.2f} ms ({p1/n*1e9:.1f} ns/patch)")
print(f"merged  : {p2*1e3:.2f} ms ({p2/n*1e9:.1f} ns/patch)")
