"""Prototype v3: grouped-by-8 variant of the fused bilinear gather.

Differences vs v2 (98 cyc/patch, 4.7x slower than XLA):
  - 8 points per loop iteration; results stacked and stored as one aligned
    [8, 64] sublane-group write (v2 stored one dynamic sublane per point:
    masked RMW).
  - select weights computed for the 8-group in one batched [8, 16, 128]
    vector expression instead of per point.
  - bf16 multiplies (matches prod XLA path which lerps in feat dtype),
    f32 fold at the end.

Also includes a load-only kernel (isolates loop+load floor) and an XLA
gather baseline on identical shapes.

Usage: python pallas_gather_v3.py [cpu]
"""
import functools
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SM = 32
H = W = 128
PAD = 2
Hp = H + 2 * PAD
Wp = H + 2 * PAD + 16
Wpp = Wp // 2
C = 64
K = 18000
CHUNK = 1000  # must be divisible by GROUP
GROUP = 8
NCH = K // CHUNK


def kernel(yx_ref, wxy_ref, val_ref, out_ref, *, mode):
    # yx_ref / wxy_ref: SMEM [1, 1, 2, CHUNK]; val: VMEM [1, Hp, Wpp, 128]
    # out_ref: VMEM [1, 1, CHUNK, C]
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 16, 128), 2)
    col = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 16, 128), 1)

    def body(g, _):
        base = g * GROUP
        wins = []
        xs = []
        wxs = []
        wys = []
        for j in range(GROUP):
            i = base + j
            y = yx_ref[0, 0, 0, i]
            x = yx_ref[0, 0, 1, i]
            xb = pl.multiple_of((x // 16) * 8, 8)
            win = val_ref[0, pl.ds(y, 2), pl.ds(xb, 8), :]  # [2, 8, 128] bf16
            wins.append(win.reshape(16, 128))
            xs.append(x)
            wxs.append(wxy_ref[0, 0, 0, i])
            wys.append(wxy_ref[0, 0, 1, i])
        win8 = jnp.stack(wins)                       # [8, 16, 128] bf16
        if mode == "load_only":
            out_ref[0, 0, pl.ds(base, GROUP), :] = (
                win8[:, 0, :64] + win8[:, 0, 64:]).astype(out_ref.dtype)
            return 0
        x8 = jnp.stack(xs).reshape(GROUP, 1, 1)
        wx8 = jnp.stack(wxs).reshape(GROUP, 1, 1)
        wy8 = jnp.stack(wys).reshape(GROUP, 1, 1)
        x16 = (x8 // 16) * 16
        # win8 row index r = col // 8 (0 or 1); x position = x16 + 2*(col%8)+
        # lane half
        r = col // 8
        xpos = x16 + 2 * (col % 8) + (lane >= 64).astype(jnp.int32)
        colw = jnp.where(xpos == x8, 1.0 - wx8, 0.0) + jnp.where(
            xpos == x8 + 1, wx8, 0.0)
        roww = jnp.where(r == 0, 1.0 - wy8, wy8)
        wgt = (colw * roww).astype(jnp.bfloat16)     # [8, 16, 128]
        v = jnp.sum((win8 * wgt).astype(jnp.float32), axis=1)  # [8, 128]
        out_ref[0, 0, pl.ds(base, GROUP), :] = (
            v[:, :64] + v[:, 64:]).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, CHUNK // GROUP, body, 0)


def make_call(mode="full", interpret=False):
    grid_spec = pl.GridSpec(
        grid=(SM, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, 2, CHUNK), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2, CHUNK), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, Hp, Wpp, 128), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, CHUNK, C), lambda s, ch: (s, ch, 0, 0),
            memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SM, NCH, CHUNK, C), jnp.float32),
        interpret=interpret,
    )


def xla_baseline(yx, wxy, val_packed):
    # same semantics via jax.lax.gather of 2x2 patches (prod bilinear path)
    val = val_packed.reshape(SM, Hp, Wpp * 2, 64)
    y0 = yx[:, :, 0, :].reshape(SM, -1)
    x0 = yx[:, :, 1, :].reshape(SM, -1)
    wx = wxy[:, :, 0, :].reshape(SM, -1, 1).astype(val.dtype)
    wy = wxy[:, :, 1, :].reshape(SM, -1, 1).astype(val.dtype)
    slab = jnp.broadcast_to(jnp.arange(SM, dtype=jnp.int32)[:, None], y0.shape)
    idx = jnp.stack([slab.reshape(-1), y0.reshape(-1), x0.reshape(-1)], -1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    patch = jax.lax.gather(val, idx, dnums, slice_sizes=(1, 2, 2, 64),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = patch.reshape(SM, -1, 2, 2, 64)
    top = patch[:, :, 0, 0] * (1 - wx) + patch[:, :, 0, 1] * wx
    bot = patch[:, :, 1, 0] * (1 - wx) + patch[:, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


rng = np.random.default_rng(0)
val = rng.normal(size=(SM, Hp, Wp, C)).astype(np.float32)
xf = rng.uniform(0, W - 1, size=(SM, NCH, CHUNK)).astype(np.float32)
yf = rng.uniform(0, H - 1, size=(SM, NCH, CHUNK)).astype(np.float32)
x0 = np.floor(xf).astype(np.int32) + PAD
y0 = np.floor(yf).astype(np.int32) + PAD
wx = (xf - np.floor(xf)).astype(np.float32)
wy = (yf - np.floor(yf)).astype(np.float32)
yx = np.stack([y0, x0], axis=2).astype(np.int32)
wxy = np.stack([wx, wy], axis=2).astype(np.float32)

val_bf = jnp.asarray(val.reshape(SM, Hp, Wpp, 128), jnp.bfloat16)
yx_j = jnp.asarray(yx)
wxy_j = jnp.asarray(wxy)

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
    out = np.asarray(make_call(interpret=True)(yx_j, wxy_j, val_bf))
    vn = np.asarray(val_bf, np.float32).reshape(SM, Hp, Wp, C)
    for s, chk, i in [(0, 0, 0), (3, 7, 123), (31, NCH - 1, CHUNK - 1)]:
        y, x = yx[s, chk, 0, i], yx[s, chk, 1, i]
        a, b = wx[s, chk, i], wy[s, chk, i]
        p = vn[s, y:y + 2, x:x + 2]
        want = (p[0, 0] * (1 - a) * (1 - b) + p[0, 1] * a * (1 - b)
                + p[1, 0] * (1 - a) * b + p[1, 1] * a * b)
        np.testing.assert_allclose(out[s, chk, i], want, rtol=3e-2, atol=3e-2)
    print("interpret-mode correctness OK")
else:
    def slope(call, *args):
        def run(n):
            t0 = time.perf_counter()
            x = args[0]
            out = None
            for _ in range(n):
                out = call(x, *args[1:])
                x = x + out.reshape(-1)[0].astype(jnp.int32) * 0
            float(jax.device_get(out.reshape(-1)[0]))
            return time.perf_counter() - t0
        run(1)
        t1, t2 = run(4), run(8)
        return (t2 - t1) / 4

    npatch = SM * K
    import os
    modes = os.environ.get("MODES", "load_only,full,xla").split(",")
    calls = {"load_only": lambda: jax.jit(make_call("load_only")),
             "full": lambda: jax.jit(make_call("full")),
             "xla": lambda: jax.jit(xla_baseline)}
    for name in modes:
        call = calls[name]()
        per = slope(call, yx_j, wxy_j, val_bf)
        print(f"{name}: {per * 1e3:.2f} ms ({per / npatch * 1e9:.1f} ns/patch)")
