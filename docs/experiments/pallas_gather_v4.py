"""Prototype v4: fused bilinear gather via aligned window loads + MXU select.

Lessons from v2 (98 cyc/patch: per-point masked RMW stores) and v3 (Mosaic
rejects the [2,8,128]->[16,128] reshape): keep every in-kernel op layout-
trivial and move ALL per-point weight construction out to XLA.

Design (per point):
  - operand is the y-fused map [Hp-1, Wpad, 2C=128] bf16 (one row per patch,
    like the production XLA path), Wpad padded so xb+16 stays in bounds.
  - load win = val[y, xb:xb+16, :] where xb = (x//8)*8 is 8-aligned
    (dynamic sublane starts must be 8-aligned on Mosaic; y is an outer dim,
    unconstrained).
  - store the GROUP windows contiguously into a [GROUP*16, 128] scratch.
  - one MXU matmul A[GROUP, GROUP*16] @ scratch selects the 2 columns of
    every point AND applies the x-lerp and the per-point attention weight:
    A is block-diagonal with (1-wx)*aw at column offset (x-xb) and wx*aw at
    (x-xb+1), PREBUILT IN XLA and streamed in as a dense [K/8grp...] input.
  - the y-lerp (mixing the two channel halves) happens outside in XLA on the
    [K, 128] result (cheap elementwise).

This makes the kernel: loads + static stores + one matmul per GROUP. No
reshapes, no iota, no per-point vector weight building.

Usage: python pallas_gather_v4.py [cpu]
"""
import functools
import os
import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SM = 32          # slabs (B*T*M for the BEV branch)
H = W = 128
PAD = 2
Hp = H + 2 * PAD
WIN = 16
Wpad = ((W + 2 * PAD + WIN + 7) // 8) * 8   # room for xb+16
C = 64           # channels per head; lanes = 2C (y-fused)
K = 18000        # points per slab
CHUNK = 1200     # points per grid step
GROUP = int(os.environ.get("GROUP", "8"))
NCH = K // CHUNK


def kernel(yx_ref, a_ref, val_ref, out_ref, scratch_ref, *, mode="full"):
    # yx_ref: SMEM [1, 1, 2, CHUNK] (y, xb); a_ref: VMEM [1, 1, CHUNK, GROUP*WIN]
    # val_ref: VMEM [1, Hp-1, Wpad, 128]; out_ref: VMEM [1, 1, CHUNK, 128]
    # scratch_ref: VMEM [GROUP*WIN, 128]
    def body(g, _):
        base = g * GROUP
        if mode != "mm_only":
            for j in range(GROUP):
                y = yx_ref[0, 0, 0, base + j]
                xb = pl.multiple_of(yx_ref[0, 0, 1, base + j], 8)
                scratch_ref[j * WIN:(j + 1) * WIN, :] = (
                    val_ref[0, y, pl.ds(xb, WIN), :])
        if mode == "load_only":
            out_ref[0, 0, pl.ds(base, GROUP), :] = (
                scratch_ref[0:GROUP, :].astype(jnp.float32))
            return 0
        a = a_ref[0, 0, pl.ds(base, GROUP), :]          # [GROUP, GROUP*WIN] bf16
        res = jax.lax.dot_general(
            a, scratch_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [GROUP, 128]
        out_ref[0, 0, pl.ds(base, GROUP), :] = res
        return 0

    jax.lax.fori_loop(0, CHUNK // GROUP, body, 0)


def make_call(interpret=False, mode="full"):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(SM, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, 2, CHUNK), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK, GROUP * WIN), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp - 1, Wpad, 128), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, CHUNK, 128), lambda s, ch: (s, ch, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SM, NCH, CHUNK, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GROUP * WIN, 128), jnp.bfloat16)],
        interpret=interpret,
    )


def fused_sample(yx, amat, wy, val_fused, interpret=False):
    out = make_call(interpret)(yx, amat, val_fused)     # [SM, NCH, CHUNK, 128]
    out = out.reshape(SM, NCH * CHUNK, 2, C)
    wy = wy.reshape(SM, NCH * CHUNK, 1)
    return out[:, :, 0] * (1 - wy) + out[:, :, 1] * wy  # [SM, K, C]


def build_amat(x, xb, wx, aw):
    """A rows: [*, K, GROUP*WIN] bf16, block-diagonal lerp+attention weights."""
    o = (x - xb)[..., None]                             # [SM, NCH, CHUNK, 1]
    grp = (jnp.arange(CHUNK, dtype=jnp.int32) % GROUP)[None, None, :, None]
    col = jnp.arange(GROUP * WIN, dtype=jnp.int32)[None, None, None, :]
    tgt = grp * WIN + o
    a = jnp.where(col == tgt, (1 - wx)[..., None], 0.0) + jnp.where(
        col == tgt + 1, wx[..., None], 0.0)
    return (a * aw[..., None]).astype(jnp.bfloat16)


def xla_baseline(yx_full, wx, wy, aw, val_fused):
    # production path: single-row (1,1,WIN?no,2,2C) patch gather + lerp + weight
    y0 = yx_full[:, :, 0, :].reshape(SM, -1)
    x0 = yx_full[:, :, 1, :].reshape(SM, -1)
    slab = jnp.broadcast_to(jnp.arange(SM, dtype=jnp.int32)[:, None], y0.shape)
    idx = jnp.stack([slab.reshape(-1), y0.reshape(-1), x0.reshape(-1)], -1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    patch = jax.lax.gather(val_fused, idx, dnums, slice_sizes=(1, 1, 2, 2 * C),
                           mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    patch = patch.reshape(SM, K, 2, 2 * C)
    wxr = wx.reshape(SM, K, 1).astype(patch.dtype)
    wyr = wy.reshape(SM, K, 1)
    xl = patch[:, :, 0] * (1 - wxr) + patch[:, :, 1] * wxr  # [SM, K, 2C]
    xl = xl.astype(jnp.float32)
    out = xl[..., :C] * (1 - wyr) + xl[..., C:] * wyr
    return out * aw.reshape(SM, K, 1)


rng = np.random.default_rng(0)
val = rng.normal(size=(SM, Hp, Wpad, C)).astype(np.float32)
xf = rng.uniform(0, W - 1, size=(SM, NCH, CHUNK)).astype(np.float32)
yf = rng.uniform(0, H - 1, size=(SM, NCH, CHUNK)).astype(np.float32)
awf = rng.uniform(0.1, 1.0, size=(SM, NCH, CHUNK)).astype(np.float32)
x0 = np.floor(xf).astype(np.int32) + PAD
y0 = np.floor(yf).astype(np.int32) + PAD
wx = (xf - np.floor(xf)).astype(np.float32)
wy = (yf - np.floor(yf)).astype(np.float32)

# y-fused map [SM, Hp-1, Wpad, 2C]
val_fused = np.concatenate([val[:, :-1], val[:, 1:]], axis=-1)
val_bf = jnp.asarray(val_fused, jnp.bfloat16)

xb = (x0 // 8) * 8
yx = jnp.asarray(np.stack([y0, xb], axis=2))            # kernel: (y, xb)
yx_full = jnp.asarray(np.stack([y0, x0], axis=2))       # baseline: (y, x)
amat = build_amat(jnp.asarray(x0), jnp.asarray(xb), jnp.asarray(wx),
                  jnp.asarray(awf))
wy_j = jnp.asarray(wy)
wx_j = jnp.asarray(wx)
aw_j = jnp.asarray(awf)

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
    out = np.asarray(
        jax.jit(lambda *a: fused_sample(*a, interpret=True))(
            yx, amat, wy_j, val_bf))
    ref = np.asarray(
        jax.jit(xla_baseline)(yx_full, wx_j, wy_j, aw_j, val_bf))
    np.testing.assert_allclose(out, ref.reshape(SM, K, C), rtol=3e-2, atol=3e-2)
    print("interpret-mode correctness OK")
else:
    def slope(call, *args):
        # chain through the float value operand (last arg): a *0 feedback on
        # an int index input can be folded/reordered and yields bogus slopes
        def run(n):
            t0 = time.perf_counter()
            v = args[-1]
            out = None
            for _ in range(n):
                out = call(*args[:-1], v)
                v = v + out.reshape(-1)[0].astype(v.dtype)* jnp.asarray(0, v.dtype)
            float(jax.device_get(out.reshape(-1)[0]))
            return time.perf_counter() - t0
        run(1)
        t1, t2 = run(4), run(8)
        return (t2 - t1) / 4

    npatch = SM * K
    modes = os.environ.get("MODES", "pallas,xla").split(",")
    if "pallas" in modes:
        call = jax.jit(lambda yx, amat, wy, val: fused_sample(yx, amat, wy, val))
        per = slope(call, yx, amat, wy_j, val_bf)
        print(f"pallas v4 (GROUP={GROUP}): {per * 1e3:.2f} ms "
              f"({per / npatch * 1e9:.1f} ns/patch)")
    for m in ("load_only", "mm_only"):
        if m in modes:
            call = jax.jit(lambda yx, amat, val, m=m: make_call(mode=m)(yx, amat, val))
            per = slope(call, yx, amat, val_bf)
            print(f"pallas v4 {m} (GROUP={GROUP}): {per * 1e3:.2f} ms "
                  f"({per / npatch * 1e9:.1f} ns/patch)")
    if "xla" in modes:
        call = jax.jit(xla_baseline)
        per = slope(call, yx_full, wx_j, wy_j, aw_j, val_bf)
        print(f"xla baseline: {per * 1e3:.2f} ms ({per / npatch * 1e9:.1f} ns/patch)")
