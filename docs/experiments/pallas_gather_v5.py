"""Prototype v5: halve the per-point load with an overlap-stride-4 map.

v4 result (v5e): GROUP=32 -> 15.4 ns/patch, GROUP=64 -> 14.0; XLA baseline
23.6. The [16,128] window load (4 KB) dominates. Two ideas measured here:

  1. overlap map: om[:, 8b+j, :] = fused[:, 4b+j, :] (each 8-sublane block b
     covers columns [4b, 4b+8)). For any x, block x//4 contains x and x+1 at
     offset o = x%4 in [0,4], and the block start 8*(x//4) is 8-aligned. The
     window load shrinks to [8,128] = 2 KB. The map doubles in bytes but is
     built ONCE per frame in XLA (hoisted out of the 6-layer decoder scan).
  2. VPU select instead of the block-diagonal MXU matmul: stage windows into
     scratch [G, 8, 128], then out = sum_j w[:, j, None] * scratch[:, :, j]
     — an intra-tile sublane reduction, no [CHUNK, G*WIN] A matrix at all.
     w is the x-lerp one-hot over just 8 columns, built in-kernel.

Modes: mm8 (overlap + matmul), vpu8 (overlap + VPU reduce), vpu16
(no-overlap [16,128] loads + VPU reduce), load8 (loads only).

Usage: GROUP=32 MODES=mm8,vpu8 python pallas_gather_v5.py
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

SM = 32
H = W = 128
PAD = 2
Hp = H + 2 * PAD
C = 64
K = 18000
CHUNK = 1200
GROUP = int(os.environ.get("GROUP", "32"))
NCH = K // CHUNK

R0 = Hp - 1
# no-overlap padded width (v4): xb = (x//8)*8, window [xb, xb+16)
WIN16 = 16
Wpad16 = ((W + 2 * PAD + WIN16 + 7) // 8) * 8
# overlap map: NB blocks of 8 sublanes, block b = cols [4b, 4b+8)
NB = (W + 2 * PAD + 4 + 3) // 4  # enough blocks for x up to W+PAD
WIN8 = 8


def make_kernel(mode):
    def kernel(yx_ref, ow_ref, val_ref, out_ref, scratch_ref):
        # yx_ref: SMEM [1,1,2,CHUNK] (row, block-or-xb start in sublanes)
        # ow_ref: VMEM [1,1,CHUNK,2] f32 (offset o as float, wx)
        # val_ref: VMEM [1, R0, Wsub, 128]
        # scratch_ref: [GROUP, WINx, 128] f32? keep bf16
        WINx = scratch_ref.shape[1]

        def body(g, _):
            base = g * GROUP
            for j in range(GROUP):
                row = yx_ref[0, 0, 0, base + j]
                sb = pl.multiple_of(yx_ref[0, 0, 1, base + j], 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(sb, WINx), :]
            if mode.startswith("load"):
                out_ref[0, 0, pl.ds(base, GROUP), :] = scratch_ref[:, 0, :]
                return 0
            o = ow_ref[0, 0, pl.ds(base, GROUP), 0][:, None]    # [G,1] f32
            oi = o.astype(jnp.int32)
            wx = ow_ref[0, 0, pl.ds(base, GROUP), 1][:, None]
            col = jax.lax.broadcasted_iota(jnp.int32, (GROUP, WINx), 1)
            w = jnp.where(col == oi, 1.0 - wx, 0.0) + jnp.where(
                col == oi + 1, wx, 0.0)                         # [G, WINx]
            if mode.startswith("vpu"):
                acc = jnp.sum(scratch_ref[:, :, :] * w[:, :, None]
                              .astype(jnp.bfloat16), axis=1)
                out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(jnp.bfloat16)
            else:  # mm: block-diagonal matmul built from w
                gi = jax.lax.broadcasted_iota(
                    jnp.int32, (GROUP, GROUP * WINx), 0)
                ci = jax.lax.broadcasted_iota(
                    jnp.int32, (GROUP, GROUP * WINx), 1)
                tgt = gi * WINx + oi
                a = jnp.where(ci == tgt, 1.0 - wx, 0.0) + jnp.where(
                    ci == tgt + 1, wx, 0.0)
                a = a.astype(jnp.bfloat16)
                flat = scratch_ref[:, :, :].reshape(GROUP * WINx, 128)
                acc = jax.lax.dot_general(
                    a, flat, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, CHUNK // GROUP, body, 0)

    return kernel


def build_call(mode):
    WINx = WIN8 if mode.endswith("8") else WIN16
    Wsub = NB * 8 if mode.endswith("8") else Wpad16

    def call(yx, ow, val):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(SM, NCH),
            in_specs=[
                pl.BlockSpec((1, 1, 2, CHUNK), lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, CHUNK, 2), lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, R0, Wsub, 128), lambda s, ch: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, CHUNK, 128),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SM, NCH, CHUNK, 128),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((GROUP, WINx, 128), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(yx, ow, val)

    return call


def main():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, W - 1, (SM, K)).astype(np.float32)
    y = rng.uniform(0, H - 1, (SM, K)).astype(np.float32)
    x0 = np.floor(x).astype(np.int32) + PAD
    y0 = np.floor(y).astype(np.int32) + PAD
    wx = (x - np.floor(x)).astype(np.float32)

    val = rng.standard_normal((SM, R0, Wpad16, 128)).astype(np.float32)
    val8 = np.zeros((SM, R0, NB * 8, 128), np.float32)
    for b in range(NB):
        src = val[:, :, 4 * b:4 * b + 8, :]
        val8[:, :, 8 * b:8 * b + src.shape[2], :] = src

    modes = os.environ.get("MODES", "vpu8,mm8,vpu16,load8").split(",")
    for mode in modes:
        if mode.endswith("8"):
            sb = (x0 // 4) * 8
            o = (x0 % 4).astype(np.float32)
            v = val8
        else:
            sb = (x0 // 8) * 8
            o = (x0 - sb).astype(np.float32)
            v = val
        yx = np.stack([y0, sb], axis=1).reshape(SM, 2, NCH, CHUNK)
        yx = np.ascontiguousarray(yx.transpose(0, 2, 1, 3))
        ow = np.stack([o, wx], axis=-1).reshape(SM, NCH, CHUNK, 2)
        args = (jnp.asarray(yx), jnp.asarray(ow),
                jnp.asarray(v, jnp.bfloat16))
        call = jax.jit(build_call(mode))

        def run(n):
            t0 = time.perf_counter()
            vv = args[-1]
            out = None
            for _ in range(n):
                out = call(args[0], args[1], vv)
                vv = vv + out.reshape(-1)[0].astype(vv.dtype) * jnp.asarray(
                    0, vv.dtype)
            float(jax.device_get(out.reshape(-1)[0].astype(jnp.float32)))
            return time.perf_counter() - t0

        try:
            run(1)
            t1, t2 = run(4), run(8)
            per = (t2 - t1) / 4
            print(f"v5 {mode} (GROUP={GROUP}): {per * 1e3:.2f} ms "
                  f"({per / (SM * K) * 1e9:.1f} ns/patch)")
            # correctness spot check vs numpy
            out = np.asarray(call(*args), np.float32).reshape(SM, NCH * CHUNK,
                                                              128)[:, :K]
            if not mode.startswith("load"):
                i, j = 3, 777
                r, c = int(y0[i, j]), int(x0[i, j])
                ref = (val[i, r, c] * (1 - wx[i, j]) +
                       val[i, r, c + 1] * wx[i, j])
                got = out[i, j]
                err = np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-6)
                print(f"   rel err vs fused-row lerp: {err:.4f}")
        except Exception as e:
            print(f"v5 {mode} (GROUP={GROUP}): FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
