"""Round-5 gather campaign: where do the 7.3 ns/patch go, and does
consecutive-window SHARING beat the production kernel?

Production kernel (`ops/gather_kernel._kernel`): per point, stage the
8-aligned [WIN=16, 128] window into scratch (scalar-indexed copy), then ONE
bulk multiply+sublane-reduce per GROUP=128 points. The decode step spends
111 ms in 36 such calls (2.53 M patches) — at the kernel's own measured
floor. The d-radial sampling structure makes CONSECUTIVE points (the D=3/5
radial siblings of one (query, point, frame)) frequently hit the SAME
window; a carry kernel stages only when the window key changes.

Modes (MODES env, comma-separated):
  base        production form (stage all + bulk group reduce)
  load        staging only (isolate the copy cost)
  reduce      bulk reduce only (stage group 0 once)
  carry       per-point carried window: lax.cond(new_key, stage, keep) +
              per-point [WIN,128] weighted sublane reduce
  carry_f50 / carry_f90   same kernel, input keys with 50% / 90%
              consecutive-share rate (carry = 0% i.e. all-unique keys)

Shape: the BEV production case (S=8, K=72000, R=524, Wpad=144).
Usage: MODES=base,load,carry_f90 GROUP=128 python gather_v6_share.py
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

GROUP = int(os.environ.get("GROUP", "128"))
WIN = 16
LANES = 128
S, K, R, WPAD, W = 8, 72000, 524, 144, 128
CHUNK = 4800 if 4800 % GROUP == 0 else (4800 // GROUP + 1) * GROUP
NCH = -(-K // CHUNK)
KPAD = NCH * CHUNK


def kernel_base(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
    ng = packed_ref.shape[2]

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0x7FFF), 8)
            scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
        of = of_ref[0, 0, pl.ds(g, 1), :]
        ofc = jnp.transpose(of, (1, 0))
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)
        acc = jnp.sum(
            scratch_ref[:, :, :] * w[:, :, None].astype(scratch_ref.dtype),
            axis=1)
        out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def kernel_load(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
    ng = packed_ref.shape[2]

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0x7FFF), 8)
            scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
        out_ref[0, 0, pl.ds(base, GROUP), :] = scratch_ref[:, 0, :]
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def kernel_reduce(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
    ng = packed_ref.shape[2]

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)

        @pl.when(g == 0)
        def _():
            for j in range(GROUP):
                v = packed_ref[0, 0, 0, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0x7FFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]

        of = of_ref[0, 0, pl.ds(g, 1), :]
        ofc = jnp.transpose(of, (1, 0))
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)
        acc = jnp.sum(
            scratch_ref[:, :, :] * w[:, :, None].astype(scratch_ref.dtype),
            axis=1)
        out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def kernel_carry(packed_ref, of_ref, val_ref, out_ref, win_ref, acc_ref):
    """Shared-window form: the packed word carries a precomputed NEW bit
    (bit 15); staging into the single window slot is PREDICATED on it, so a
    run of points sharing the (row, xb) key stages once. Per-point weighted
    sublane reduce from the slot; rows collected in acc scratch, one aligned
    write per group. `of_ref` is SMEM (per-point scalar read)."""
    ng = packed_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (WIN, 1), 0).astype(jnp.float32)

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0x7FFF), 8)

            @pl.when(jax.lax.bitwise_and(v, 0x8000) != 0)
            def _():
                win_ref[:, :] = val_ref[0, row, pl.ds(xb, WIN), :]

            o = of_ref[0, 0, g, j]
            w = jnp.maximum(1.0 - jnp.abs(col - o), 0.0)
            acc = jnp.sum(win_ref[:, :] * w.astype(win_ref.dtype), axis=0)
            acc_ref[j, :] = acc
        out_ref[0, 0, pl.ds(base, GROUP), :] = acc_ref[:, :].astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def build_call(mode):
    kern = {"base": kernel_base, "load": kernel_load,
            "reduce": kernel_reduce}.get(mode, kernel_carry)
    carry = kern is kernel_carry
    of_space = pltpu.SMEM if carry else pltpu.VMEM
    scratch = ([pltpu.VMEM((WIN, LANES), jnp.bfloat16),
                pltpu.VMEM((GROUP, LANES), jnp.bfloat16)] if carry
               else [pltpu.VMEM((GROUP, WIN, LANES), jnp.bfloat16)])

    def call(packed, of, val):
        return pl.pallas_call(
            kern,
            grid=(S, NCH),
            in_specs=[
                pl.BlockSpec((1, 1, NCH and CHUNK // GROUP, GROUP),
                             lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, CHUNK // GROUP, GROUP),
                             lambda s, ch: (s, ch, 0, 0),
                             memory_space=of_space),
                pl.BlockSpec((1, R, WPAD, LANES), lambda s, ch: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, CHUNK, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, CHUNK, LANES),
                                           jnp.bfloat16),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(packed, of, val)

    return jax.jit(call)


def make_inputs(rng, share=0.0):
    """Keys with a controlled consecutive-share rate."""
    row = rng.integers(0, R, (S, KPAD), dtype=np.int32)
    x0 = rng.integers(0, W, (S, KPAD), dtype=np.int32)
    xb = (x0 // 8) * 8
    key = (row << 16) | xb
    if share > 0:  # NEW bit (bit 15) is added after run-length shaping
        keep = rng.uniform(size=(S, KPAD)) < share
        keep[:, 0] = False
        for s in range(S):
            ks = key[s]
            for j in range(1, KPAD):
                if keep[s, j]:
                    ks[j] = ks[j - 1]
    # offsets must match the (possibly shared) key's window
    xb_eff = key & 0x7FFF
    x0_eff = np.minimum(xb_eff + (x0 % 8), W - 1)
    o = (x0_eff - xb_eff).astype(np.float32) + rng.uniform(
        0, 1, (S, KPAD)).astype(np.float32)
    new = np.ones_like(key)
    new[:, 1:] = (key[:, 1:] != key[:, :-1]).astype(key.dtype)
    packed = (key | (new << 15)).reshape(S, NCH, CHUNK // GROUP, GROUP)
    of = o.reshape(S, NCH, CHUNK // GROUP, GROUP)
    val = rng.standard_normal((S, R, WPAD, LANES)).astype(np.float32)
    return (jnp.asarray(packed), jnp.asarray(of),
            jnp.asarray(val, jnp.bfloat16), key, o, val)


def slope(fn, a, n1=8, n2=24):
    def run(n):
        t0 = time.perf_counter()
        out, v = None, a[2]
        for _ in range(n):
            out = fn(a[0], a[1], v)
            v = v + (out[0, 0, 0, 0] * jnp.asarray(0, v.dtype))
        float(jax.device_get(out[0, 0, 0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def check(out, key, o, val):
    out = np.asarray(out, np.float32).reshape(S, KPAD, LANES)
    i, j = 3, 777
    row, xb = key[i, j] >> 16, key[i, j] & 0x7FFF
    off = o[i, j]
    lo = int(np.floor(off))
    wx = off - lo
    ref = val[i, row, xb + lo] * (1 - wx) + val[i, row, xb + lo + 1] * wx
    err = np.max(np.abs(ref - out[i, j])) / (np.abs(ref).max() + 1e-6)
    return err


def main():
    rng = np.random.default_rng(0)
    modes = os.environ.get(
        "MODES", "base,load,reduce,carry,carry_f50,carry_f90").split(",")
    a0 = make_inputs(rng, 0.0)
    a50 = make_inputs(rng, 0.5)
    a90 = make_inputs(rng, 0.9)
    for mode in modes:
        a = {"carry_f50": a50, "carry_f90": a90}.get(mode, a0)
        try:
            call = build_call(mode)
            per = slope(call, a)
            msg = f"{mode} (GROUP={GROUP}): {per * 1e3:.3f} ms/call  " \
                  f"{per / (S * K) * 1e9:.2f} ns/patch"
            if mode == "base" or mode.startswith("carry"):
                err = check(call(a[0], a[1], a[2]), a[3], a[4], a[5])
                msg += f"  rel_err={err:.5f}"
            print(msg)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
