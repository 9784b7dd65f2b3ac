"""Round-5 v7: fuse the sampling EPILOGUE into the gather kernel.

The round-5 decode profile: the 6 gather calls cost 111 ms/step at their
issue-bound floor, but they write y-paired 128-lane outputs per level that
XLA then re-reads through big epilogue fusions — the image site's 4-level
weighted sum (`fusion.943`, 11.7 ms/step, ~354 MB reads/iteration) and the
BEV sites' relayout+slice+weighted-sum chains (~16 ms/step). The share-rate
study (window_share_study.py) killed the window-sharing idea (10-26% real
share at the dominant sites), so the win is in the EPILOGUE:

  kernel does: stage window -> x-lerp-with-hat x level-weight ->
               y-mix (lane roll) -> accumulate over levels -> [*, 64] out

One call per site per iteration (image: all 4 levels), output 8x smaller
(64 lanes, levels pre-summed), epilogue reduced to a reshape.

Cases:
  img: S=32, K=10800, 4 levels (flagship image pyramid shapes)
  bev: S=8, K=72000, 1 level, attention weight premultiplied
A/B: `split` = production form (per-level kernel calls + XLA y-mix/weighted
sum) vs `fused` = the v7 kernel + trivial XLA tail.

Usage: CASES=img,bev python gather_v7_fused.py
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

sys.path.insert(0, "/root/repo")

GROUP = 128
WIN = 16
LANES = 128

IMG_LEVELS = [(402, 192, 176, 64), (210, 104, 88, 32), (114, 56, 44, 16),
              (66, 40, 22, 8)]  # (R, Wpad, true W, true H per cam x 6)
BEV_LEVELS = [(524, 144, 128, 128)]


UNROLL = int(os.environ.get("UNROLL", "16"))


def make_kernel(L):
    def kernel(packed_ref, aux_ref, *refs):
        val_refs = refs[:L]
        out_ref = refs[L]
        scratch_ref = refs[L + 1]
        ng = packed_ref.shape[3]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        lane_hi = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
                   // 64).astype(jnp.float32)  # 0 on top half, 1 on bottom

        def body(g, _):
            base = pl.multiple_of(g * GROUP, GROUP)
            total = jnp.zeros((GROUP, LANES), jnp.float32)
            for l in range(L):
                # staging partially unrolled: a fully unrolled GROUP x L
                # loop (the production kernel's form) takes >10 min of
                # Mosaic compile at L=4; UNROLL bodies inside a fori keeps
                # compile tractable and measures the dynamic-loop overhead
                def stage(i, _):
                    jb = pl.multiple_of(i * UNROLL, UNROLL)
                    for jj in range(UNROLL):
                        v = packed_ref[0, 0, l, g, jb + jj]
                        row = jax.lax.shift_right_logical(v, 16)
                        xb = pl.multiple_of(
                            jax.lax.bitwise_and(v, 0xFFFF), 8)
                        scratch_ref[jb + jj, :, :] = val_refs[l][
                            0, row, pl.ds(xb, WIN), :]
                    return 0

                jax.lax.fori_loop(0, GROUP // UNROLL, stage, 0)
                of = jnp.transpose(aux_ref[0, 0, l, 0, pl.ds(g, 1), :], (1, 0))
                wl = jnp.transpose(aux_ref[0, 0, l, 2, pl.ds(g, 1), :], (1, 0))
                hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0) * wl
                acc = jnp.sum(
                    scratch_ref[:, :, :].astype(jnp.float32)
                    * hat[:, :, None], axis=1)          # [G, LANES] y-paired
                wy = jnp.transpose(aux_ref[0, 0, l, 1, pl.ds(g, 1), :], (1, 0))
                yw = (1.0 - wy) + lane_hi * (2.0 * wy - 1.0)
                total = total + acc * yw
            # roll-by-64 add leaves the y-mixed value DUPLICATED in both
            # lane halves -> full aligned 128-lane store (a 64-lane block
            # would be a masked half-tile write); consumers read lanes [:64]
            mixed = total + pltpu.roll(total, shift=64, axis=1)
            out_ref[0, 0, pl.ds(base, GROUP), :] = mixed.astype(
                out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def build_fused(levels, S, NCH, CHUNK):
    L = len(levels)
    NG = CHUNK // GROUP

    def call(packed, aux, *vals):
        return pl.pallas_call(
            make_kernel(L),
            grid=(S, NCH),
            in_specs=[
                pl.BlockSpec((1, 1, L, NG, GROUP),
                             lambda s, ch: (s, ch, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, L, 3, NG, GROUP),
                             lambda s, ch: (s, ch, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((1, R, Wp, LANES), lambda s, ch: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM)
                for (R, Wp, _, _) in levels
            ],
            out_specs=pl.BlockSpec((1, 1, CHUNK, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, CHUNK, LANES),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(packed, aux, *vals)

    return jax.jit(call)


def build_split(levels, S, NCH, CHUNK):
    """Production-equivalent: per-level raw gather (y-paired 128-lane out)
    + XLA epilogue (y-mix + weighted level sum)."""
    from racformer_tpu.ops.gather_kernel import _gather_pallas

    L = len(levels)

    def call(packed, aux, *vals):
        outs = []
        for l in range(L):
            res = _gather_pallas(packed[:, :, l].copy(),
                                 aux[:, :, l, 0].copy(), vals[l], CHUNK)
            outs.append(res)  # [S, NCH, CHUNK, 128]
        total = None
        for l, res in enumerate(outs):
            wy = aux[:, :, l, 1].reshape(S, NCH, CHUNK)[..., None]
            wl = aux[:, :, l, 2].reshape(S, NCH, CHUNK)[..., None]
            r = res.astype(jnp.float32)
            mixed = r[..., :64] * (1 - wy) + r[..., 64:] * wy
            term = mixed * wl
            total = term if total is None else total + term
        return total.astype(jnp.bfloat16)

    return jax.jit(call)


def make_case(levels, S, K, rng):
    CHUNK = 4864  # multiple of GROUP, the production BEV chunk
    NCH = -(-K // CHUNK)
    KPAD = NCH * CHUNK
    NG = CHUNK // GROUP
    L = len(levels)
    packed = np.zeros((S, NCH, L, NG, GROUP), np.int32)
    aux = np.zeros((S, NCH, L, 3, NG, GROUP), np.float32)
    vals = []
    checks = []
    for l, (R, Wp, W, H) in enumerate(levels):
        row = rng.integers(0, R, (S, KPAD), dtype=np.int32)
        x0 = rng.integers(0, W, (S, KPAD), dtype=np.int32)
        xb = (x0 // 8) * 8
        o = (x0 - xb) + rng.uniform(0, 1, (S, KPAD)).astype(np.float32)
        wy = rng.uniform(0, 1, (S, KPAD)).astype(np.float32)
        wl = rng.uniform(0, 1, (S, KPAD)).astype(np.float32)
        packed[:, :, l] = ((row << 16) | xb).reshape(S, NCH, NG, GROUP)
        aux[:, :, l, 0] = o.reshape(S, NCH, NG, GROUP)
        aux[:, :, l, 1] = wy.reshape(S, NCH, NG, GROUP)
        aux[:, :, l, 2] = wl.reshape(S, NCH, NG, GROUP)
        v = rng.standard_normal((S, R, Wp, LANES)).astype(np.float32)
        vals.append(v)
        checks.append((row, x0, o, wy, wl, v))
    return (jnp.asarray(packed), jnp.asarray(aux),
            [jnp.asarray(v, jnp.bfloat16) for v in vals],
            CHUNK, NCH, KPAD, checks)


def slope(fn, packed, aux, vals, n1=6, n2=18):
    def run(n):
        t0 = time.perf_counter()
        out, vv = None, vals
        for _ in range(n):
            out = fn(packed, aux, *vv)
            vv = [v + (out[0, 0, 0, 0] * jnp.asarray(0, v.dtype))
                  for v in vv]
        float(jax.device_get(out[0, 0, 0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    run(2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def ref_point(checks, s, k):
    tot = np.zeros(64, np.float32)
    for (row, x0, o, wy, wl, v) in checks:
        r, xb = row[s, k], (x0[s, k] // 8) * 8
        off = o[s, k]
        lo = int(np.floor(off))
        wx = off - lo
        pair = (v[s, r, xb + lo].astype(np.float32) * (1 - wx)
                + v[s, r, xb + lo + 1].astype(np.float32) * wx)
        mixed = pair[:64] * (1 - wy[s, k]) + pair[64:] * wy[s, k]
        tot += mixed * wl[s, k]
    return tot


def main():
    rng = np.random.default_rng(0)
    if "img_fold" in os.environ.get("CASES", ""):
        run_fold("img", IMG_LEVELS, 32, 10800, np.random.default_rng(1))
    for name, levels, S, K in (("img", IMG_LEVELS, 32, 10800),
                               ("bev", BEV_LEVELS, 8, 72000)):
        if name not in os.environ.get("CASES", "img,bev").split(","):
            continue
        packed, aux, vals, CHUNK, NCH, KPAD, checks = make_case(
            levels, S, K, rng)
        for mode in ("fused", "split"):
            try:
                build = build_fused if mode == "fused" else build_split
                fn = build(levels, S, NCH, CHUNK)
                per = slope(fn, packed, aux, vals)
                out = np.asarray(fn(packed, aux, *vals), np.float32)
                out = out.reshape(S, KPAD, -1)[:, :, :64]
                s, k = 3, 777
                ref = ref_point(checks, s, k)
                err = np.max(np.abs(out[s, k] - ref)) / (
                    np.abs(ref).max() + 1e-6)
                print(f"{name} {mode}: {per * 1e3:.3f} ms/call "
                      f"({per / (S * K) * 1e9:.2f} ns/pt)  rel_err={err:.4f}")
            except Exception as e:
                print(f"{name} {mode}: FAILED {type(e).__name__}: "
                      f"{str(e)[:400]}")





# ---------------------------------------------------------------------------
# v7b "fold": ONE single-map kernel for all levels. The per-level maps are
# row-CONCATENATED (level offset folded into the packed row index on the XLA
# side — free), points are level-INTERLEAVED (l fastest), and the kernel
# sums each FOLD consecutive points after the weighted reduce via a sublane
# reshape-sum. Full 128-point unroll (the partial-unroll fori costs +45%,
# measured above) with base-kernel compile cost, epilogue gone entirely.
# ---------------------------------------------------------------------------
FOLD = 4


def kernel_fold(packed_ref, of_ref, wy_ref, wl_ref, val_ref, out_ref,
                scratch_ref):
    ng = packed_ref.shape[2]
    col = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
    lane_hi = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
               // 64).astype(jnp.float32)
    GO = GROUP // FOLD

    def body(g, _):
        base = pl.multiple_of(g * GO, GO)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0x7FFF), 8)
            scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
        of = jnp.transpose(of_ref[0, 0, pl.ds(g, 1), :], (1, 0))
        wl = jnp.transpose(wl_ref[0, 0, pl.ds(g, 1), :], (1, 0))
        hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0) * wl
        acc = jnp.sum(
            scratch_ref[:, :, :].astype(jnp.float32) * hat[:, :, None],
            axis=1)                                     # [G, LANES] y-paired
        wy = jnp.transpose(wy_ref[0, 0, pl.ds(g, 1), :], (1, 0))
        yw = (1.0 - wy) + lane_hi * (2.0 * wy - 1.0)
        tot = jnp.sum((acc * yw).reshape(GO, FOLD, LANES), axis=1)
        mixed = tot + pltpu.roll(tot, shift=64, axis=1)  # dup lane halves
        out_ref[0, 0, pl.ds(base, GO), :] = mixed.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def build_fold(levels, S, NCH, CHUNK):
    NG = CHUNK // GROUP
    R_cat = sum(R for (R, _, _, _) in levels)
    Wp_max = max(Wp for (_, Wp, _, _) in levels)

    def call(packed, of, wy, wl, val_cat):
        return pl.pallas_call(
            kernel_fold,
            grid=(S, NCH),
            in_specs=[
                pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.SMEM),
            ] + [
                pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(3)
            ] + [
                pl.BlockSpec((1, R_cat, Wp_max, LANES),
                             lambda s, ch: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, CHUNK // FOLD, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, CHUNK // FOLD, LANES),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(packed, of, wy, wl, val_cat)

    return jax.jit(call)


def run_fold(name, levels, S, K, rng):
    """K here = model points per slab; kernel points = K * L interleaved.
    For a fair A/B vs `split`, L must equal FOLD (the image case)."""
    L = len(levels)
    assert L == FOLD
    CHUNK = 4864
    KK = K * L
    NCH = -(-KK // CHUNK)
    KKPAD = NCH * CHUNK
    Wp_max = max(Wp for (_, Wp, _, _) in levels)
    R_cat = sum(R for (R, _, _, _) in levels)

    # per-level data at K model points, then interleave l-fastest and pad
    packed = np.zeros((S, K, L), np.int32)
    of = np.zeros((S, K, L), np.float32)
    wyv = np.zeros((S, K, L), np.float32)
    wlv = np.zeros((S, K, L), np.float32)
    val_cat = np.zeros((S, R_cat, Wp_max, LANES), np.float32)
    checks = []
    roff = 0
    for l, (R, Wp, W, H) in enumerate(levels):
        row = rng.integers(0, R, (S, K), dtype=np.int32)
        x0 = rng.integers(0, W, (S, K), dtype=np.int32)
        xb = (x0 // 8) * 8
        o = (x0 - xb) + rng.uniform(0, 1, (S, K)).astype(np.float32)
        wy = rng.uniform(0, 1, (S, K)).astype(np.float32)
        wl = rng.uniform(0, 1, (S, K)).astype(np.float32)
        packed[:, :, l] = ((row + roff) << 16) | xb
        of[:, :, l] = o
        wyv[:, :, l] = wy
        wlv[:, :, l] = wl
        v = rng.standard_normal((S, R, Wp, LANES)).astype(np.float32)
        val_cat[:, roff: roff + R, :Wp] = v
        checks.append((row, x0, o, wy, wl, v))
        roff += R

    def prep(a):
        flat = a.reshape(S, KK)
        out = np.zeros((S, KKPAD), a.dtype)
        out[:, :KK] = flat
        return out.reshape(S, NCH, CHUNK // GROUP, GROUP)

    args = (jnp.asarray(prep(packed)), jnp.asarray(prep(of)),
            jnp.asarray(prep(wyv)), jnp.asarray(prep(wlv)),
            jnp.asarray(val_cat, jnp.bfloat16))
    fn = build_fold(levels, S, NCH, CHUNK)

    def runner(n):
        t0 = time.perf_counter()
        out, vv = None, args[4]
        for _ in range(n):
            out = fn(args[0], args[1], args[2], args[3], vv)
            vv = vv + (out[0, 0, 0, 0] * jnp.asarray(0, vv.dtype))
        float(jax.device_get(out[0, 0, 0, 0].astype(jnp.float32)))
        return time.perf_counter() - t0

    runner(2)
    t1, t2 = runner(6), runner(18)
    per = (t2 - t1) / 12
    out = np.asarray(fn(*args), np.float32).reshape(S, KKPAD // FOLD, LANES)
    s, k = 3, 777
    ref = ref_point(checks, s, k)
    got = out[s, k, :64]
    err = np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-6)
    # dup-lane property
    dup = np.max(np.abs(out[s, k, :64] - out[s, k, 64:]))
    print(f"{name} fold: {per * 1e3:.3f} ms/call "
          f"({per / (S * K * L) * 1e9:.2f} ns/pt)  rel_err={err:.4f} "
          f"dup_err={dup:.4f}")


if __name__ == "__main__":
    main()
