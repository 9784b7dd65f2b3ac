"""Round-5 v8: why is the production fold kernel 11.4 ns/pt vs base 7.3?

The v7 integration profile (fused gather ON): image fold 94.4 ms/step and
BEV folds 39.4 ms each — BOTH at 11.4 ns/pt, i.e. the extra cost is in the
per-group fold EPILOGUE, not the val-map size. Suspects, per group of 128:
  - THREE [1,128]->[128,1] lane->sublane transposes (of, wy, wl) vs the
    base kernel's one,
  - the f32 [128,128] -> [32,4,128] strided sublane reshape-sum,
  - the f32 promotion of acc for the y-mix.

Variants (VARIANTS env):
  base       production `_kernel` (per-point floor reference; no fold)
  fold       production `_make_fold_kernel` (current integration)
  fold_mxu   y-mix + wl + fold-sum as TWO small MXU matmuls built from
             LANE vectors (no wy/wl transposes): A = F * a_row, B = F *
             b_row with F the constant [GO, G] 0/1 fold mask;
             out = A @ acc + B @ roll(acc, 64). Lanes >= 64 of the result
             are garbage (consumer reads [:64]); store stays full-tile.
  fold_1tp   single stacked [8, G] -> [G, 8] transpose carrying
             (of, a, b) instead of three separate ones.

Shapes: the flagship image site (S=32, K=43200, R=792, Wp=192, fold=4) —
the case that regressed. All variants share inputs; fold outputs are
checked against a numpy oracle point.

Usage: VARIANTS=base,fold,fold_mxu python gather_v8_fold_variants.py
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

from racformer_tpu.ops.gather_kernel import (  # noqa: E402
    GROUP, LANES, _chunk_layout, _kernel, _make_fold_kernel)
from racformer_tpu.ops.scatter_kernel import WIN, pad_chunks  # noqa: E402

S, K, R, WP = 32, 43200, 792, 192
FOLD = 4
CHUNK, NCH, KPAD = _chunk_layout(K)
GO = GROUP // FOLD


def make_fold_mxu_kernel(fold, win=WIN, bf16_ab=False):
    go = GROUP // fold
    # constant 0/1 fold mask [GO, G]: F[i, j] = 1 iff j // fold == i
    def kernel(packed_ref, of_ref, a_ref, b_ref, val_ref, out_ref,
               scratch_ref):
        ng = packed_ref.shape[2]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, win), 1).astype(jnp.float32)
        io = jax.lax.broadcasted_iota(jnp.int32, (go, GROUP), 0)
        jo = jax.lax.broadcasted_iota(jnp.int32, (go, GROUP), 1)
        fdt = jnp.bfloat16 if bf16_ab else jnp.float32
        fmask = (jo // fold == io).astype(fdt)               # [GO, G]

        def body(g, _):
            base = pl.multiple_of(g * go, go)
            for j in range(GROUP):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, win), :]
            of = jnp.transpose(of_ref[0, 0, pl.ds(g, 1), :], (1, 0))
            hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0)
            acc = jnp.sum(
                scratch_ref[:, :, :] * hat[:, :, None].astype(
                    scratch_ref.dtype), axis=1)              # [G, LANES]
            # y-mix + wl + fold-sum as two [GO, G] @ [G, LANES] matmuls:
            # out[i, c<64] = sum_j A[i,j] acc[j,c] + B[i,j] acc[j,c+64]
            # with A/B built from LANE vectors (no transposes)
            arow = a_ref[0, 0, pl.ds(g, 1), :].astype(fdt)   # [1, G]
            brow = b_ref[0, 0, pl.ds(g, 1), :].astype(fdt)
            A = fmask * arow
            B = fmask * brow
            accf = acc if bf16_ab else acc.astype(jnp.float32)
            mixed = (
                jax.lax.dot(A, accf, preferred_element_type=jnp.float32)
                + jax.lax.dot(B, pltpu.roll(accf, shift=LANES // 2, axis=1),
                              preferred_element_type=jnp.float32))
            out_ref[0, 0, pl.ds(base, go), :] = mixed.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def make_base_kernel(win):
    """Production `_kernel` with a parametrized window width (WIN=8 pairs
    with the half-shifted doubled map: points whose x0 % 8 == 7 index the
    second map copy, shifted left by 4 columns, so both bilinear columns
    always land in an 8-aligned [win=8] window — half the staged bytes)."""

    def kernel(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
        ng = packed_ref.shape[2]

        def body(g, _):
            base = pl.multiple_of(g * GROUP, GROUP)
            for j in range(GROUP):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, win), :]
            of = of_ref[0, 0, pl.ds(g, 1), :]
            ofc = jnp.transpose(of, (1, 0))
            col = jax.lax.broadcasted_iota(
                jnp.int32, (GROUP, win), 1).astype(jnp.float32)
            w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)
            acc = jnp.sum(
                scratch_ref[:, :, :] * w[:, :, None].astype(
                    scratch_ref.dtype), axis=1)
            out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def make_fold_1tp_kernel(fold):
    go = GROUP // fold

    def kernel(packed_ref, tri_ref, val_ref, out_ref, scratch_ref):
        ng = packed_ref.shape[2]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        lane_hi = (jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1)
                   // (LANES // 2)).astype(jnp.float32)

        def body(g, _):
            base = pl.multiple_of(g * go, go)
            for j in range(GROUP):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
            tri = jnp.transpose(tri_ref[0, g, :, :], (1, 0))  # [G, 8]
            of = tri[:, 0:1]
            a = tri[:, 1:2]
            b = tri[:, 2:3]
            hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0)
            acc = jnp.sum(
                scratch_ref[:, :, :] * hat[:, :, None].astype(
                    scratch_ref.dtype), axis=1)
            yw = a + lane_hi * (b - a)
            tot = jnp.sum(
                (acc.astype(jnp.float32) * yw).reshape(go, fold, LANES),
                axis=1)
            mixed = tot + pltpu.roll(tot, shift=LANES // 2, axis=1)
            out_ref[0, 0, pl.ds(base, go), :] = mixed.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def make_gkernels(group):
    """base and fold_mxu with a parametrized GROUP (points per reduction
    row). GROUP=256 halves the per-group overheads (of-transpose, loop
    bookkeeping, reduce setup, store count) at 2x the scratch."""

    def base_kernel(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
        ng = packed_ref.shape[2]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group, WIN), 1).astype(jnp.float32)

        def body(g, _):
            base = pl.multiple_of(g * group, group)
            for j in range(group):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
            ofc = jnp.transpose(of_ref[0, 0, pl.ds(g, 1), :], (1, 0))
            w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)
            acc = jnp.sum(
                scratch_ref[:, :, :] * w[:, :, None].astype(
                    scratch_ref.dtype), axis=1)
            out_ref[0, 0, pl.ds(base, group), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    def mxu_kernel_maker(fold):
        go = group // fold
        io = None

        def kernel(packed_ref, of_ref, a_ref, b_ref, val_ref, out_ref,
                   scratch_ref):
            ng = packed_ref.shape[2]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (group, WIN), 1).astype(jnp.float32)
            io_ = jax.lax.broadcasted_iota(jnp.int32, (go, group), 0)
            jo_ = jax.lax.broadcasted_iota(jnp.int32, (go, group), 1)
            fmask = (jo_ // fold == io_).astype(jnp.float32)

            def body(g, _):
                base = pl.multiple_of(g * go, go)
                for j in range(group):
                    v = packed_ref[0, 0, g, j]
                    row = jax.lax.shift_right_logical(v, 16)
                    xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                    scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
                of = jnp.transpose(of_ref[0, 0, pl.ds(g, 1), :], (1, 0))
                hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0)
                acc = jnp.sum(
                    scratch_ref[:, :, :] * hat[:, :, None].astype(
                        scratch_ref.dtype), axis=1)
                arow = a_ref[0, 0, pl.ds(g, 1), :]
                brow = b_ref[0, 0, pl.ds(g, 1), :]
                accf = acc.astype(jnp.float32)
                mixed = (
                    jax.lax.dot(fmask * arow, accf,
                                preferred_element_type=jnp.float32)
                    + jax.lax.dot(fmask * brow,
                                  pltpu.roll(accf, shift=LANES // 2, axis=1),
                                  preferred_element_type=jnp.float32))
                out_ref[0, 0, pl.ds(base, go), :] = mixed.astype(
                    out_ref.dtype)
                return 0

            jax.lax.fori_loop(0, ng, body, 0)

        return kernel

    return base_kernel, mxu_kernel_maker


def make_base_a4_kernel(win):
    """WIN=8 with 4-ALIGNED window starts (no map doubling): xb =
    (x0 // 4) * 4 puts both bilinear columns in [xb, xb+8) always. Probes
    whether Mosaic accepts sub-8 dynamic sublane alignment on bf16 tiles."""

    def kernel(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
        ng = packed_ref.shape[2]

        def body(g, _):
            base = pl.multiple_of(g * GROUP, GROUP)
            for j in range(GROUP):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 4)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, win), :]
            of = of_ref[0, 0, pl.ds(g, 1), :]
            ofc = jnp.transpose(of, (1, 0))
            col = jax.lax.broadcasted_iota(
                jnp.int32, (GROUP, win), 1).astype(jnp.float32)
            w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)
            acc = jnp.sum(
                scratch_ref[:, :, :] * w[:, :, None].astype(
                    scratch_ref.dtype), axis=1)
            out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def specs(n_vmem_pts, rows=R, win=WIN):
    NG = CHUNK // GROUP
    ins = [pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                        memory_space=pltpu.SMEM)]
    ins += [pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM)] * n_vmem_pts
    ins += [pl.BlockSpec((1, rows, WP, LANES), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM)]
    return ins


def build(which):
    NG = CHUNK // GROUP
    if which == "base":
        kern, nv, out_rows = _kernel, 1, CHUNK
    elif which == "fold":
        kern, nv, out_rows = _make_fold_kernel(FOLD), 3, CHUNK // FOLD
    elif which == "fold_mxu":
        kern, nv, out_rows = make_fold_mxu_kernel(FOLD), 3, CHUNK // FOLD
    elif which == "fold_mxu_bf16":
        kern, nv, out_rows = (make_fold_mxu_kernel(FOLD, bf16_ab=True), 3,
                              CHUNK // FOLD)
    elif which in ("base_g256", "fold_mxu_g256"):
        g2 = 256
        ng2 = CHUNK // g2
        bk, mk = make_gkernels(g2)
        if which == "base_g256":
            kern, nv, out_rows = bk, 1, CHUNK
        else:
            kern, nv, out_rows = mk(FOLD), 3, CHUNK // FOLD
        ins = [pl.BlockSpec((1, 1, ng2, g2), lambda s, ch: (s, ch, 0, 0),
                            memory_space=pltpu.SMEM)]
        ins += [pl.BlockSpec((1, 1, ng2, g2), lambda s, ch: (s, ch, 0, 0),
                             memory_space=pltpu.VMEM)] * nv
        ins += [pl.BlockSpec((1, R, WP, LANES), lambda s, ch: (s, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            kern,
            grid=(S, NCH),
            in_specs=ins,
            out_specs=pl.BlockSpec((1, 1, out_rows, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, out_rows, LANES),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((g2, WIN, LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )
    elif which in ("base_w8", "base_w8a4", "fold_mxu_w8"):
        win = 8
        rows = 2 * R if which == "base_w8" else R
        if which == "fold_mxu_w8":
            kern, nv, out_rows = (make_fold_mxu_kernel(FOLD, win=win), 3,
                                  CHUNK // FOLD)
            rows = 2 * R
        elif which == "base_w8":
            kern, nv, out_rows = make_base_kernel(win), 1, CHUNK
        else:
            kern, nv, out_rows = make_base_a4_kernel(win), 1, CHUNK
        return pl.pallas_call(
            kern,
            grid=(S, NCH),
            in_specs=specs(nv, rows=rows, win=win),
            out_specs=pl.BlockSpec((1, 1, out_rows, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, out_rows, LANES),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((GROUP, win, LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )
    elif which == "fold_1tp":
        ins = [pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                            memory_space=pltpu.SMEM),
               pl.BlockSpec((1, NG, 8, GROUP), lambda s, ch: (s, ch, 0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((1, R, WP, LANES), lambda s, ch: (s, 0, 0, 0),
                            memory_space=pltpu.VMEM)]
        return pl.pallas_call(
            make_fold_1tp_kernel(FOLD),
            grid=(S, NCH),
            in_specs=ins,
            out_specs=pl.BlockSpec((1, 1, CHUNK // FOLD, LANES),
                                   lambda s, ch: (s, ch, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NCH, CHUNK // FOLD, LANES),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )
    else:
        raise ValueError(which)
    return pl.pallas_call(
        kern,
        grid=(S, NCH),
        in_specs=specs(nv),
        out_specs=pl.BlockSpec((1, 1, out_rows, LANES),
                               lambda s, ch: (s, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, NCH, out_rows, LANES),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
    )


def main():
    rng = np.random.default_rng(0)
    val = rng.standard_normal((S, R, WP, LANES), np.float32).astype(
        np.float32)
    rows = rng.integers(0, R, (S, K)).astype(np.int32)
    x0 = rng.integers(0, WP - WIN, (S, K)).astype(np.int32)
    wx = rng.random((S, K), np.float32)
    wy = rng.random((S, K), np.float32)
    wl = rng.random((S, K), np.float32)

    xb = (x0 // 8) * 8
    o = (x0 - xb).astype(np.float32)

    def prep(a):
        return pad_chunks(jnp.asarray(a), KPAD).reshape(
            S, NCH, CHUNK // GROUP, GROUP)

    packed = prep((rows.astype(np.int32) << 16) | xb)
    of = prep(o + wx)
    wyp = prep(wy)
    wlp = prep(wl)
    a_p = prep((1.0 - wy) * wl)
    b_p = prep(wy * wl)
    valj = jnp.asarray(val, jnp.bfloat16)

    # half-shifted doubled map (w8): map2[r, c] = map1[r, c+4]; points with
    # x0 % 8 == 7 use map2 at x0-4 so both bilinear columns land in an
    # 8-aligned [8]-wide window
    val2 = np.concatenate(
        [val, np.pad(val[:, :, 4:], ((0, 0), (0, 0), (0, 4), (0, 0)))],
        axis=1)
    sel = (x0 % 8 == 7)
    rows8 = rows + R * sel
    x08 = x0 - 4 * sel
    xb8 = (x08 // 8) * 8
    o8 = (x08 - xb8).astype(np.float32)
    packed8 = prep((rows8.astype(np.int32) << 16) | xb8)
    of8 = prep(o8 + wx)
    val2j = jnp.asarray(val2, jnp.bfloat16)

    # 4-aligned single-map variant: xb = (x0 // 4) * 4, o in [0, 3]
    xb4 = (x0 // 4) * 4
    o4 = (x0 - xb4).astype(np.float32)
    packed4 = prep((rows.astype(np.int32) << 16) | xb4)
    of4 = prep(o4 + wx)

    # stacked (of, a, b) for fold_1tp: [S, NCH, 8, GROUP] per ng... layout
    # [S, NG_total, 8, GROUP] then blocked (1, NG, 8, GROUP)
    NG = CHUNK // GROUP
    tri = np.zeros((S, NCH * NG, 8, GROUP), np.float32)
    tri[:, :, 0] = np.asarray(of).reshape(S, NCH * NG, GROUP)
    tri[:, :, 1] = np.asarray(a_p).reshape(S, NCH * NG, GROUP)
    tri[:, :, 2] = np.asarray(b_p).reshape(S, NCH * NG, GROUP)
    trij = jnp.asarray(tri)

    def timed(fn, args):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)

        def run(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = f(*args)
            jax.block_until_ready(o)
            return time.perf_counter() - t0

        t1, t2 = run(8), run(24)
        return (t2 - t1) / 16, out

    # numpy oracle for fold variants at a probe point
    def oracle(s, i):
        tot = np.zeros(LANES // 2, np.float64)
        for f in range(FOLD):
            k = i * FOLD + f
            w = val[s, rows[s, k]].astype(np.float64)
            xx = x0[s, k]
            v = w[xx] * (1 - wx[s, k]) + w[xx + 1] * wx[s, k]
            mixed = v[:64] * (1 - wy[s, k]) + v[64:] * wy[s, k]
            tot += mixed * wl[s, k]
        return tot

    which = os.environ.get("VARIANTS", "base,fold,fold_mxu,fold_1tp")
    for name in which.split(","):
        fn = build(name)
        if name == "base":
            args = (packed, of, valj)
        elif name == "base_w8":
            args = (packed8, of8, val2j)
        elif name == "base_w8a4":
            args = (packed4, of4, valj)
        elif name == "fold_1tp":
            args = (packed, trij, valj)
        elif name in ("fold_mxu", "fold_mxu_bf16"):
            args = (packed, of, a_p, b_p, valj)
        elif name in ("base_g256", "fold_mxu_g256"):
            r2 = lambda x: x.reshape(S, NCH, CHUNK // 256, 256)  # noqa: E731
            if name == "base_g256":
                args = (r2(packed), r2(of), valj)
            else:
                args = (r2(packed), r2(of), r2(a_p), r2(b_p), valj)
        elif name == "fold_mxu_w8":
            args = (packed8, of8, a_p, b_p, val2j)
        else:
            args = (packed, of, wyp, wlp, valj)
        try:
            per, out = timed(fn, args)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {str(e)[:4000]}")
            continue
        msg = ""
        if name.startswith("base"):
            # per-point x-lerp oracle (y-paired, all 128 lanes); probe a
            # point with x0 % 8 == 7 to exercise the shifted-map path
            got = np.asarray(out[0, 0], np.float32)
            ks = [777] + [int(np.nonzero(x0[0] % 8 == 7)[0][0])]
            errs = []
            for k in ks:
                w = val[0, rows[0, k]].astype(np.float64)
                ref = (w[x0[0, k]] * (1 - wx[0, k])
                       + w[x0[0, k] + 1] * wx[0, k])
                errs.append(np.abs(got[k] - ref).max()
                            / (np.abs(ref).max() + 1e-6))
            msg = f"  rel_err={max(errs):.5f}"
        else:
            got = np.asarray(out[0, 0], np.float32).reshape(-1, LANES)
            ref = oracle(0, 777)
            err = np.abs(got[777, :64] - ref).max() / (
                np.abs(ref).max() + 1e-6)
            msg = f"  rel_err={err:.5f}"
        print(f"{name}: {per * 1e3:.3f} ms/call "
              f"({per / (S * K) * 1e9:.2f} ns/pt){msg}", flush=True)


if __name__ == "__main__":
    main()
