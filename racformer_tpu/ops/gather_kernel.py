"""Pallas TPU gather kernel: the forward of the bilinear patch sample.

TPU counterpart of the reference's fused CUDA sampler
(`models/csrc/msmv_sampling/msmv_sampling_forward.cu:27-164` and mmcv's
`ms_deform_attn` forward): for each point, fetch the 2x2 bilinear patch and
apply the x-lerp, returning the y-fused (top-row / bottom-row in channel
halves) value; the cheap y-mix happens in XLA.

Design notes (all measured on v5e, docs/experiments/pallas_gather_v5.py and
the production profile):
  - operand is the y-fused map [S, R, Wpad, 128] bf16 — one row per patch —
    resident in VMEM per grid slab,
  - kernel inputs avoid the tiny-lane layouts XLA stages pathologically
    (measured 27 ms of async scratch slices for a 40 ms call): (row, xb)
    pack into ONE int32 SMEM word per point and (offset + wx) into one f32,
  - per point, the 8-aligned window `val[row, xb:xb+16, :]` is staged RAW
    into a [GROUP, WIN, 128] scratch; the x-lerp is ONE bulk
    multiply + sublane reduction per group (w built once per group from a
    lane->sublane transpose of the fused offsets).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scatter_kernel import WIN, pad_chunks, slab_partitioned

GROUP = 128  # points per reduction row; scratch = [WIN, GROUP*128]; dynamic
             # lane starts must be 128-aligned on Mosaic, so GROUP >= 128
LANES = 128  # y-fused channels (2C); all production call sites have C=64


def _chunk_layout(K: int, max_chunk: int = 4864, group: int = GROUP):
    """(chunk, nch, kpad) with chunk a multiple of the kernel's reduction
    group.

    Chunks are BALANCED: nch is fixed by max_chunk, then the chunk size
    shrinks to just cover K — e.g. K=10800 (the image sampler's per-slab
    point count) gets 3x3712 (3% padding) instead of 3x4864 (35% padded
    points, each a full window fetch + reduce of garbage)."""
    nch = max(1, int(np.ceil(K / max_chunk)))
    chunk = int(np.ceil(K / nch / group)) * group
    return chunk, nch, chunk * nch


def _kernel(packed_ref, of_ref, val_ref, out_ref, scratch_ref):
    ng = packed_ref.shape[2]

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
            scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
        of = of_ref[0, 0, pl.ds(g, 1), :]                    # [1, G] lanes
        ofc = jnp.transpose(of, (1, 0))                      # [G, 1] sublanes
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        # bilinear hat: w[c] = relu(1 - |c - (o + wx)|) puts exactly 1-wx at
        # column o and wx at o+1, zero elsewhere — no boolean masks (Mosaic
        # cannot relayout the i1 compare results these shapes need)
        w = jnp.maximum(1.0 - jnp.abs(col - ofc), 0.0)       # [G, WIN]
        acc = jnp.sum(
            scratch_ref[:, :, :] * w[:, :, None].astype(scratch_ref.dtype),
            axis=1)                                          # [G, LANES]
        out_ref[0, 0, pl.ds(base, GROUP), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def _kernel_corners(packed_ref, o_ref, val_ref, out_ref, scratch_ref):
    """Like `_kernel` but returns BOTH x-columns un-lerped: out lanes
    [0, LANES) = column o, [LANES, 2*LANES) = column o+1. One call replaces
    the backward's two wx=0/wx=1 re-gathers (same window staging, two cheap
    selections)."""
    ng = packed_ref.shape[2]

    def body(g, _):
        base = pl.multiple_of(g * GROUP, GROUP)
        for j in range(GROUP):
            v = packed_ref[0, 0, g, j]
            row = jax.lax.shift_right_logical(v, 16)
            xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
            scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
        o = o_ref[0, 0, pl.ds(g, 1), :]                      # [1, G] lanes
        oc = jnp.transpose(o, (1, 0))                        # [G, 1] sublanes
        col = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, WIN), 1).astype(jnp.float32)
        w0 = jnp.maximum(1.0 - jnp.abs(col - oc), 0.0)       # 1 at col o
        w1 = jnp.maximum(1.0 - jnp.abs(col - (oc + 1.0)), 0.0)
        sc = scratch_ref[:, :, :]
        acc0 = jnp.sum(sc * w0[:, :, None].astype(sc.dtype), axis=1)
        acc1 = jnp.sum(sc * w1[:, :, None].astype(sc.dtype), axis=1)
        out_ref[0, 0, pl.ds(base, GROUP), :LANES] = acc0.astype(out_ref.dtype)
        out_ref[0, 0, pl.ds(base, GROUP), LANES:] = acc1.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def _gather_corners_pallas(
    packed: jax.Array,
    o: jax.Array,
    val: jax.Array,
    chunk: int,
    interpret: bool = False,
) -> jax.Array:
    """Un-lerped (column o, column o+1) row-pair fetches; operands as in
    `_gather_pallas` except `o` carries the integer in-window offset only.
    Returns [S, NCH, CHUNK, 2*LANES]."""
    S, NCH, NG = packed.shape[0], packed.shape[1], packed.shape[2]
    R, WPAD = val.shape[1], val.shape[2]
    return pl.pallas_call(
        _kernel_corners,
        grid=(S, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, WPAD, LANES), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, 2 * LANES),
                               lambda s, ch: (s, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, NCH, chunk, 2 * LANES), val.dtype),
        scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), val.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(packed, o, val)


gather_patch_corners = functools.partial(
    jax.jit, static_argnums=(3, 4))(_gather_corners_pallas)

gather_patch_corners_sharded = slab_partitioned(
    _gather_corners_pallas, static_argnums=(3, 4),
    sharding_rule="s n g p, s n g p, s r w l -> s n c m",
    need_replication_factors=("n", "g", "p", "r", "w", "l", "c", "m"),
)


def patch_corners_pallas(fused, view, y0p, x0p, batch_local=False):
    """All four bilinear corners per point via ONE kernel call: returns
    [*view.shape, 2*C2] with lanes [v00|v10] then [v01|v11] (y-fused pairs
    for columns x0 and x0+1). Backward-only helper
    (`bilinear._patch_sample_bwd_impl`)."""
    NS, R0, Wp, C2 = fused.shape
    assert C2 == LANES, C2
    assert Wp % 8 == 0, Wp
    S = view.shape[0]
    J = NS // S
    K = int(np.prod(view.shape[1:]))
    chunk, nch, kpad = _chunk_layout(K)

    val = fused.reshape(S, J * R0, Wp, C2)

    def prep(a):
        return pad_chunks(a.reshape(S, K), kpad).reshape(
            S, nch, chunk // GROUP, GROUP)

    row = (view.reshape(S, K) % J) * R0 + y0p.reshape(S, K)
    xb = (x0p.reshape(S, K) // 8) * 8
    o = (x0p.reshape(S, K) - xb).astype(jnp.float32)
    packed = prep((row << 16) | xb)
    of = prep(o)

    interpret = jax.default_backend() == "cpu"
    gather = (gather_patch_corners_sharded if batch_local
              else gather_patch_corners)
    res = gather(packed, of, val, chunk, interpret)
    res = res.reshape(S, nch * chunk, 2 * C2)[:, :K]
    return res.reshape(*view.shape, 2 * C2)


def _make_fold_kernel(fold: int, group: int = GROUP):
    """Fused-epilogue gather: stage + x-lerp like `_kernel`, then apply the
    per-point y-lerp and scalar weight (level/attention weight) and sum each
    `fold` consecutive points (level-interleaved image points /
    p-interleaved BEV attention points) — all via two small MXU matmuls
    against the constant fold mask (see in-body comment). Replaces the
    per-level kernel calls + the XLA y-mix/weighted-sum epilogues — the
    round-5 decode profile's 11.7 ms image epilogue fusion and the BEV
    relayout+slice+sum chains (~16 ms/step).

    Reference semantics being fused: the CUDA sampler's per-level weighted
    accumulation (`models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164`)
    and `ms_deform_attn`'s attention-weighted point sum."""

    def kernel(packed_ref, of_ref, a_ref, b_ref, val_ref, out_ref,
               scratch_ref):
        ng = packed_ref.shape[2]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (group, WIN), 1).astype(jnp.float32)
        go = group // fold
        io = jax.lax.broadcasted_iota(jnp.int32, (go, group), 0)
        jo = jax.lax.broadcasted_iota(jnp.int32, (go, group), 1)
        fmask = (jo // fold == io).astype(jnp.float32)       # [GO, G] 0/1

        def body(g, _):
            base = pl.multiple_of(g * go, go)
            for j in range(group):
                v = packed_ref[0, 0, g, j]
                row = jax.lax.shift_right_logical(v, 16)
                xb = pl.multiple_of(jax.lax.bitwise_and(v, 0xFFFF), 8)
                scratch_ref[j, :, :] = val_ref[0, row, pl.ds(xb, WIN), :]
            of = jnp.transpose(of_ref[0, 0, pl.ds(g, 1), :], (1, 0))
            hat = jnp.maximum(1.0 - jnp.abs(col - of), 0.0)
            # bulk reduce in the operand dtype exactly like `_kernel`
            # (promoting the [G, WIN, LANES] scratch to f32 cost +4.6 ns/pt)
            acc = jnp.sum(
                scratch_ref[:, :, :] * hat[:, :, None].astype(
                    scratch_ref.dtype), axis=1)          # [G, LANES] y-pair
            # y-mix + per-point weight + fold-sum as TWO small MXU matmuls
            # built from LANE vectors (a = (1-wy)*wl, b = wy*wl):
            #   out[i, c<64] = sum_{j in fold i} a_j acc[j,c] + b_j acc[j,c+64]
            # The v8 sweep (GROUP=256): 7.66 ns/pt vs 11.44 for the
            # transpose+reshape-sum form (3 lane->sublane transposes + a
            # strided sublane reduction), 8.83 at GROUP=128, and 7.56/7.18
            # for the bare `_kernel` at GROUP=128/256 — i.e. the fused
            # epilogue is cheaper than the XLA epilogues it replaces AND
            # cheaper than the per-level kernel it extends.
            # Lanes >= 64 of `mixed` are garbage (B picks up the rolled-in
            # top half); consumers read lanes [:64].
            arow = a_ref[0, 0, pl.ds(g, 1), :]               # [1, G] f32
            brow = b_ref[0, 0, pl.ds(g, 1), :]
            accf = acc.astype(jnp.float32)
            mixed = (
                jax.lax.dot(fmask * arow, accf,
                            preferred_element_type=jnp.float32)
                + jax.lax.dot(fmask * brow,
                              pltpu.roll(accf, shift=LANES // 2, axis=1),
                              preferred_element_type=jnp.float32))
            out_ref[0, 0, pl.ds(base, go), :] = mixed.astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, ng, body, 0)

    return kernel


def _gather_fold_pallas(
    packed: jax.Array,
    a: jax.Array,
    b: jax.Array,
    of: jax.Array,
    val: jax.Array,
    chunk: int,
    fold: int,
    group: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused-epilogue gather over interleaved points.

    packed/of: as `_gather_pallas` ([S, NCH, NG, GROUP]); a/b: premixed
    per-point weights a = (1-wy)*wl, b = wy*wl (wy the y lerp weight, wl
    the level-softmax / deform-attention weight). Returns
    [S, NCH, chunk // fold, LANES]; lanes [:64] hold the y-mixed
    fold-summed value, lanes [64:] are garbage (see kernel comment)."""
    S, NCH, NG = packed.shape[0], packed.shape[1], packed.shape[2]
    R, WPAD = val.shape[1], val.shape[2]
    return pl.pallas_call(
        _make_fold_kernel(fold, group),
        grid=(S, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, NG, group), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NG, group), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NG, group), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NG, group), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, WPAD, LANES), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk // fold, LANES),
                               lambda s, ch: (s, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, NCH, chunk // fold, LANES),
                                       val.dtype),
        scratch_shapes=[pltpu.VMEM((group, WIN, LANES), val.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(packed, of, a, b, val)


gather_patch_fold = functools.partial(
    jax.jit, static_argnums=(5, 6, 7, 8))(_gather_fold_pallas)

gather_patch_fold_sharded = slab_partitioned(
    _gather_fold_pallas, static_argnums=(5, 6, 7, 8),
    sharding_rule="s n g p, s n g p, s n g p, s n g p, s r w l -> s n c m",
    need_replication_factors=("n", "g", "p", "r", "w", "l", "c", "m"),
)


def patch_sample_fold(fused, row, x0p, wx, wy, wl, fold,
                      batch_local=False):
    """Fused-epilogue sample: per-point absolute fused-map `row` (caller
    folds camera/head/level offsets), 8-unaligned x0p, lerp weights and the
    scalar weight `wl`; every `fold` consecutive points are summed after
    weighting/y-mix. fused: [S, R, Wp, 2C]. Returns [S, K // fold, C] f32-
    promoted... (val dtype), lanes already y-mixed and fold-summed."""
    S, R, Wp, C2 = fused.shape
    assert C2 == LANES, C2
    assert Wp % 8 == 0, Wp
    K = int(np.prod(row.shape[1:]))
    assert K % fold == 0, (K, fold)
    # GROUP=256 for the fold form: halves the per-group overheads
    # (of-transpose, loop bookkeeping, store count) — 7.66 ns/pt vs 8.83 at
    # 128 (docs/experiments/gather_v8_fold_variants.py). Env override for
    # same-process A/B of larger groups (see BASELINE.md round 5)
    group = int(os.environ.get("RACFORMER_FOLD_GROUP", "256"))
    chunk, nch, kpad = _chunk_layout(K, group=group)
    assert chunk % fold == 0, (chunk, fold)

    def prep(a, dtype=None):
        a = a.reshape(S, K)
        if dtype is not None:
            a = a.astype(dtype)
        return pad_chunks(a, kpad).reshape(S, nch, chunk // group, group)

    xb = (x0p.reshape(S, K) // 8) * 8
    o = (x0p.reshape(S, K) - xb).astype(jnp.float32)
    packed = prep((row.reshape(S, K) << 16) | xb)
    of = prep(o + wx.reshape(S, K).astype(jnp.float32))
    wyf = wy.reshape(S, K).astype(jnp.float32)
    wlf = wl.reshape(S, K).astype(jnp.float32)
    a_p = prep((1.0 - wyf) * wlf)
    b_p = prep(wyf * wlf)

    interpret = jax.default_backend() == "cpu"
    gather = (gather_patch_fold_sharded if batch_local
              else gather_patch_fold)
    res = gather(packed, a_p, b_p, of, fused, chunk, fold, group, interpret)
    res = res.reshape(S, nch * chunk // fold, LANES)[:, : K // fold]
    return res[..., : LANES // 2]


def _gather_pallas(
    packed: jax.Array,
    of: jax.Array,
    val: jax.Array,
    chunk: int,
    interpret: bool = False,
) -> jax.Array:
    """x-lerped single-row patch fetches from per-slab y-fused maps.

    Args:
      packed: [S, NCH, NG, GROUP] int32 — (row << 16) | window_start per
        point; row folds any sub-slab axis (head / camera view) the caller
        folded into its gather index, window_start is 8-aligned. NG * GROUP
        = CHUNK; the [NG, GROUP] trailing shape (instead of [1, CHUNK])
        keeps the operand on a T(8,128)-tileable layout — the flat form
        staged through ~24 ms/step of T(1,128) relayout DMAs in the round-3
        decode profile.
      of: [S, NCH, NG, GROUP] float32 — x offset within the window + wx.
      val: [S, R, Wpad, LANES] — y-fused feature map with Wpad >= any
        window end (callers guarantee via `bilinear.aligned_width`).

    Returns [S, NCH, CHUNK, LANES] in val.dtype. Padding points return
    garbage rows the caller slices off.
    """
    S, NCH, NG = packed.shape[0], packed.shape[1], packed.shape[2]
    R, WPAD = val.shape[1], val.shape[2]
    return pl.pallas_call(
        _kernel,
        grid=(S, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, NG, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, WPAD, LANES), lambda s, ch: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, LANES),
                               lambda s, ch: (s, ch, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, NCH, chunk, LANES), val.dtype),
        scratch_shapes=[pltpu.VMEM((GROUP, WIN, LANES), val.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(packed, of, val)


gather_patch_rows = functools.partial(
    jax.jit, static_argnums=(3, 4))(_gather_pallas)

# GSPMD-partitioned form for multichip meshes: a bare pallas_call would be
# replicated (every chip all-gathers the fused maps and gathers ALL points);
# this shards operands/result over the slab axis (see
# scatter_kernel.slab_partitioned)
gather_patch_rows_sharded = slab_partitioned(
    _gather_pallas, static_argnums=(3, 4),
    sharding_rule="s n g p, s n g p, s r w l -> s n c l",
    need_replication_factors=("n", "g", "p", "r", "w", "l", "c"),
)


def patch_sample_pallas_raw(fused, view, y0p, x0p, wx, batch_local=False):
    """Kernel gather + x-lerp WITHOUT the final y half-mix: returns the
    y-fused pair [..., 2C] (top-row x-lerp in the first C channels, bottom
    row in the second). Forward-path helper for `patch_sample_pallas`; the
    custom-VJP backward's corner reconstruction uses the dedicated
    `patch_corners_pallas` (one un-lerped corner-pair call) instead.
    """
    NS, R0, Wp, C2 = fused.shape
    assert C2 == LANES, C2
    # callers guarantee Wp covers every 8-aligned 16-wide window
    # (`bilinear_sample_views_nhwc` pads to `aligned_width` when the map
    # builder didn't) — no per-call whole-map pad here
    assert Wp % 8 == 0, Wp
    S = view.shape[0]
    J = NS // S
    K = int(np.prod(view.shape[1:]))
    chunk, nch, kpad = _chunk_layout(K)

    val = fused.reshape(S, J * R0, Wp, C2)

    def prep(a):
        return pad_chunks(a.reshape(S, K), kpad).reshape(
            S, nch, chunk // GROUP, GROUP)

    row = (view.reshape(S, K) % J) * R0 + y0p.reshape(S, K)
    xb = (x0p.reshape(S, K) // 8) * 8
    o = (x0p.reshape(S, K) - xb).astype(jnp.float32)
    packed = prep((row << 16) | xb)
    of = prep(o + jnp.broadcast_to(wx, view.shape).reshape(S, K)
              .astype(jnp.float32))

    interpret = jax.default_backend() == "cpu"
    gather = gather_patch_rows_sharded if batch_local else gather_patch_rows
    res = gather(packed, of, val, chunk, interpret)
    res = res.reshape(S, nch * chunk, C2)[:, :K]
    return res.reshape(*view.shape, C2)


def patch_sample_pallas(fused, view, y0p, x0p, wx, wy, batch_local=False):
    """Drop-in forward for `ops.bilinear._patch_sample`: same (fused, view,
    y0p, x0p) contract as the XLA `_gather_patch` + `_lerp_patch` pair, with
    the gather + x-lerp in the Pallas kernel and only the y half-mix in XLA.

    Requires fused LANES channels (=128) and the blocked-views layout
    (points with leading batch index s only touch slabs [s*J, (s+1)*J)).
    """
    res = patch_sample_pallas_raw(fused, view, y0p, x0p, wx, batch_local)
    C = res.shape[-1] // 2
    wyd = wy.astype(res.dtype)[..., None]
    return res[..., :C] * (1 - wyd) + res[..., C:] * wyd
