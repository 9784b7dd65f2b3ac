"""Pallas TPU scatter-add kernel: the backward of the bilinear patch gather.

XLA's transpose of the sampling gathers is a scatter-add of (1, 1, 2, 2C)
slices, measured at ~4.6 us/patch on v5e — it dominated the round-1 train
step (6.7 s of 8.8 s; the reference's hand-written equivalent is the
atomicAdd backward in `models/csrc/msmv_sampling/msmv_sampling_backward.cu:68-104`).
This kernel keeps the whole per-slab gradient map RESIDENT IN VMEM (v5e has
128 MB; measured in docs/experiments/pallas_scatter_v1.py at ~41 ns/patch,
~112x XLA):

  - per group of GROUP points, the x-lerp hat weights are built IN-KERNEL
    from one packed (offset + wx) float per point — the same
    `relu(1 - |col - of|)` idiom as the gather kernel. (The original design
    prebuilt a block-diagonal A-matrix in XLA and MXU-expanded
    `A^T @ g`; at flagship train shapes that operand is
    [S, NCH, CHUNK, GROUP*WIN] bf16 ~ 2 GB PER CALL, written by an XLA
    fusion and re-read by the kernel — the round-4 profile showed the two
    BEV-site scatter calls at 69 ms each per decoder iteration, dominated
    by exactly this staging.)
  - one read-modify-write of an 8-aligned [WIN, 128] window per point
    (dynamic sublane starts must be 8-aligned on Mosaic, so windows start
    at (x//8)*8 and the hat weight carries the in-window offset), updated
    with the point's [WIN, 1] x [1, LANES] outer product.

Grid = (slabs, chunks); the gradient-map block persists across the chunk
dimension and is zeroed at chunk 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 16          # window width: covers x, x+1 for any (x//8)*8 start
GROUP = 64        # points per MXU expansion. Swept at the production BEV
                  # backward shape ([8, 524, 152, 128] map, K=123600):
                  # 8 -> 37, 16 -> 23, 32 -> 17, 64 -> 12.7 ns/patch,
                  # 128 -> VMEM OOM (the [chunk, GROUP*WIN] A-matrix block)
LANES = 128       # y-fused channels (2C); all sampling call sites have C=64


def _kernel(rowxb_ref, of_ref, g_ref, out_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0, :, :, :] = jnp.zeros_like(out_ref[0])

    ng = of_ref.shape[2]

    def body(grp, _):
        base = pl.multiple_of(grp * GROUP, GROUP)
        # hat weights, point-major in LANES: wT[c, j] puts (1-wx_j) at
        # column o_j and wx_j at o_j+1, zero elsewhere (gather-kernel idiom;
        # padding points ride along with g=0 so their windows add zeros)
        of = of_ref[0, 0, pl.ds(grp, 1), :]                 # [1, G]
        col = jax.lax.broadcasted_iota(
            jnp.int32, (WIN, GROUP), 0).astype(jnp.float32)
        wT = jnp.maximum(1.0 - jnp.abs(col - of), 0.0)      # [WIN, G]
        gg = g_ref[0, 0, pl.ds(base, GROUP), :].astype(jnp.float32)
        for j in range(GROUP):
            row = rowxb_ref[0, 0, 0, base + j]
            xb = pl.multiple_of(rowxb_ref[0, 0, 1, base + j], 8)
            upd = wT[:, j:j + 1] * gg[j:j + 1, :]           # [WIN, LANES]
            out_ref[0, row, pl.ds(xb, WIN), :] += upd
        return 0

    jax.lax.fori_loop(0, ng, body, 0)


def _scatter_pallas(
    rowxb: jax.Array,
    of: jax.Array,
    gfused: jax.Array,
    rows: int,
    wpad: int,
    chunk: int,
    interpret: bool = False,
) -> jax.Array:
    """Accumulate per-point window updates into per-slab gradient maps.

    Args:
      rowxb: [S, NCH, 2, CHUNK] int32 — (row, window start) per point; the
        row index folds any sub-slab axis (head/view/level) that the gather
        folded into its leading index.
      of: [S, NCH, NG, GROUP] float32 — in-window x offset + wx per point
        (NG * GROUP = CHUNK; the [NG, GROUP] shape keeps the operand
        T(8,128)-tileable like the gather kernel's).
      gfused: [S, NCH, CHUNK, LANES] bf16 — cotangent in y-fused channels
        (zero rows for padding points).
      rows, wpad: gradient-map extent per slab.

    Returns [S, rows, wpad, LANES] float32.
    """
    S, NCH = rowxb.shape[0], rowxb.shape[1]
    ng = of.shape[2]
    return pl.pallas_call(
        _kernel,
        grid=(S, NCH),
        in_specs=[
            pl.BlockSpec((1, 1, 2, chunk), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ng, GROUP), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, LANES), lambda s, ch: (s, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, wpad, LANES),
                               lambda s, ch: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, rows, wpad, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(rowxb, of, gfused)


scatter_patch_grads = functools.partial(
    jax.jit, static_argnums=(3, 4, 5, 6))(_scatter_pallas)


def slab_partitioned(impl, static_argnums, sharding_rule,
                     need_replication_factors):
    """GSPMD-aware wrapper for slab-parallel Pallas kernels: a bare
    `pallas_call` is an opaque custom call to the SPMD partitioner, which
    REPLICATES it — on a data-parallel mesh every chip would all-gather the
    operands (the scatter's amat alone is [S, NCH, CHUNK, GROUP*WIN] bf16,
    hundreds of MB at flagship point counts) and run the full kernel once
    per chip. Both patch kernels are embarrassingly parallel over their
    slab grid axis, so `custom_partitioning` shards every operand and the
    result on dim 0 and runs the kernel on local slabs only. Used on the
    batch-local paths (`bilinear.resolve_batch_local`); single-chip paths
    keep the plain calls. `sharding_rule` is the Shardy einsum-style factor
    map whose FIRST factor is the slab axis; every other factor is
    kernel-internal layout (or accumulates across the grid) and must be
    listed in `need_replication_factors`."""
    from jax.experimental.custom_partitioning import custom_partitioning

    from jax.sharding import NamedSharding, PartitionSpec as P

    cp = custom_partitioning(impl, static_argnums=static_argnums)

    def _slab_axis(mesh, arg_infos):
        spec = getattr(arg_infos[0].sharding, "spec", None)
        if not spec or spec[0] is None:
            return None
        axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
        n = int(np.prod([mesh.shape[a] for a in axes]))
        if arg_infos[0].shape[0] % n:
            return None
        return spec[0]

    def _warn_replicated(mesh, arg_infos):
        # the downgrade is legal but catastrophic for bandwidth (every chip
        # all-gathers the full operands and runs the whole kernel); it must
        # never happen silently — the slab count not dividing the mesh, or
        # the partitioner leaving dim 0 unsharded, are config bugs
        import warnings

        if mesh.size > 1:
            warnings.warn(
                f"slab_partitioned({getattr(impl, '__name__', impl)}): dim-0 "
                f"sharding unusable (operand0 shape {arg_infos[0].shape[0]} "
                f"rows over spec {getattr(arg_infos[0].sharding, 'spec', None)}"
                f" on mesh {dict(mesh.shape)}) — falling back to REPLICATED "
                f"execution on every chip", stacklevel=2)

    def partition(*args):
        statics, (mesh, arg_infos, result_infos) = args[:-3], args[-3:]
        slab = _slab_axis(mesh, arg_infos)
        if slab is None:
            _warn_replicated(mesh, arg_infos)

        def spec_for(info):
            return NamedSharding(
                mesh, P(slab, *([None] * (len(info.shape) - 1))))

        def lower(*operands):
            return impl(*operands, *statics)

        return (mesh, lower, spec_for(result_infos),
                tuple(spec_for(a) for a in arg_infos))

    def infer_sharding_from_operands(*args):
        # GSPMD (non-Shardy) propagation path: without this callback a
        # jax_use_shardy_partitioner=False run aborts in C++ (the rule above
        # is Shardy-only). Result inherits operand 0's dim-0 sharding.
        mesh, arg_infos, result_info = args[-3:]
        slab = _slab_axis(mesh, arg_infos)
        shape = (result_info.shape if hasattr(result_info, "shape")
                 else result_info[0].shape)
        return NamedSharding(mesh, P(slab, *([None] * (len(shape) - 1))))

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        # propagate_user_sharding stays None: the framework then passes the
        # consumer's sharding through unchanged, which is exactly right —
        # partition() re-derives the slab split from the operands regardless
        sharding_rule=sharding_rule,
        need_replication_factors=need_replication_factors,
    )
    return cp


scatter_patch_grads_sharded = slab_partitioned(
    _scatter_pallas, static_argnums=(3, 4, 5, 6),
    # only the slab factor `s` may be sharded: chunks (n, k) accumulate into
    # one output map and the group/lane factors are internal layout
    sharding_rule="s n t k, s n g p, s n k l -> s r w l",
    need_replication_factors=("n", "t", "k", "g", "p", "l", "r", "w"),
)


def pad_chunks(x: jax.Array, kpad: int, fill=0, axis: int = -1):
    """Pad `axis` (default last) of x from K to kpad."""
    axis = axis % x.ndim
    K = x.shape[axis]
    if K == kpad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, kpad - K)
    return jnp.pad(x, widths, constant_values=fill)


def chunk_layout(K: int, max_chunk: int = 1216):
    """Pick (chunk, nch, kpad) for K points per slab.

    chunk MUST be a multiple of GROUP: the kernel iterates chunk // GROUP
    groups, so a non-multiple silently drops the chunk tail's gradients
    (this bit when GROUP moved to 64 under the old max_chunk=1200)."""
    assert max_chunk >= GROUP, (max_chunk, GROUP)
    max_chunk = (max_chunk // GROUP) * GROUP
    if K >= max_chunk:
        nch = int(np.ceil(K / max_chunk))
        return max_chunk, nch, max_chunk * nch
    chunk = int(np.ceil(K / GROUP)) * GROUP
    return chunk, 1, chunk
