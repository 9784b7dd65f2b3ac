"""Bilinear sampling core: the XLA gather + lerp primitive that replaces the
reference's CUDA samplers (`models/csrc/msmv_sampling/*.cu` and mmcv's
`ms_deform_attn`). Zero padding outside the image, per-corner masking, exactly
matching `torch.nn.functional.grid_sample(..., padding_mode='zeros')`.

TPU notes: all indices are flattened to one gather over [H*W, C] (or
[N*H*W, C]) so XLA lowers to a single dynamic-gather; the 4 corner gathers + 2
lerps fuse into the surrounding computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gather_hw(flat_feat: jax.Array, idx: jax.Array, ok: jax.Array) -> jax.Array:
    """flat_feat: [HW, C]; idx: [...]; ok: [...] bool -> [..., C] with zeros where !ok."""
    idx = jnp.where(ok, idx, 0)
    out = jnp.take(flat_feat, idx, axis=0)
    return out * ok[..., None].astype(out.dtype)


def bilinear_sample_nhwc(
    feat: jax.Array,
    x: jax.Array,
    y: jax.Array,
) -> jax.Array:
    """Sample `feat` [H, W, C] at continuous pixel coords x, y (any shape).

    Coordinates are in *pixel* space (callers apply align_corners conversion).
    Out-of-bounds corners contribute zero. Returns [..., C].
    """
    H, W, C = feat.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)
    wy = (y - y0).astype(feat.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = feat.reshape(H * W, C)

    def ok(xi, yi):
        return (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)

    def idx(xi, yi):
        return yi * W + xi

    v00 = _gather_hw(flat, idx(x0i, y0i), ok(x0i, y0i))
    v01 = _gather_hw(flat, idx(x1i, y0i), ok(x1i, y0i))
    v10 = _gather_hw(flat, idx(x0i, y1i), ok(x0i, y1i))
    v11 = _gather_hw(flat, idx(x1i, y1i), ok(x1i, y1i))

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


PAD = 2  # zero border used by the patch-gather (see bilinear_sample_views_nhwc)


def resolve_pallas(env_name: str, pallas: bool | None = None) -> bool:
    """Shared precedence for the Pallas patch-gather switches: explicit
    config value > env override (kept for same-process A/B harnesses — the
    shared dev tunnel's run-to-run variance makes cross-process comparisons
    useless) > backend default (ON for TPU, OFF elsewhere: on CPU the kernel
    only runs under the slow interpreter)."""
    import os

    import jax

    if pallas is not None:
        return bool(pallas)
    env = os.environ.get(env_name)
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


def resolve_batch_local(batch_local: bool | None = None) -> bool:
    """Whether blocked-view patch gathers keep the batch axis explicit
    (`operand_batching_dims`) instead of folding it into the slab index.

    Single chip, the folded flat form is the measured-fast one (batching
    dims worsen XLA's gather layout choices — see deform_attn's note). Under
    GSPMD data parallelism the flat form is a disaster: the gather's row
    index mixes batch into dim 0, so XLA cannot prove batch-locality and
    ALL-GATHERS every fused map to every chip inside the decoder loop, fwd
    and bwd (measured on the 8-device CPU mesh: 14 all-gathers per accum
    train step, incl. the full [B*T*N, H, W, 2C] image maps — see
    tests/test_sharding_locality.py). The batched form compiles to zero
    feature-map all-gathers
    with identical numerics. Precedence: explicit config value >
    `RACFORMER_BATCH_LOCAL` env override (same-process A/B harnesses) >
    auto: ON whenever more than one device is visible."""
    import os

    if batch_local is not None:
        return bool(batch_local)
    env = os.environ.get("RACFORMER_BATCH_LOCAL")
    if env is not None:
        return env == "1"
    return jax.device_count() > 1


def aligned_width(W: int) -> int:
    """Stored width that lets the Pallas gather kernel fetch its 8-aligned
    16-wide window for ANY in-range point without a per-call pad: x0p <=
    W + PAD, so windows end at ((W + PAD) // 8) * 8 + WIN. Always a multiple
    of 8 and >= W + 2 * PAD."""
    from .gather_kernel import WIN

    return ((W + PAD) // 8) * 8 + WIN


def pad_for_sampling(feat: jax.Array, align: bool = False) -> jax.Array:
    """Zero-pad the two spatial axes (..., H, W, C) by the sampling border and
    pin the result to a canonical layout. Hoist this OUT of loops: profiling
    shows XLA otherwise fuses the pad into each gather with a twisted operand
    layout ({4,1,0,3,2}) that makes every 2x2 patch fetch strided.

    With `align=True` the W axis is right-padded to :func:`aligned_width` so
    the Pallas gather never pads per call (the round-3 profile showed
    ~21 ms/step of in-loop whole-map pads). Aligned maps over-claim W when
    derived from shape — callers MUST pass the true (H, W) through the
    samplers' `true_hw` arguments."""
    W = feat.shape[-2]
    right = (aligned_width(W) - W - PAD) if align else PAD
    pads = [(0, 0)] * (feat.ndim - 3) + [(PAD, PAD), (PAD, right), (0, 0)]
    padded = jnp.pad(feat, pads)
    return jax.lax.optimization_barrier(padded)


def fuse_rows(padded: jax.Array) -> jax.Array:
    """y-fuse consecutive rows of a zero-bordered map into channels:
    fused[..., h, w, :] = concat(p[..., h, w, :], p[..., h+1, w, :]).

    Each 2x2 bilinear patch then becomes ONE single-row gather slice
    (1, 1, 2, 2C) — ~20% faster than the two-row (1, 2, 2, C) patch on v5e
    and with a cheaper contiguous lerp. Hoist per FRAME (the streaming
    cache stores maps in this form via `RaCFormer.encode_frame`)."""
    fused = jnp.concatenate(
        [padded[..., :-1, :, :], padded[..., 1:, :, :]], axis=-1)
    return jax.lax.optimization_barrier(fused)


def _gather_patch(fused: jax.Array, view: jax.Array, y0p: jax.Array,
                  x0p: jax.Array, batch_local: bool = False) -> jax.Array:
    """One (1, 1, 2, 2C) slice per point from the y-fused map.

    fused: [NS, R0, Wp, 2C]; index arrays share a batch shape.
    Returns [*batch, 2, 2C].

    `batch_local=True` (requires the blocked-views contract: points with
    leading index s reference only slabs [s*J, (s+1)*J)) reshapes the
    operand to [S, J, R0, Wp, 2C] and gathers with operand batching dims so
    GSPMD keeps a batch-sharded operand local instead of all-gathering it
    (see :func:`resolve_batch_local`). Point order and numerics match the
    flat form exactly (both are s-major). CAUTION: the `view % J` below
    silently WRAPS an out-of-contract absolute index into the local block
    (the flat form would read the true slab), so a contract violation
    diverges single-chip vs multichip instead of failing — both call sites
    build `view` as `s*J + local` by construction (`deform_attn.py` sm,
    `msmv.py` sv), keep it that way.

    NOTE (measured, v5e): keep the (view, y, x) triple-index form with the
    narrow (1, 1, 2, 2C) slice. Both "cheaper-looking" reformulations hit
    catastrophic XLA slow paths end-to-end: a single linear index over the
    flattened [NS*R0*Wp, 2C] operand with slice (2, 2C) was ~50x slower,
    and folding the x-pair into channels ([NS, R0, Wp*2C] with a contiguous
    (1, 1, 2*2C) minor-dim slice) was ~100x slower — wide gather slices on
    the minor dim do not take the fast gather path on this toolchain, even
    though the triple-index form pays a W-major twisted operand layout and
    a whole-output relayout copy."""
    C2 = fused.shape[-1]
    NS, R0, Wp = fused.shape[:3]
    S = view.shape[0] if view.ndim else 1
    if batch_local and S > 1 and NS % S == 0:
        J = NS // S
        idx = jnp.stack(
            [view.reshape(S, -1) % J, y0p.reshape(S, -1),
             x0p.reshape(S, -1)], axis=-1)
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(1,),
            start_index_map=(1, 2, 3),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        patch = jax.lax.gather(
            fused.reshape(S, J, R0, Wp, C2), idx, dnums,
            slice_sizes=(1, 1, 1, 2, C2),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        return patch.reshape(-1, 2, C2)
    idx = jnp.stack(
        [view.reshape(-1), y0p.reshape(-1), x0p.reshape(-1)], axis=-1
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    patch = jax.lax.gather(
        fused, idx, dnums, slice_sizes=(1, 1, 2, C2),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    # stay FLAT [np, 2, 2C]: the gather emits plane-separated {2,0,1}
    # (x0-plane then x1-plane, each a contiguous [np, 2C]); reshaping to the
    # caller's batch shape here forced a whole-tensor relayout copy to
    # {2,1,0:T(2,128)} (~47 ms/step in the round-3 decode profile). The lerp
    # slices planes on axis 1 — free in the native layout — and only the
    # final [np, C] result is reshaped (a major-dim split, also free).
    return patch.reshape(-1, 2, C2)


def _lerp_patch(patch: jax.Array, wx: jax.Array, wy: jax.Array) -> jax.Array:
    """patch: FLAT [np, 2, 2C] (gather-native); wx/wy: any shape with np
    elements. Returns flat [np, C]."""
    C2 = patch.shape[-1]
    C = C2 // 2
    wx = wx.reshape(-1, 1).astype(patch.dtype)
    wy = wy.reshape(-1, 1).astype(patch.dtype)
    # plane slices on axis 1 are contiguous in the gather's {2,0,1} layout
    left = patch[:, 0, :]
    right = patch[:, 1, :]
    top = left[..., :C] * (1 - wx) + right[..., :C] * wx
    bot = left[..., C:] * (1 - wx) + right[..., C:] * wx
    return top * (1 - wy) + bot * wy


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _patch_sample(batch_local, fused, view, y0p, x0p, wx, wy):
    """Fused-map bilinear sample with a hand-written backward.

    Forward is the plain XLA patch gather + lerp: XLA's native gather reads
    only the touched cache lines of the (up to ~600 MB) fused maps, which
    measured FASTER end-to-end than the Pallas VMEM-resident gather
    (`ops/gather_kernel.py`, kept for dense-point call sites) — that kernel
    must stream each full map HBM->VMEM per call, and the decoder samples
    each map 6 times per frame. The backward is the opposite story: XLA's
    gather transpose is a ~4.6 us/patch serialized scatter-add, so it is
    replaced with the Pallas VMEM-resident scatter kernel
    (`ops/scatter_kernel.py`, ~8 ns/patch) — the TPU counterpart of the
    reference's hand-written CUDA backward
    (`models/csrc/msmv_sampling/msmv_sampling_backward.cu:68-104`).
    """
    out = _lerp_patch(
        _gather_patch(fused, view, y0p, x0p, batch_local), wx, wy)
    return out.reshape(*view.shape, out.shape[-1])


def _patch_sample_fwd(batch_local, fused, view, y0p, x0p, wx, wy):
    out = _patch_sample(batch_local, fused, view, y0p, x0p, wx, wy)
    return out, (fused, view, y0p, x0p, wx, wy)


def _patch_sample_bwd_impl(batch_local, res, g, pallas_regather):
    from .scatter_kernel import (
        GROUP, WIN, chunk_layout, pad_chunks, scatter_patch_grads,
        scatter_patch_grads_sharded,
    )

    fused, view, y0p, x0p, wx, wy = res
    NS, R0, Wp, C2 = fused.shape
    C = C2 // 2
    S = view.shape[0]
    J = NS // S  # sub-slab axis (heads / camera views) folded into `view`
    K = int(np.prod(view.shape[1:]))
    wpad = int(np.ceil((Wp + WIN - 2) / 8)) * 8
    chunk, nch, kpad = chunk_layout(K)

    g32 = g.astype(jnp.float32).reshape(-1, C)
    wy32 = wy.astype(jnp.float32).reshape(-1, 1)
    gfused = jnp.concatenate([g32 * (1 - wy32), g32 * wy32], axis=-1)

    def prep(a):
        return pad_chunks(a.reshape(S, K), kpad).reshape(S, nch, chunk)

    row = (view % J) * R0 + y0p
    xb = (x0p // 8) * 8
    o = x0p - xb
    rowxb = jnp.stack([prep(row), prep(xb)], axis=2)
    # (offset + wx) packed into one float per point, [NG, GROUP]-shaped like
    # the gather kernel's operand; the kernel builds the hat weights itself
    # (the old XLA-prebuilt block-diagonal A-matrix was ~2 GB per call at
    # flagship train shapes — the round-4 profile's dominant scatter cost)
    of = prep(o.astype(jnp.float32) + wx.astype(jnp.float32)).reshape(
        S, nch, chunk // GROUP, GROUP)
    # pad the K axis in place: the old transpose-pad-transpose around
    # pad_chunks staged two whole-tensor relayouts of [S, K, 128] (the
    # round-3 profile's 2x72 ms bf16 re-layout fusions in this backward);
    # padding rows are ZERO, which also silences the padding points'
    # windows in the kernel
    gf = pad_chunks(gfused.reshape(S, K, C2), kpad, axis=1).reshape(
        S, nch, chunk, C2).astype(jnp.bfloat16)

    interpret = jax.default_backend() == "cpu"
    # batch_local: the GSPMD-partitioned wrapper keeps the scatter (and its
    # large per-point operands) slab-local on a data mesh; single chip, the
    # plain call avoids the custom-partitioning indirection
    scatter = (scatter_patch_grads_sharded if batch_local
               else scatter_patch_grads)
    gmap = scatter(rowxb, of, gf, J * R0, wpad, chunk, interpret)
    d_fused = gmap.reshape(S, J, R0, wpad, C2)[..., :Wp, :]
    d_fused = d_fused.reshape(NS, R0, Wp, C2).astype(fused.dtype)

    # location gradients need the window values again (the reference
    # backward reads the same corners, `msmv_sampling_backward.cu:75-101`)
    if pallas_regather:
        # ONE corner-pair kernel call reconstructs all four corners (same
        # window staging as the forward gather, two selections); the XLA
        # patch re-gather below was the round-4 train profile's
        # twisted-layout fusion hot spot
        from .gather_kernel import patch_corners_pallas

        corners = patch_corners_pallas(
            fused, view, y0p, x0p, batch_local
        ).astype(jnp.float32).reshape(-1, 2 * C2)
        v00, v10 = corners[:, :C], corners[:, C:C2]
        v01, v11 = corners[:, C2:C2 + C], corners[:, C2 + C:]
    else:
        patch = _gather_patch(fused, view, y0p, x0p, batch_local).astype(
            jnp.float32)
        v00, v10 = patch[:, 0, :C], patch[:, 0, C:]
        v01, v11 = patch[:, 1, :C], patch[:, 1, C:]
    wx32 = wx.astype(jnp.float32).reshape(-1, 1)
    d_wx = jnp.sum(g32 * ((v01 - v00) * (1 - wy32) + (v11 - v10) * wy32), -1)
    top = v00 * (1 - wx32) + v01 * wx32
    bot = v10 * (1 - wx32) + v11 * wx32
    d_wy = jnp.sum(g32 * (bot - top), -1)

    zi = lambda a: np.zeros(a.shape, jax.dtypes.float0)
    return (d_fused, zi(view), zi(y0p), zi(x0p),
            d_wx.reshape(wx.shape).astype(wx.dtype),
            d_wy.reshape(wy.shape).astype(wy.dtype))


def _patch_sample_bwd(batch_local, res, g):
    import os

    # A/B override for the XLA-forward sites' backward re-gather (image
    # radial sampling); default stays the XLA patch re-gather
    env = os.environ.get("RACFORMER_IMG_PALLAS_REGATHER")
    return _patch_sample_bwd_impl(batch_local, res, g,
                                  pallas_regather=env == "1")


_patch_sample.defvjp(_patch_sample_fwd, _patch_sample_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _patch_sample_pallas(batch_local, fused, view, y0p, x0p, wx, wy):
    """`_patch_sample` with the Pallas gather forward (`ops/gather_kernel.py`).

    Only profitable where the fused map is small relative to the point count
    (the kernel streams the whole map HBM->VMEM per call): the BEV
    deform-attn sites (~142 MB map, 576k points/call) qualify; the image
    radial sampler (~600 MB level-0 map) does not. `batch_local` picks the
    GSPMD-partitioned kernel wrapper (forward) and the slab-local scatter +
    batched re-gather (backward) — it must match the mesh, not the call
    site, so it threads from :func:`resolve_batch_local` like the XLA
    path's."""
    from .gather_kernel import patch_sample_pallas

    return patch_sample_pallas(fused, view, y0p, x0p, wx, wy, batch_local)


def _patch_sample_pallas_fwd(batch_local, fused, view, y0p, x0p, wx, wy):
    out = _patch_sample_pallas(batch_local, fused, view, y0p, x0p, wx, wy)
    return out, (fused, view, y0p, x0p, wx, wy)


def _patch_sample_pallas_bwd(batch_local, res, g):
    # the Pallas-forward sites (BEV deform-attn) also re-gather through the
    # kernel in the backward — measured decisive on the train step
    return _patch_sample_bwd_impl(batch_local, res, g, pallas_regather=True)


_patch_sample_pallas.defvjp(_patch_sample_pallas_fwd, _patch_sample_pallas_bwd)


def bilinear_sample_views_nhwc(
    feat: jax.Array,
    view: jax.Array,
    x: jax.Array,
    y: jax.Array,
    pre_padded: bool = False,
    custom_grad: bool = True,
    blocked_views: bool = False,
    pallas_forward: bool = False,
    pre_fused: bool = False,
    true_hw: tuple | None = None,
    batch_local: bool | None = None,
) -> jax.Array:
    """Sample `feat` [N, H, W, C] at (view, x, y); view is an int index.

    The view axis is folded into the gather (this is the TPU equivalent of
    the CUDA kernel's view-indexed pointer arithmetic,
    `models/csrc/msmv_sampling/msmv_sampling_forward.cu:75-164`).

    TPU cost model note: XLA gathers are costed per gathered *slice*
    (~5 cycles each, nearly independent of slice width), so instead of 4
    masked corner gathers we fetch one 2x2xC patch per point from a
    2-pixel zero-padded operand. The padding makes zeros-outside semantics
    exact with NO per-corner masks: any corner outside the image lands in
    the zero border (far-outside points clamp entirely into it).

    With `pre_padded=True`, `feat` is [N, H+2*PAD, W+2*PAD, C] from
    :func:`pad_for_sampling` (hoist it out of iteration loops). With
    `pre_fused=True`, `feat` is already the y-fused padded map
    [N, H+2*PAD-1, W+2*PAD, 2C] from :func:`fuse_rows` — the form the
    streaming frame cache stores so per-step work touches only the newest
    frame's maps.

    TPU gather layout (measured on v5e, docs/experiments/gather_row_fusion.py):
    gather cost is dominated by per-row issue rate, so the two patch rows are
    pre-fused into channels (`fused[h, w] = concat(p[h, w], p[h+1, w])`) and
    each patch becomes ONE single-row slice (1, 1, 2, 2C) — ~20% faster than
    the (1, 2, 2, C) two-row patch and with a cheaper contiguous lerp.
    """
    if pre_fused:
        N, R0, Wp, C2 = feat.shape
        C = C2 // 2
        H, W = R0 + 1 - 2 * PAD, Wp - 2 * PAD
        fused = feat
    elif pre_padded:
        N, Hp, Wp, C = feat.shape
        H, W = Hp - 2 * PAD, Wp - 2 * PAD
        fused = fuse_rows(feat)
    else:
        N, H, W, C = feat.shape
        fused = fuse_rows(pad_for_sampling(feat))
    if true_hw is not None:
        # mandatory for W-aligned maps (`pad_for_sampling(align=True)`):
        # the stored width over-claims W, which would skew both the
        # align-corners scale and the out-of-range clamp
        H, W = true_hw
    elif pre_fused:
        # pre-fused production maps are ALWAYS W-aligned now; deriving W
        # from the stored shape would silently over-scale every sample
        # coordinate (e.g. 140 instead of 128 for the BEV maps)
        raise ValueError(
            "pre_fused maps are stored W-aligned; pass true_hw (the map's "
            "real spatial dims) — shape-derived dims would be wrong")
    if pallas_forward and fused.shape[2] < aligned_width(W):
        # pad here, OUTSIDE the custom-VJP (autodiff slices the cotangent
        # back); production maps arrive pre-aligned so this is a no-op there
        fused = jnp.pad(
            fused, [(0, 0), (0, 0), (0, aligned_width(W) - fused.shape[2]),
                    (0, 0)])

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(feat.dtype)[..., None]
    wy = (y - y0).astype(feat.dtype)[..., None]
    # clamp into [-2, W] then shift: far-outside -> fully inside the border
    x0p = (jnp.clip(x0, -PAD, W).astype(jnp.int32) + PAD)
    y0p = (jnp.clip(y0, -PAD, H).astype(jnp.int32) + PAD)

    view = view.astype(jnp.int32)
    # batch-explicit gathers need the blocked-views contract to localize the
    # slab index; without it the flat fold is the only correct form
    blocal = blocked_views and resolve_batch_local(batch_local)
    if custom_grad and blocked_views and 2 * C == 128:
        # custom VJP: identical forward, Pallas scatter backward (the train
        # step's dominant cost under plain autodiff). Requires 128-lane fused
        # channels AND the caller's promise that points with leading batch
        # index s only reference slabs [s*J, (s+1)*J) where J = N / batch —
        # true for both production view foldings (deform: slab*M + head,
        # msmv: slab*N + camera), asserted nowhere at runtime.
        # pallas_forward additionally swaps the XLA gather for the
        # VMEM-resident kernel — only for dense-point/small-map call sites
        # (see _patch_sample_pallas).
        if pallas_forward:
            return _patch_sample_pallas(
                blocal, fused, jnp.broadcast_to(view, x.shape), y0p, x0p,
                wx[..., 0], wy[..., 0])
        return _patch_sample(blocal, fused, jnp.broadcast_to(view, x.shape),
                             y0p, x0p, wx[..., 0], wy[..., 0])
    patch = _gather_patch(fused, jnp.broadcast_to(view, x.shape), y0p, x0p,
                          batch_local=blocal)
    out = _lerp_patch(patch, wx[..., 0], wy[..., 0])
    return out.reshape(*x.shape, out.shape[-1])
