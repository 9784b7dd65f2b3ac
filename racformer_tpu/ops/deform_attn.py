"""Single-level multi-head deformable attention sampling.

TPU-native replacement for mmcv's `ms_deform_attn` CUDA op as used by the
reference's `BEVSelfAttention` over the 8-frame BEV queue
(`/root/reference/models/bev_self_attention.py:192-204`; pytorch fallback
`mmcv.ops.multi_scale_deformable_attn_pytorch`). Only the single-level case is
needed (the BEV map is one 128x128 level).

Semantics: sampling grid `loc * 2 - 1` fed to `grid_sample(align_corners=False,
padding_mode='zeros')`, i.e. pixel coords `x_pix = x_norm * W - 0.5`; output is
the attention-weighted sum over points, per head.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .bilinear import bilinear_sample_views_nhwc


def resolve_bev_pallas(pallas: bool | None = None) -> bool:
    """Whether the BEV deform-attn gather uses the Pallas patch kernel.

    Precedence: explicit config value > `RACFORMER_BEV_PALLAS` env override
    (kept for same-process A/B harnesses — the shared dev tunnel's run-to-run
    variance makes cross-process comparisons useless) > backend default.

    Default is ON for TPU: device-plane xplane A/B at flagship shapes
    (docs/experiments/ab_bev_pallas_xplane.py) measured the decode while-loop
    at 285.9 ms/step with the XLA gather vs 237.1 ms/step with the Pallas
    kernel once the flat-lerp layout fix landed (the BEV maps are small
    enough to sit VMEM-resident per slab). Precedence lives in
    `bilinear.resolve_pallas`.
    """
    from .bilinear import resolve_pallas

    return resolve_pallas("RACFORMER_BEV_PALLAS", pallas)


def deform_attn_single_level(
    value: jax.Array,
    loc: jax.Array,
    weights: jax.Array,
    pre_padded: bool = False,
    loc_xy=None,
    pre_fused: bool = False,
    pallas: bool | None = None,
    true_hw: tuple | None = None,
    fold_points: int = 0,
) -> jax.Array:
    """Args:
      value: [S, H, W, M, c] — S batch slabs (B * num_bev_queue), M heads,
        c = embed_dims // M channels per head. With `pre_padded=True` the
        value is instead [S, M, H + 2*PAD, W + 2*PAD, c] (head-major,
        zero-bordered via `bilinear.pad_for_sampling`) — hoist that transform
        out of iteration loops.
      loc: [S, Q, M, P, 2] — (x, y) sampling locations normalized to [0, 1];
        alternatively pass `loc_xy` = (x, y) tuple of [S, Q, M, P] arrays
        (the hot path: stacked trailing-2 tensors get pathological layouts).
      weights: [S, Q, M, P] — attention weights.

    Returns: [S, Q, M * c].

    The head axis is folded into the gather (one 2x2-patch gather per point
    for all heads/queries) — the same trick the MSMV sampler uses for the
    view axis.
    """
    from .bilinear import PAD

    if pre_fused:
        # [S, M, Hp-1, Wp, 2c] y-fused padded (BEVValueProj)
        S, M, R0, Wp, c2 = value.shape
        c = c2 // 2
        H, W = R0 + 1 - 2 * PAD, Wp - 2 * PAD
        val_h = value
    elif pre_padded:
        S, M, Hp, Wp, c = value.shape
        H, W = Hp - 2 * PAD, Wp - 2 * PAD
        val_h = value
    else:
        S, H, W, M, c = value.shape
        val_h = value.transpose(0, 3, 1, 2, 4)  # [S, M, H, W, c]
    if true_hw is not None:
        # required for W-aligned stored maps (`pad_for_sampling(align=True)`)
        # whose shape over-claims W
        H, W = true_hw
    elif pre_fused:
        raise ValueError(
            "pre_fused BEV values are stored W-aligned; pass true_hw "
            "(= spatial_shape) — shape-derived dims would mis-scale "
            "every sampling location")
    if loc_xy is not None:
        x_norm, y_norm = loc_xy
    else:
        x_norm, y_norm = loc[..., 0], loc[..., 1]
    Q, P = x_norm.shape[1], x_norm.shape[3]

    x_pix = x_norm * W - 0.5  # align_corners=False mapping
    y_pix = y_norm * H - 0.5

    if fold_points:
        # fused-epilogue eval path (round 5): ONE kernel call applies the
        # x/y lerp, the attention weight, and sums each `fold_points`
        # consecutive points (the caller orders points so a fold group
        # shares one (q, head) output) — the per-point y-paired output,
        # its relayout/slice copies, and the weighted-sum fusion all
        # disappear. Eval-only (no custom VJP).
        from .bilinear import PAD, resolve_batch_local
        from .gather_kernel import patch_sample_fold

        assert pre_fused and P % fold_points == 0, (P, fold_points)
        R0 = val_h.shape[2]
        x0 = jnp.floor(x_pix)
        y0 = jnp.floor(y_pix)
        wx = (x_pix - x0).astype(jnp.float32)
        wy = (y_pix - y0).astype(jnp.float32)
        x0p = jnp.clip(x0, -PAD, W).astype(jnp.int32) + PAD
        y0p = jnp.clip(y0, -PAD, H).astype(jnp.int32) + PAD
        head = jnp.broadcast_to(
            jnp.arange(M, dtype=jnp.int32)[None, None, :, None], (1, Q, M, P))
        row = head * R0 + y0p
        fused_flat = val_h.reshape(S, M * R0, val_h.shape[3], c2)
        out = patch_sample_fold(
            fused_flat, jnp.broadcast_to(row, x0p.shape), x0p, wx, wy,
            weights, fold_points,
            batch_local=resolve_batch_local(None),
        )  # [S, Q*M*(P//fold), c]
        out = out.reshape(S, Q, M, P // fold_points, c)
        return jnp.sum(out.astype(jnp.float32), axis=3).astype(
            out.dtype).reshape(S, Q, M * c)

    # fold (slab, head) into one gather index: a single un-batched gather
    # (vmap adds operand batching dims that worsen XLA's layout choices)
    head = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[None, :, None], (Q, M, P)
    )
    slab = jnp.arange(S, dtype=jnp.int32)[:, None, None, None]
    sm = slab * M + head[None]
    val4 = val_h.reshape(S * M, *val_h.shape[2:])
    out = bilinear_sample_views_nhwc(
        val4, sm, x_pix, y_pix, pre_padded=pre_padded, blocked_views=True,
        pallas_forward=resolve_bev_pallas(pallas), pre_fused=pre_fused,
        true_hw=true_hw,
    )
    out = jnp.sum(out * weights[..., None].astype(out.dtype), axis=3)  # [S, Q, M, c]
    return out.reshape(S, Q, M * c)
