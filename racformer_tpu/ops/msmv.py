"""Multi-scale multi-view (MSMV) feature sampling.

TPU-native replacement for the reference CUDA op
(`/root/reference/models/csrc/msmv_sampling/` — forward kernel semantics at
`msmv_sampling_forward.cu:27-164`, python fallback `models/csrc/wrapper.py:15-39`):
for every (batch-slab, query, point), bilinearly sample every FPN level of one
selected camera view with `align_corners=True` pixel mapping
(`x_pix = x_norm * (W-1)`), zero padding outside, and accumulate levels with
per-(point, level) scalar weights.

Instead of a hand-written kernel we express the op as 4 corner gathers + lerp
per level; XLA fuses the weighting and accumulation. Shapes are fully static.
Autodiff (for features, locations and weights) comes for free.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from .bilinear import bilinear_sample_views_nhwc


def resolve_img_pallas(pallas: bool | None = None) -> bool:
    """Whether the image MSMV gather uses the Pallas patch kernel.

    Precedence mirrors `ops.deform_attn.resolve_bev_pallas`: explicit config
    value > `RACFORMER_IMG_PALLAS` env override > backend default (ON for
    TPU). Device-plane xplane A/B at flagship shapes
    (docs/experiments/ab_img_pallas_xplane.py, round 3): decode while-loop
    237.2 -> 201.8 ms/step. The per-(frame, group) slab pyramids fit VMEM
    (level 0: 6 cams x 67 rows x 184 x 128 bf16 ~= 19 MB), and the balanced
    chunk layout keeps padded points under 4%; round 2's "image sampler
    keeps XLA" conclusion predated the flat-lerp fix that removed the XLA
    path's relayout advantage. Precedence lives in
    `bilinear.resolve_pallas`."""
    from .bilinear import resolve_pallas

    return resolve_pallas("RACFORMER_IMG_PALLAS", pallas)


def msmv_sample(
    mlvl_feats: Sequence[jax.Array],
    loc: jax.Array,
    weights: jax.Array,
    pre_padded: bool = False,
) -> jax.Array:
    """Args:
      mlvl_feats: L feature pyramids, each [S, N, H_l, W_l, C] (S = B*T*G slabs,
        N = camera views, channel-last).
      loc: [S, Q, P, 3] — (x, y) normalized to [0, 1] and packed view index
        v = view / (N - 1) (the reference's packing, `sparsebev_sampling.py:110`).
      weights: [S, Q, P, L] per-level scalar weights.

    Returns: [S, Q, P, C] aggregated features.
    """
    N = mlvl_feats[0].shape[1]
    x_norm = loc[..., 0]
    y_norm = loc[..., 1]
    # Unpack the view index: round(v * (N-1)), matching
    # `msmv_sampling_forward.cu:110` (`round(loc_v * (N - 1))`).
    view = jnp.round(loc[..., 2] * (N - 1)).astype(jnp.int32)
    view = jnp.clip(view, 0, N - 1)
    return msmv_sample_xyv(mlvl_feats, x_norm, y_norm, view, weights,
                           pre_padded=pre_padded)


def msmv_sample_xyv(
    mlvl_feats: Sequence[jax.Array],
    x_norm: jax.Array,
    y_norm: jax.Array,
    view: jax.Array,
    weights: jax.Array,
    pre_padded: bool = False,
    pre_fused: bool = False,
    pallas: bool | None = None,
    true_hws: Sequence[tuple] | None = None,
) -> jax.Array:
    """`msmv_sample` with unstacked (x, y, view) — the hot path: the packed
    trailing-3 loc tensor costs a stack/unstack round-trip (and a float
    view-index quantization) that the stacked API only keeps for parity with
    the reference's CUDA calling convention."""
    use_pallas = resolve_img_pallas(pallas)
    N = mlvl_feats[0].shape[1]
    S = mlvl_feats[0].shape[0]
    slab = jnp.arange(S, dtype=jnp.int32)[:, None, None]

    def sample_level(feat_l, w_l, true_hw):
        # feat_l: [S, N, H, W, C] (+2*PAD border when pre_padded; y-fused
        # padded [S, N, H+2*PAD-1, W+2*PAD, 2C] when pre_fused); w_l: [S, Q, P]
        from .bilinear import PAD

        if true_hw is not None:
            # mandatory with W-aligned stored maps (shape over-claims W)
            H, W = true_hw
        elif pre_fused:
            raise ValueError(
                "pre_fused pyramids are stored W-aligned; pass true_hws "
                "(per-level real dims) — shape-derived dims would "
                "mis-scale every sampling location")
        else:
            off = 2 * PAD if pre_padded else 0
            H, W = feat_l.shape[2] - off, feat_l.shape[3] - off
        x_pix = x_norm * (W - 1)  # align_corners=True mapping
        y_pix = y_norm * (H - 1)
        # fold (slab, view) into one un-batched gather (see deform_attn)
        sv = slab * N + view
        f4 = feat_l.reshape(S * N, *feat_l.shape[2:])
        out = bilinear_sample_views_nhwc(
            f4, sv, x_pix, y_pix, pre_padded=pre_padded, blocked_views=True,
            pre_fused=pre_fused, pallas_forward=use_pallas, true_hw=true_hw,
        )
        return out * w_l[..., None].astype(out.dtype)

    hws = true_hws or [None] * len(mlvl_feats)
    acc = sample_level(mlvl_feats[0], weights[..., 0], hws[0])
    for l in range(1, len(mlvl_feats)):
        acc = acc + sample_level(mlvl_feats[l], weights[..., l], hws[l])
    return acc


def msmv_sample_fold(
    feat_cat: jax.Array,
    x_norm: jax.Array,
    y_norm: jax.Array,
    view: jax.Array,
    weights: jax.Array,
    true_hws: Sequence[tuple],
    roffs: Sequence[int],
    rcat: int,
    batch_local: bool | None = None,
) -> jax.Array:
    """Fused-epilogue MSMV sample over a level-CONCATENATED fused map.

    feat_cat: [S, N * rcat, Wmax, 2C] — the per-level y-fused W-aligned maps
    row-concatenated per camera (level l of camera n starts at row
    n * rcat + roffs[l]; built once per frame by `RaCFormer._trunk` when the
    fused gather is enabled). x_norm/y_norm/view: [S, Q, P]; weights:
    [S, Q, P, L] per-level softmax weights.

    One kernel call per decoder iteration replaces the L per-level calls
    plus the XLA y-mix + weighted-sum epilogue (the round-5 decode profile's
    11.7 ms/step image epilogue fusion): points are level-INTERLEAVED
    (l fastest) and the kernel folds each L consecutive points after
    weighting — see `gather_kernel.patch_sample_fold`. Eval-only (no custom
    VJP); the training path keeps the per-level `msmv_sample_xyv` machinery.

    Returns [S, Q, P, C].
    """
    from .bilinear import PAD, resolve_batch_local
    from .gather_kernel import patch_sample_fold

    if feat_cat.ndim == 5:  # [S, N, rcat, Wmax, 2C] -> fold cameras
        feat_cat = feat_cat.reshape(
            feat_cat.shape[0], -1, *feat_cat.shape[3:])
    L = len(true_hws)
    S, Q, P = x_norm.shape
    rows, x0s, wxs, wys = [], [], [], []
    for l, (H, W) in enumerate(true_hws):
        x_pix = x_norm * (W - 1)  # align_corners=True mapping
        y_pix = y_norm * (H - 1)
        x0 = jnp.floor(x_pix)
        y0 = jnp.floor(y_pix)
        wxs.append((x_pix - x0).astype(jnp.float32))
        wys.append((y_pix - y0).astype(jnp.float32))
        x0p = jnp.clip(x0, -PAD, W).astype(jnp.int32) + PAD
        y0p = jnp.clip(y0, -PAD, H).astype(jnp.int32) + PAD
        rows.append(view * rcat + roffs[l] + y0p)
        x0s.append(x0p)

    def inter(parts):  # L x [S, Q, P] -> [S, Q*P*L] (l fastest)
        return jnp.stack(parts, axis=-1).reshape(S, Q * P * L)

    out = patch_sample_fold(
        feat_cat, inter(rows), inter(x0s), inter(wxs), inter(wys),
        weights.reshape(S, Q * P, L).reshape(S, Q * P * L), L,
        batch_local=resolve_batch_local(batch_local),
    )  # [S, Q*P, C]
    return out.reshape(S, Q, P, out.shape[-1])


def msmv_sample_v2(
    mlvl_feats: Sequence[jax.Array],
    loc: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Argmax-level variant: sample only the level with the largest weight
    instead of the weighted sum (`msmv_sampling_pytorch_v2`,
    `/root/reference/models/csrc/wrapper.py:41-76`; unused by the default
    path but part of the op surface). Same shapes as :func:`msmv_sample`."""
    N = mlvl_feats[0].shape[1]
    x_norm = loc[..., 0]
    y_norm = loc[..., 1]
    view = jnp.round(loc[..., 2] * (N - 1)).astype(jnp.int32)
    view = jnp.clip(view, 0, N - 1)
    best = jnp.argmax(weights, axis=-1)  # [S, Q, P]

    out = None
    for l, feat_l in enumerate(mlvl_feats):
        H, W = feat_l.shape[2], feat_l.shape[3]
        s = jax.vmap(
            functools.partial(bilinear_sample_views_nhwc, custom_grad=False)
        )(feat_l, view, x_norm * (W - 1), y_norm * (H - 1))
        sel = (best == l)[..., None].astype(s.dtype)
        out = s * sel if out is None else out + s * sel
    return out
