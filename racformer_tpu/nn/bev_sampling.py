"""BEV sampling branches: radial sample-point generation over the temporal BEV
queue + cross-frame deformable attention.

Matches `BEVSampling` (`/root/reference/models/racformer_transformer.py:429-546`)
and `BEVSelfAttention` (`/root/reference/models/bev_self_attention.py:115-225`):
box-anchored 2D offsets, per-frame velocity warp, per-layer shrinking radial
(theta, d) perturbation, learned positional encoding on the BEV maps, and a
single-level deformable attention over the num_frames-deep BEV queue with
learned per-frame queue weights.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bbox_codec import theta_d_to_xy, xy_to_theta_d
from ..ops.deform_attn import deform_attn_single_level
from ..ops.sampling import make_sample_points
from .positional import LearnedPositionalEncoding2D


def radial_offsets(query_feat, ray_offset_dense, d_region, depth_num):
    """Per-depth radial perturbations: linspace(-d, d, D) plus a learned
    sub-bin shift (`racformer_transformer.py:395-396,515-516`). Returns [B, Q, D]."""
    lin = jnp.linspace(-1.0, 1.0, depth_num) * d_region
    shift = (nn.sigmoid(ray_offset_dense(query_feat)) * 2.0 - 1.0) * (
        d_region / depth_num / 2.0
    )
    return lin[None, None, :] + shift


class BEVValueProj(nn.Module):
    """Loop-invariant half of the BEV deformable attention: positional
    encoding + value projection. With the 6 decoder iterations sharing
    weights, this is identical every iteration — computed once before the
    scan and passed in as a broadcast arg."""

    embed_dims: int = 256
    num_heads: int = 4
    spatial_shape: tuple = (128, 128)
    dtype: Any = jnp.float32
    # storage dtype of the sampler-ready value maps; bf16 halves the gather
    # bandwidth (the decode bottleneck). Tests override to f32 through the
    # model's `decoder={"gather_dtype": ...}` config for exact torch parity.
    gather_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, bev_feats):
        """bev_feats: [B, T, H, W, C] -> y-fused padded value
        [B*T, M, Hp-1, Wp, 2c] (bf16)."""
        B, T, H, W, C = bev_feats.shape
        pos = LearnedPositionalEncoding2D(
            self.embed_dims // 2,
            rows=self.spatial_shape[0],
            cols=self.spatial_shape[1],
            dtype=self.dtype,
            name="positional_encoding",
        )(H, W)
        v = nn.Dense(C, dtype=self.dtype, name="value_proj")(bev_feats + pos[None, None])
        # bf16 for the bandwidth-bound bilinear gather (f32 resumes after);
        # head-major + zero-bordered + y-fused so the scanned deform
        # attention gathers patches from a SAMPLER-READY operand — fusing
        # here (once per step) instead of inside each of the 6 scan
        # iterations (and again under remat in the backward) saves the
        # full-map doubling concat 12+x per step
        from ..ops.bilinear import fuse_rows, pad_for_sampling

        M = self.num_heads
        v = v.astype(self.gather_dtype).reshape(B * T, H, W, M, C // M)
        # W-aligned so the Pallas gather never re-pads inside the decoder
        # scan; consumers pass true (H, W) via `true_hw` (= spatial_shape)
        return fuse_rows(pad_for_sampling(v.transpose(0, 3, 1, 2, 4),
                                          align=True))


class BEVCrossFrameAttention(nn.Module):
    """Deformable attention over the temporal BEV queue with queue weighting.

    Parity note (audited vs `/root/reference/models/bev_self_attention.py:160-213`):
    the reference flattens its VALUE rows batch-major (`value.view(B*T, ...)`)
    but permutes sampling locations/weights QUEUE-major before its
    `reshape(bs*T, ...)` (`:183-186`), and then re-reads the output rows
    batch-major again (`:206`) — at batch > 1 frames and batch entries get
    scrambled against each other (latent: released eval runs B=1). Here all
    three use the same batch-major (b*T + t) order, which is identical at
    B=1 and correct at B>1."""

    embed_dims: int = 256
    num_heads: int = 4
    num_frames: int = 8
    dropout: float = 0.1
    bev_pallas: Any = None  # None = auto (ops.deform_attn.resolve_bev_pallas)
    bev_fused: int = 0  # fold size for the fused-epilogue eval kernel
    spatial_shape: tuple | None = None  # true (H, W); required: value is W-aligned
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, value, loc, weights, train: bool = False):
        """query: [B, Q, C]; value: [B*T, M, Hp-1, Wp, 2c] pre-projected,
        head-major, zero-bordered and y-fused (:class:`BEVValueProj`);
        loc: an (x, y) tuple of [B, Q, M, T, P] arrays in [0, 1] (kept
        unstacked for layout, see BEVSampling) or a stacked
        [B, Q, M, T, P, 2]; weights: [B, Q, M, T, P]."""
        B, Q, C = query.shape
        T = self.num_frames
        M = self.num_heads

        if isinstance(loc, tuple):
            loc_x, loc_y = loc
        else:
            loc_x, loc_y = loc[..., 0], loc[..., 1]
        lx = loc_x.transpose(0, 3, 1, 2, 4).reshape(B * T, Q, M, -1)
        ly = loc_y.transpose(0, 3, 1, 2, 4).reshape(B * T, Q, M, -1)
        w = weights.transpose(0, 3, 1, 2, 4).reshape(B * T, Q, M, -1)

        out = deform_attn_single_level(
            value, None, w, pre_fused=True, loc_xy=(lx, ly),
            pallas=self.bev_pallas, fold_points=self.bev_fused,
            true_hw=self.spatial_shape)  # [B*T, Q, C]
        out = out.reshape(B, T, Q, C)

        qw = nn.Dense(T, dtype=jnp.float32, name="bev_queue_weight")(query)
        qw = jax.nn.softmax(qw, axis=-1)  # [B, Q, T]
        out = jnp.einsum("btqc,bqt->bqc", out.astype(jnp.float32), qw).astype(self.dtype)

        out = nn.Dense(C, dtype=self.dtype, name="output_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out + query


class BEVSampling(nn.Module):
    embed_dims: int = 256
    num_frames: int = 8
    num_heads: int = 4
    num_points: int = 4
    depth_num: int = 5
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    spatial_shape: tuple = (128, 128)
    bev_pallas: Any = None
    bev_fused: int = 0  # fold size for the fused-epilogue eval kernel
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_ray, query_feat, bev_value, time_diff, d_region, train: bool = False):
        """query_ray: [B, Q, 10] polar; query_feat: [B, Q, C];
        bev_value: [B*T, H, W, M, c] pre-projected values
        (:class:`BEVValueProj`, hoisted out of the weight-shared iteration
        loop together with the radar temporal encoder); time_diff: [B, T];
        d_region: scalar."""
        B, Q, _ = query_ray.shape
        T, M, P, D = self.num_frames, self.num_heads, self.num_points, self.depth_num
        # bev_value: [B*T, M, Hp-1, Wp, 2c] (padded head-major, y-fused,
        # W-aligned — true dims are self.spatial_shape, not shape-derived)

        query_bbox = theta_d_to_xy(query_ray)

        # reference init: zero weights, bias ~ U(-0.5, 0.5)
        # (`racformer_transformer.py:470-473`)
        off = nn.Dense(
            D * M * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -0.5, 0.5),
            dtype=jnp.float32,
            name="sampling_offset",
        )(query_feat)
        off = off.reshape(B, Q, M * P * D, 2)
        off3 = jnp.concatenate([off, jnp.zeros_like(off[..., :1])], axis=-1)
        pts = make_sample_points(query_bbox, off3, self.pc_range)  # [B, Q, MPD, 3]

        pts = jnp.broadcast_to(pts[:, :, None], (B, Q, T, M * P * D, 3))
        vel = jax.lax.stop_gradient(query_ray[..., 8:10])  # [B, Q, 2]
        dist = vel[:, :, None, :] * time_diff[:, None, :, None]  # [B, Q, T, 2]
        xy = pts[..., 0:2] - dist[:, :, :, None, :]

        lo = jnp.asarray(self.pc_range[0:2])
        hi = jnp.asarray(self.pc_range[3:5])
        xy = (xy - lo) / (hi - lo)

        td = xy_to_theta_d(xy)  # [B, Q, T, MPD, 2]
        d_off = radial_offsets(
            query_feat,
            nn.Dense(D, dtype=jnp.float32, name="ray_points_offset"),
            d_region,
            D,
        )  # [B, Q, D]
        # stay UNSTACKED from here: the stacked trailing-2 form forced a
        # dynamic-update-slice for the radial offset add plus stack/unstack
        # round-trips with pathological {.., 2}-minor layouts (~46 ms/step
        # of async slices in the decode profile)
        theta = td[..., 0].reshape(B, Q, T, M, P, D)
        dd = td[..., 1].reshape(B, Q, T, M, P, D) + d_off[
            :, :, None, None, None, :]
        from ..ops.bbox_codec import theta_d_pair_to_xy

        loc_x, loc_y = theta_d_pair_to_xy(
            theta.reshape(B, Q, T, M, P * D), dd.reshape(B, Q, T, M, P * D))
        # [B, Q, M, T, PD] (normalized [0, 1] BEV coords)
        loc_x = loc_x.transpose(0, 1, 3, 2, 4)
        loc_y = loc_y.transpose(0, 1, 3, 2, 4)

        # DUMP-equivalent capture of the BEV sampling locations (the image
        # branch sows its `sample_points` the same way); also feeds the
        # window-share-rate study (docs/experiments/window_share_study.py)
        self.sow("intermediates", "bev_loc", (loc_x, loc_y))

        w = nn.Dense(M * 1 * D * P, dtype=jnp.float32, name="scale_weights")(query_feat)
        w = w.reshape(B, Q, M, 1, D * P)
        w = jax.nn.softmax(w, axis=-1)
        w = jnp.broadcast_to(w, (B, Q, M, T, D * P))

        return BEVCrossFrameAttention(
            self.embed_dims,
            self.num_heads,
            self.num_frames,
            bev_pallas=self.bev_pallas,
            bev_fused=self.bev_fused,
            spatial_shape=self.spatial_shape,
            dtype=self.dtype,
            name="attention",
        )(query_feat, bev_value, (loc_x, loc_y), w, train=train)
