"""Image-branch radial spatio-temporal sampling.

Matches `RaCFormerSampling` (`/root/reference/models/racformer_transformer.py:338-427`):
learned box-anchored 3D offsets (depth_num x groups x points), per-frame
velocity warp, per-layer shrinking radial (theta, d) perturbation, projection
into all cameras of all frames and multi-scale gather via
:func:`ops.sampling.sample_image_features`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bbox_codec import theta_d_to_xy, xy_to_theta_d
from ..ops.sampling import make_sample_points, sample_image_features
from .bev_sampling import radial_offsets


class ImageRadialSampling(nn.Module):
    embed_dims: int = 256
    num_frames: int = 8
    num_groups: int = 4
    num_points: int = 4
    num_levels: int = 4
    depth_num: int = 3
    pc_range: tuple = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    img_pallas: Any = None  # None = auto (ops.msmv.resolve_img_pallas)
    fused_cat: bool = False  # mlvl_feats = [level-concatenated fused map]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query_ray: jax.Array,
        query_feat: jax.Array,
        mlvl_feats: Sequence[jax.Array],
        lidar2img: jax.Array,
        time_diff: jax.Array,
        image_hw: tuple,
        d_region,
        pre_padded: bool = False,
        pre_fused: bool = False,
    ) -> jax.Array:
        """query_ray: [B, Q, 10] polar; mlvl_feats: L x [B, T, G, N, H, W, C];
        lidar2img: [B, T, N, 4, 4]; time_diff: [B, T]. Returns [B, Q, G, T*P*D, c]."""
        B, Q, _ = query_ray.shape
        T, G, P, D, L = (
            self.num_frames,
            self.num_groups,
            self.num_points,
            self.depth_num,
            self.num_levels,
        )

        query_bbox = theta_d_to_xy(query_ray)

        # reference init: zero weights, bias ~ U(-0.5, 0.5)
        # (`racformer_transformer.py:355-358`)
        off = nn.Dense(
            D * G * P * 3,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -0.5, 0.5),
            dtype=jnp.float32,
            name="sampling_offset",
        )(query_feat)
        off = off.reshape(B, Q, G * P * D, 3)
        pts = make_sample_points(query_bbox, off, self.pc_range)  # [B, Q, GPD, 3]

        pts = jnp.broadcast_to(pts[:, :, None], (B, Q, T, G * P * D, 3))
        vel = jax.lax.stop_gradient(query_ray[..., 8:10])
        dist = vel[:, :, None, :] * time_diff[:, None, :, None]  # [B, Q, T, 2]
        xy = pts[..., 0:2] - dist[:, :, :, None, :]
        z = pts[..., 2:3]

        lo = jnp.asarray(self.pc_range[0:2])
        hi = jnp.asarray(self.pc_range[3:5])
        xy_n = (xy - lo) / (hi - lo)

        td = xy_to_theta_d(jnp.concatenate([xy_n, z], axis=-1))  # (theta, d, z)
        d_off = radial_offsets(
            query_feat,
            nn.Dense(D, dtype=jnp.float32, name="ray_points_offset"),
            d_region,
            D,
        )
        # unstacked flow (see bev_sampling): the stacked trailing-3 form
        # turned the radial-offset add into a dynamic-update-slice
        theta = td[..., 0].reshape(B, Q, T, G, P, D)
        dd = td[..., 1].reshape(B, Q, T, G, P, D) + d_off[
            :, :, None, None, None, :]
        from ..ops.bbox_codec import theta_d_pair_to_xy

        bxn, byn = theta_d_pair_to_xy(theta.reshape(B, Q, T, G, P * D),
                                      dd.reshape(B, Q, T, G, P * D))
        bx = bxn * (hi[0] - lo[0]) + lo[0]
        by = byn * (hi[1] - lo[1]) + lo[1]
        bz = z.reshape(B, Q, T, G, P * D)
        sample_points = jnp.stack([bx, by, bz], axis=-1)

        # DUMP-equivalent capture of the sampling points
        # (`models/sparsebev_sampling.py:82-87`)
        self.sow("intermediates", "sample_points", sample_points)

        w = nn.Dense(G * T * D * P * L, dtype=jnp.float32, name="scale_weights")(query_feat)
        w = w.reshape(B, Q, G, T, D * P, L)
        w = jax.nn.softmax(w, axis=-1)

        # per-level true dims: the stored fused maps are W-aligned for the
        # Pallas gather (`pad_for_sampling(align=True)` in
        # `RaCFormer.encode_frame`, which asserts these strides), so the
        # sampler cannot derive them from the stored shape
        true_hws = None
        if pre_fused:
            true_hws = [(image_hw[0] // (4 << l), image_hw[1] // (4 << l))
                        for l in range(L)]
        cat_geom = None
        if self.fused_cat:
            # geometry of the level-concatenated map (RaCFormer._trunk):
            # level l of camera n starts at row n * rcat + roffs[l]
            from ..ops.bilinear import PAD

            r0s = [h + 2 * PAD - 1 for (h, _) in true_hws]
            roffs = [sum(r0s[:l]) for l in range(L)]
            cat_geom = (true_hws, roffs, sum(r0s))
        return sample_image_features(
            sample_points, mlvl_feats, w, lidar2img, image_hw[0], image_hw[1],
            pre_padded=pre_padded, pre_fused=pre_fused, pallas=self.img_pallas,
            true_hws=true_hws, cat_geom=cat_geom,
        )
