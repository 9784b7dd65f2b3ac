"""Device-side training augmentation (jitted, batched).

Capability match for the reference's GPU-side augmentation
(`/root/reference/models/utils.py:8-45` GridMask,
`GpuPhotoMetricDistortion` applied at `models/racformer.py:197-224`):
photometric distortion (brightness / contrast / saturation / hue jitter) and
GridMask occlusion. The reference draws shared parameters per batch on the
host with numpy; here everything is drawn from a JAX PRNG key inside the
jitted train step, fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def photometric_distortion(key, imgs, brightness_delta=32.0,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5), hue_delta=18.0):
    """imgs: [..., H, W, 3] raw 0-255 BGR. Returns jittered images.

    Follows mmdet PhotoMetricDistortion semantics: random brightness, random
    contrast (before or after color jitter), saturation/hue in HSV-ish space
    approximated with the standard luma/chroma transform (exact HSV round-trip
    is branch-heavy; the luma approximation is standard on accelerators and
    spans the same perturbation family).
    """
    ks = jax.random.split(key, 8)
    B = imgs.shape[0] if imgs.ndim > 3 else 1
    shape = (B,) + (1,) * (imgs.ndim - 1)

    x = imgs.astype(jnp.float32)

    # brightness
    do_b = jax.random.bernoulli(ks[0], 0.5, shape)
    delta = jax.random.uniform(ks[1], shape, minval=-brightness_delta, maxval=brightness_delta)
    x = jnp.where(do_b, x + delta, x)

    # contrast
    do_c = jax.random.bernoulli(ks[2], 0.5, shape)
    alpha = jax.random.uniform(ks[3], shape, minval=contrast_range[0], maxval=contrast_range[1])
    x = jnp.where(do_c, x * alpha, x)

    # saturation: blend with per-pixel gray (BGR luma)
    do_s = jax.random.bernoulli(ks[4], 0.5, shape)
    sat = jax.random.uniform(ks[5], shape, minval=saturation_range[0], maxval=saturation_range[1])
    luma = (0.114 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.299 * x[..., 2:3])
    x = jnp.where(do_s, luma + (x - luma) * sat, x)

    # hue: rotate the two chroma axes (approximate HSV hue shift)
    do_h = jax.random.bernoulli(ks[6], 0.5, shape)
    ang = jax.random.uniform(ks[7], shape, minval=-hue_delta, maxval=hue_delta) * (jnp.pi / 90.0)
    cb = x[..., 0:1] - luma
    cr = x[..., 2:3] - luma
    cb2 = cb * jnp.cos(ang) - cr * jnp.sin(ang)
    cr2 = cb * jnp.sin(ang) + cr * jnp.cos(ang)
    hue_x = jnp.concatenate(
        [luma + cb2, x[..., 1:2], luma + cr2], axis=-1
    )
    x = jnp.where(do_h, hue_x, x)

    return jnp.clip(x, 0.0, 255.0)


def grid_mask(key, imgs, ratio=0.5, prob=0.7):
    """GridMask occlusion (`models/utils.py:8-45`): zero out a regular grid of
    stripes with random period d in [2, H) and offsets; applied with
    probability `prob` to the whole batch (the reference draws one mask for
    all images in the batch)."""
    H, W = imgs.shape[-3], imgs.shape[-2]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    apply = jax.random.bernoulli(k1, prob)
    d = jax.random.randint(k2, (), 2, H)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32), 1, d - 1)
    st_h = jax.random.randint(k3, (), 0, d)
    st_w = jax.random.randint(k4, (), 0, d)

    ys = jnp.arange(H)
    xs = jnp.arange(W)
    # stripe pattern: masked where ((coord + offset') mod d) < l, mirroring the
    # reference's shifted-grid construction on the 1.5x canvas
    off_h = jnp.mod(ys + (d - jnp.mod(st_h + (H // 4), d)), d)
    off_w = jnp.mod(xs + (d - jnp.mod(st_w + (W // 4), d)), d)
    row_masked = off_h < l
    col_masked = off_w < l
    keep = ~(row_masked[:, None] | col_masked[None, :])  # [H, W]
    keep = keep.astype(imgs.dtype)[..., None]
    return jnp.where(apply, imgs * keep, imgs)
