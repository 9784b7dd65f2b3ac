"""Tests for the native C++ data-prep library (libjpeg decode + fused
resize/crop/flip + radar column rasterizer), vs PIL/numpy oracles."""

import io

import numpy as np
import pytest
from PIL import Image

from racformer_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


def _smooth(rng, h, w):
    """Smooth test image (JPEG handles noise terribly; use gradients)."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [x / w * 255, y / h * 255, (x + y) / (h + w) * 255], axis=-1
    )
    return img.astype(np.uint8)


def _jpeg_bytes(rng, h=96, w=128):
    img = _smooth(rng, h, w)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue(), img


def test_decode_jpeg(rng):
    data, img = _jpeg_bytes(rng)
    out = native.decode_jpeg(data)
    assert out is not None and out.shape == img.shape
    # compare against PIL's decode of the SAME bytes — codecs must agree
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(out.astype(float) - pil.astype(float)).mean() < 1.0
    assert np.abs(out.astype(float) - img.astype(float)).mean() < 4.0


def test_resize_crop_flip_matches_pil(rng):
    img = _smooth(rng, 100, 160)
    scale, crop, ohw = 0.5, (5, 3), (40, 60)
    got = native.resize_crop_flip(img, scale, crop, False, ohw, to_bgr=False)

    pil = Image.fromarray(img).resize((80, 50), Image.BILINEAR)
    want = np.asarray(pil.crop((crop[0], crop[1], crop[0] + 60, crop[1] + 40)))
    # both are bilinear but PIL uses triangle-filter antialiasing on
    # downscale; allow a loose tolerance and require strong correlation
    diff = np.abs(got - want.astype(np.float32))
    assert diff.mean() < 12.0
    c = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert c > 0.95


def test_flip_and_bgr(rng):
    img = (rng.uniform(0, 255, size=(32, 32, 3))).astype(np.uint8)
    a = native.resize_crop_flip(img, 1.0, (0, 0), False, (32, 32), to_bgr=False)
    b = native.resize_crop_flip(img, 1.0, (0, 0), True, (32, 32), to_bgr=False)
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-4)
    c = native.resize_crop_flip(img, 1.0, (0, 0), False, (32, 32), to_bgr=True)
    np.testing.assert_allclose(a, c[..., ::-1], atol=1e-4)


def test_radar_columns_nearest_wins(rng):
    uvdr = np.array(
        [[10.0, 0.0, 20.0, 1.5], [10.2, 0.0, 8.0, 2.5], [200.0, 0.0, 5.0, 3.0]],
        np.float32,
    )
    depth, rcs = native.radar_columns(uvdr, (16, 64))
    assert (depth[:, 10] == 8.0).all()  # nearest wins in the same column
    assert (rcs[:, 10] == 2.5).all()
    assert (depth[:, 11] == 0).all()
    assert (rcs[:, 11] == -1000.0).all()


def test_radar_columns_matches_numpy(rng):
    """Native rasterizer agrees with the numpy reference path."""
    from racformer_tpu.data.depth_maps import project_to_image, radar_to_depth_rcs_maps

    l2i = np.eye(4, dtype=np.float32)
    l2i[0, 0] = l2i[1, 1] = 120.0
    l2i[0, 2], l2i[1, 2] = 60.0, 30.0
    pts = np.concatenate(
        [rng.uniform(-5, 5, size=(200, 2)), rng.uniform(1, 50, size=(200, 1)),
         rng.uniform(-10, 10, size=(200, 1))], axis=1).astype(np.float32)
    # camera looks +z: project (x, y, z)
    want_d, want_r = radar_to_depth_rcs_maps(pts, l2i, (60, 120))
    u, v, d = project_to_image(pts[:, :3], l2i)
    uvdr = np.stack([u, v, d, pts[:, 3]], 1).astype(np.float32)
    got_d, got_r = native.radar_columns(uvdr, (60, 120))
    np.testing.assert_allclose(got_d, want_d, atol=1e-4)
    np.testing.assert_allclose(got_r, want_r, atol=1e-4)
