"""Fused-epilogue eval gathers (round 5): the level-concatenated image
kernel and the fold-summed BEV kernel must reproduce the per-level
machinery's outputs exactly (same weights, same inputs).

The fused path is eval-only (no custom VJP) and requires 128-lane fused
channels (embed_dims/groups = 64), so the fixture uses embed_dims=256 at
small spatial shapes. On CPU the kernels run under the Pallas interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.model import RaCFormer, preprocess_images

from tests.test_model_forward import tiny_batch


def _model(fused):
    return RaCFormer(
        num_cams=2, num_frames=2, embed_dims=256, num_query=12,
        num_clusters=2, image_hw=(64, 128), depth_bins=16,
        bev_size=(32, 32), max_gt=4, train_mode=False,
        trunk_dtype=jnp.float32,
        decoder={"gather_dtype": jnp.float32},
        fused_gather=fused,
    )


@pytest.mark.slow
def test_fused_gather_matches_per_level_path(rng):
    batch, _ = tiny_batch(rng, B=1, T=2, N=2, H=64, W=128)
    args_np = [batch[k] for k in (
        "radar_points", "radar_mask", "radar_depth", "radar_rcs",
        "lidar2img", "img2lidar", "time_diff")]
    args = [preprocess_images(jnp.asarray(batch["imgs"]))] + [
        jnp.asarray(a) for a in args_np]

    base = _model(False)
    variables = jax.jit(base.init)(jax.random.PRNGKey(0), *args)
    want = jax.jit(base.apply)(variables, *args)

    fused = _model(True)
    got = jax.jit(fused.apply)(variables, *args)

    # identical weights, identical math up to the fused kernel's f32
    # accumulation order (the unfused epilogue sums in the same dtype here
    # because gather_dtype is f32)
    np.testing.assert_allclose(
        np.asarray(got["all_cls_scores"]),
        np.asarray(want["all_cls_scores"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got["all_bbox_preds"]),
        np.asarray(want["all_bbox_preds"]), rtol=2e-4, atol=2e-4)


def test_fused_gather_off_in_train_mode():
    m = RaCFormer(train_mode=True, fused_gather=True)
    assert m._fused() is False
