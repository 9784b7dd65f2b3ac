"""Streaming (frame-cache) eval matches the offline path when fed the same
window, and only pays one frame of trunk compute per step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.eval.streaming import StreamingEvaluator
from racformer_tpu.model import preprocess_images
from tests.test_model_forward import make_model, tiny_batch


@pytest.mark.slow
def test_streaming_consistency(rng):
    batch, _ = tiny_batch(rng, T=2)
    model = make_model(train=False)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(batch["imgs"])),
        *[jnp.asarray(batch[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    ev = StreamingEvaluator(model, variables)
    # feed frame 1 (oldest) then frame 0; after 2 steps the cache holds the
    # same window as the offline batch (frame 0 newest)
    for t in [1, 0]:
        frame = dict(
            imgs=batch["imgs"][0, t],
            radar_points=batch["radar_points"][0, t],
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t],
            timestamp=-0.5 * t,
        )
        out = ev.step(frame)

    # offline reference on the identical window
    outs = model.apply(
        variables, preprocess_images(jnp.asarray(batch["imgs"])),
        *[jnp.asarray(batch[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )
    from racformer_tpu.eval import decode_boxes

    ref = jax.device_get(
        decode_boxes(outs["all_cls_scores"][-1], outs["all_bbox_preds"][-1])
    )
    np.testing.assert_allclose(
        out["scores"][0], ref["scores"][0], rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        out["bboxes"][0], ref["bboxes"][0], rtol=2e-2, atol=2e-2
    )

    # reset clears the temporal cache
    ev.reset()
    assert ev.cache is None


@pytest.mark.slow
def test_scene_boundary_reset_equivalence(rng):
    """Two back-to-back scenes through one evaluator (with reset at the
    boundary, as val.py does on scene_token change) must produce the same
    result as evaluating the second scene in a fresh evaluator — i.e. no
    temporal-cache bleed across scenes (the reference keys its cache by
    filename for the same reason, models/racformer.py:503-556)."""
    batch_a, _ = tiny_batch(rng, T=2)
    batch_b, _ = tiny_batch(np.random.default_rng(123), T=2)
    model = make_model(train=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        preprocess_images(jnp.asarray(batch_a["imgs"])),
        *[jnp.asarray(batch_a[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")],
    )

    def frame(batch, t):
        return dict(
            imgs=batch["imgs"][0, t],
            radar_points=batch["radar_points"][0, t],
            radar_mask=batch["radar_mask"][0, t],
            radar_depth=batch["radar_depth"][0, t],
            radar_rcs=batch["radar_rcs"][0, t],
            lidar2img=batch["lidar2img"][0, t],
            img2lidar=batch["img2lidar"][0, t],
            timestamp=0.5 * (1 - t),
        )

    ev = StreamingEvaluator(model, variables)
    for t in [1, 0]:
        ev.step(frame(batch_a, t))
    ev.reset()  # scene boundary
    for t in [1, 0]:
        out_joint = ev.step(frame(batch_b, t))

    ev2 = StreamingEvaluator(model, variables)
    for t in [1, 0]:
        out_solo = ev2.step(frame(batch_b, t))

    np.testing.assert_allclose(
        np.asarray(out_joint["scores"]), np.asarray(out_solo["scores"]),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_joint["bboxes"]), np.asarray(out_solo["bboxes"]),
        rtol=1e-5, atol=1e-5)
