import jax.numpy as jnp
import numpy as np

from racformer_tpu.eval import decode_boxes


def test_decode_topk_and_threshold(rng):
    B, Q, C = 1, 50, 10
    cls = np.full((B, Q, C), -20.0, np.float32)
    box = rng.normal(size=(B, Q, 10)).astype(np.float32)
    box[..., 0:2] = 0.0  # centers at origin (in range)
    # two confident detections
    cls[0, 3, 2] = 5.0
    cls[0, 7, 4] = 4.0
    out = decode_boxes(jnp.asarray(cls), jnp.asarray(box), max_num=10)
    valid = np.asarray(out["valid"])[0]
    assert valid.sum() == 2
    labels = np.asarray(out["labels"])[0]
    assert labels[0] == 2 and labels[1] == 4
    scores = np.asarray(out["scores"])[0]
    assert scores[0] > scores[1] > 0.9


def test_decode_range_filter(rng):
    B, Q, C = 1, 4, 10
    cls = np.full((B, Q, C), 5.0, np.float32)
    box = np.zeros((B, Q, 10), np.float32)
    box[0, :, 0] = 100.0  # out of post_center_range
    out = decode_boxes(jnp.asarray(cls), jnp.asarray(box), max_num=4)
    assert not np.asarray(out["valid"]).any()


def test_decode_z_shift(rng):
    B, Q, C = 1, 4, 10
    cls = np.full((B, Q, C), 5.0, np.float32)
    box = np.zeros((B, Q, 10), np.float32)
    box[..., 5] = np.log(2.0)  # h = 2
    out = decode_boxes(jnp.asarray(cls), jnp.asarray(box), max_num=4)
    np.testing.assert_allclose(np.asarray(out["bboxes"])[0, :, 2], -1.0, atol=1e-5)


def test_decode_legacy_v0171_flip():
    """legacy_version='v0.17.1' swaps w/l and flips yaw := -yaw - pi/2
    (`/root/reference/models/racformer_head.py:497-501`)."""
    import numpy as np

    rng = np.random.default_rng(0)
    cls = jnp.asarray(rng.normal(size=(1, 8, 3)), jnp.float32)
    box = jnp.asarray(rng.normal(size=(1, 8, 10)) * 0.3, jnp.float32)
    new = decode_boxes(cls, box, max_num=5, legacy_version="v0.17.1")
    old = decode_boxes(cls, box, max_num=5)
    np.testing.assert_allclose(new["bboxes"][..., 3], old["bboxes"][..., 4], rtol=1e-6)
    np.testing.assert_allclose(new["bboxes"][..., 4], old["bboxes"][..., 3], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new["bboxes"][..., 6]),
        -np.asarray(old["bboxes"][..., 6]) - np.pi / 2, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(new["valid"]), np.asarray(old["valid"]))
