"""Match-statistics dump: the working equivalent of the reference's dead
`ISSaveHook` (`/root/reference/models/hook/is_save.py` reads a
`pts_bbox_head.match_dict` the head never populates). Here the per-layer
Hungarian assignment leaves the jitted step as `_matched_q`/`_match_cost`
metrics (losses.detection_loss with_match=True) and `MatchStatsHook` dumps
them per epoch in the reference's `dec_{i}/rank_{r}/match_epoch{e}.json`
layout."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.train import TrainState, make_optimizer, make_train_step
from racformer_tpu.train.hooks import MatchStatsHook
from racformer_tpu.train.losses import detection_loss
from racformer_tpu.train.matching import hungarian_assign, match_cost
from racformer_tpu.train.losses import CODE_WEIGHTS
from racformer_tpu.model import preprocess_images

from tests.test_model_forward import make_model, tiny_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_outs(rng, L=2, B=2, Q=6, G=3, C=4):
    outs = {
        "all_cls_scores": jnp.asarray(rng.normal(size=(L, B, Q, C)), jnp.float32),
        "all_bbox_preds": jnp.asarray(rng.normal(size=(L, B, Q, 10)), jnp.float32),
    }
    gt_bboxes = jnp.asarray(rng.uniform(-5.0, 5.0, size=(B, G, 9)), jnp.float32)
    gt_labels = jnp.tile(jnp.arange(G) % C, (B, 1))
    gt_mask = jnp.asarray([[True] * G, [True, True, False]])
    return outs, gt_bboxes, gt_labels, gt_mask, C


def test_detection_loss_with_match_returns_assignment(rng):
    outs, gt_bboxes, gt_labels, gt_mask, C = _fake_outs(rng)
    losses = detection_loss(outs, gt_bboxes, gt_labels, gt_mask,
                            num_classes=C, with_match=True)
    mq = np.asarray(losses["_matched_q"])
    mc = np.asarray(losses["_match_cost"])
    L, B, Q, _ = outs["all_cls_scores"].shape
    G = gt_bboxes.shape[1]
    assert mq.shape == (L, B, G) and mc.shape == (L, B, G)
    assert mq.dtype == np.int32
    assert (mq >= 0).all() and (mq < Q).all()

    # agrees with a direct assignment on the same cost matrix
    safe_labels = jnp.where(gt_mask, gt_labels, 0)
    cost = jax.vmap(jax.vmap(
        lambda cs, bp, gb, gl, gm: match_cost(cs, bp, gb, gl, gm, CODE_WEIGHTS),
        in_axes=(0, 0, 0, 0, 0)), in_axes=(0, 0, None, None, None),
    )(outs["all_cls_scores"], outs["all_bbox_preds"], gt_bboxes,
      safe_labels, gt_mask)
    expect = np.asarray(hungarian_assign(cost))
    np.testing.assert_array_equal(mq, expect)
    got_cost = np.take_along_axis(np.asarray(cost), mq[:, :, None, :],
                                  axis=2)[:, :, 0, :]
    np.testing.assert_allclose(mc, got_cost, rtol=1e-6)

    # diagnostics don't perturb the losses
    plain = detection_loss(outs, gt_bboxes, gt_labels, gt_mask, num_classes=C)
    for k, v in plain.items():
        np.testing.assert_allclose(np.asarray(losses[k]), np.asarray(v))


def test_hook_dumps_reference_layout(tmp_path):
    hook = MatchStatsHook(str(tmp_path), rank=0)
    L, B, G = 2, 1, 3
    metrics = {
        "_matched_q": np.arange(L * B * G, dtype=np.int32).reshape(L, B, G),
        "_match_cost": np.full((L, B, G), 0.5, np.float32),
    }
    labels = np.asarray([[1, 2, 0]])
    mask = np.asarray([[True, True, False]])
    hook.record(0, metrics, labels, mask)
    hook.record(1, metrics, labels, mask)
    hook.after_epoch(0)
    for layer in range(L):
        p = tmp_path / f"dec_{layer}" / "rank_0" / "match_epoch0.json"
        assert p.exists(), p
        data = json.loads(p.read_text())
        assert set(data) == {"0", "1"}
        entry = data["0"][0]
        # padded GT slot dropped by the mask
        assert entry["label"] == [1, 2]
        assert len(entry["matched_q"]) == 2
        assert entry["cost"] == [0.5, 0.5]
    # reset after dump, like the reference's save_is_dict
    hook.after_epoch(1)
    assert not (tmp_path / "dec_0" / "rank_0" / "match_epoch1.json").exists()


@pytest.mark.slow
def test_match_stats_through_accumulated_step(rng):
    """The accum path stacks per-microbatch assignments and restores the
    original sample order (inverse of the interleaved split)."""
    batch, gts = tiny_batch(rng, B=2)
    model = make_model(train=True)
    batch = {k: jnp.asarray(v) for k, v in {**batch, **gts}.items()}
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        preprocess_images(batch["imgs"]),
        batch["radar_points"], batch["radar_mask"], batch["radar_depth"],
        batch["radar_rcs"], batch["lidar2img"], batch["img2lidar"],
        batch["time_diff"], gt_bboxes=batch["gt_bboxes"],
        gt_labels=batch["gt_labels"], gt_mask=batch["gt_mask"],
    )
    params = variables["params"]
    tx, _ = make_optimizer(params, total_steps=10)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))

    step = make_train_step(model, tx, depth_cfg=dict(num_bins=16),
                           accum_steps=2, match_stats=True)
    _, metrics = jax.jit(
        lambda s, b, r: step(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))

    Q = model.num_query
    G = batch["gt_bboxes"].shape[1]
    mq = np.asarray(metrics["_matched_q"])
    assert mq.shape[1:] == (2, G)
    assert (mq >= 0).all() and (mq < Q).all()
    assert np.isfinite(np.asarray(metrics["_match_cost"])).all()
    # scalar losses unaffected by the diagnostic keys
    assert np.isfinite(float(metrics["loss_total"]))


@pytest.mark.slow
def test_train_driver_match_stats(tmp_path):
    from tests.test_drivers import TINY

    wd = tmp_path / "wd"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "train.py",
         "--config", "racformer_tpu/configs/racformer_r50_nuimg_704x256_f8.py",
         "--synthetic", "--max-steps", "2", "--match-stats",
         "--work-dir", str(wd),
         "--override", *TINY, "optimizer.warmup_steps=1"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    root = wd / "match_stats" / "dec_0" / "rank_0"
    files = list(root.glob("match_epoch*.json")) if root.exists() else []
    assert files, (r.stdout[-1000:], list(wd.rglob("*")))
    data = json.loads(files[0].read_text())
    assert data  # at least one step recorded
    first = next(iter(data.values()))[0]
    assert set(first) == {"matched_q", "cost", "label"}
