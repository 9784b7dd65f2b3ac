"""Gradient accumulation: the reference recipe's 2 samples/device without
the activation memory of a fused B=2 pass (train/step.py accum_steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.train import TrainState, make_optimizer, make_train_step

from tests.test_model_forward import make_model, tiny_batch
from racformer_tpu.model import preprocess_images


@pytest.mark.slow
def test_accumulated_step_runs_and_updates(rng):
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

    step2 = make_train_step(model, tx, depth_cfg=dict(num_bins=16),
                            accum_steps=2)
    new_state, metrics = jax.jit(
        lambda s, b, r: step2(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))

    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    assert float(metrics["grad_norm"]) > 0
    # parameters actually moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # the accumulated loss is the mean over microbatches of the same keys a
    # plain step produces
    step1 = make_train_step(model, tx, depth_cfg=dict(num_bins=16))
    _, m1 = jax.jit(
        lambda s, b, r: step1(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))
    assert set(m1.keys()) == set(metrics.keys())


@pytest.mark.slow
def test_loss_scale_matches_unscaled_step(rng):
    """The fp16 parity-debug option (`/root/reference/configs/..._f8.py:294`
    `loss_scale=512.`): scaling the loss before grad and unscaling after must
    reproduce the unscaled update (here in fp32, so exactly up to rounding)
    and must NOT change the reported (unscaled) loss metrics."""
    batch, gts = tiny_batch(rng, B=1)
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

    plain = make_train_step(model, tx, depth_cfg=dict(num_bins=16))
    scaled = make_train_step(model, tx, depth_cfg=dict(num_bins=16),
                             loss_scale=512.0)
    s0, m0 = jax.jit(
        lambda s, b, r: plain(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))
    s1, m1 = jax.jit(
        lambda s, b, r: scaled(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m0["loss_total"]),
                               float(m1["loss_total"]), rtol=1e-6)
    np.testing.assert_allclose(float(m0["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-3)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s0.params, s1.params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4
