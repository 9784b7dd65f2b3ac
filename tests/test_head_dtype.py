"""bf16 decoder/head compute path (`RaCFormer(head_dtype=bfloat16)`).

The reference trains the WHOLE model fp16 with loss-scale 512
(`/root/reference/configs/racformer_r50_nuimg_704x256_f8.py:282-308`); the
TPU-native analogue is bf16 compute with fp32 master weights (no loss scale
needed — bf16 keeps fp32's exponent range). The trunk already runs bf16;
these tests pin the head's mixed-precision contract when the head joins it:
coordinate/bbox math stays fp32 (the sampling offset branches pin
dtype=jnp.float32 explicitly; the bbox carry is f32), and the public outputs
(cls scores, bbox preds) are f32 regardless of head_dtype."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.model import preprocess_images
from racformer_tpu.train import TrainState, make_optimizer, make_train_step

from tests.test_model_forward import make_model, tiny_batch


def _bf16_model(train):
    return make_model(train=train, head_dtype=jnp.bfloat16)


@pytest.mark.slow
def test_eval_forward_bf16_head_finite_and_f32_outputs(rng):
    batch, _ = tiny_batch(rng)
    model = _bf16_model(train=False)
    args = (preprocess_images(batch["imgs"]), *list(batch.values())[1:])
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    outs = jax.jit(model.apply)(variables, *args)
    cls, box = outs["all_cls_scores"], outs["all_bbox_preds"]
    assert cls.dtype == jnp.float32 and box.dtype == jnp.float32
    assert np.isfinite(np.asarray(cls)).all()
    assert np.isfinite(np.asarray(box)).all()

    # close to the fp32-head model on identical weights: same params pytree
    # (dtype is compute-only, param_dtype stays fp32), bf16 rounding only
    model32 = make_model(train=False)
    outs32 = jax.jit(model32.apply)(variables, *args)
    # boxes are bounded (sigmoid/denorm); cls are logits. bf16 through 6
    # iterations accumulates rounding, so the gate is loose — this is a
    # drift alarm, not a golden
    assert np.median(
        np.abs(np.asarray(outs32["all_bbox_preds"]) - np.asarray(box))
    ) < 0.5


@pytest.mark.slow
def test_train_step_bf16_head(rng):
    batch, gts = tiny_batch(rng, B=1)
    # string form: exactly what an AST-parsed config override delivers
    model = make_model(train=True, head_dtype="bfloat16")
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
    # master weights stay fp32 under a bf16 compute dtype
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(params)
        if jnp.issubdtype(leaf.dtype, jnp.floating)
    )
    tx, _ = make_optimizer(params, total_steps=10)
    state = TrainState(params, variables.get("batch_stats", {}),
                       tx.init(params), jnp.zeros((), jnp.int32))
    step = make_train_step(model, tx, depth_cfg=dict(num_bins=16))
    new_state, metrics = jax.jit(
        lambda s, b, r: step(s, b, r, 2.0))(state, batch, jax.random.PRNGKey(5))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["grad_norm"]) > 0.0


def test_head_dtype_accepts_config_string():
    """Configs are AST-parsed, so `model.head_dtype='bfloat16'` arrives as a
    string; flax/jnp must accept it end-to-end (promote_dtype/astype do)."""
    m = make_model(train=False, head_dtype="bfloat16")
    assert jnp.dtype(m.head_dtype) == jnp.bfloat16
