"""End-to-end smoke tests for the assembled RaCFormer model (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.model import RaCFormer, preprocess_images


def tiny_batch(rng, B=1, T=2, N=2, H=64, W=128, P=64, max_gt=4):
    l2i = np.broadcast_to(np.eye(4, dtype=np.float32), (B, T, N, 4, 4)).copy()
    l2i[..., 0, 0] = 100.0
    l2i[..., 1, 1] = 100.0
    l2i[..., 0, 2] = W / 2
    l2i[..., 1, 2] = H / 2
    batch = dict(
        imgs=rng.uniform(0, 255, size=(B, T, N, H, W, 3)).astype(np.float32),
        radar_points=rng.normal(size=(B, T, P, 7)).astype(np.float32) * 10,
        radar_mask=np.ones((B, T, P), bool),
        radar_depth=rng.uniform(0, 60, size=(B, T, N, H, W)).astype(np.float32),
        radar_rcs=rng.uniform(-30, 30, size=(B, T, N, H, W)).astype(np.float32),
        lidar2img=l2i,
        img2lidar=np.linalg.inv(l2i).astype(np.float32),
        time_diff=np.tile(np.arange(T, dtype=np.float32) * 0.5, (B, 1)),
    )
    gts = dict(
        gt_bboxes=np.abs(rng.normal(size=(B, max_gt, 9))).astype(np.float32) + 0.5,
        gt_labels=rng.integers(0, 10, size=(B, max_gt)),
        gt_mask=np.broadcast_to(np.arange(max_gt)[None, :] < 2,
                                (B, max_gt)).copy(),
    )
    return batch, gts


def make_model(train, max_gt=4, **over):
    over.setdefault("trunk_dtype", jnp.float32)
    return RaCFormer(
        num_cams=2,
        num_frames=2,
        embed_dims=64,
        num_query=12,
        num_clusters=2,
        image_hw=(64, 128),
        depth_bins=16,
        bev_size=(32, 32),
        max_gt=max_gt,
        train_mode=train,
        **over,
    )


@pytest.mark.slow
def test_eval_forward(rng):
    batch, _ = tiny_batch(rng)
    model = make_model(train=False)
    variables = model.init(
        jax.random.PRNGKey(0), preprocess_images(batch["imgs"]), *list(batch.values())[1:]
    )
    outs = model.apply(
        variables, preprocess_images(batch["imgs"]), *list(batch.values())[1:]
    )
    L = 6
    assert outs["all_cls_scores"].shape == (L, 1, 12, 10)
    assert outs["all_bbox_preds"].shape == (L, 1, 12, 10)
    assert outs["depth_logits"].shape == (1, 2, 4, 8, 16)
    assert np.isfinite(np.asarray(outs["all_cls_scores"])).all()
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()
    # centers must live inside the extended pc range
    assert np.abs(np.asarray(outs["all_bbox_preds"])[..., 0:2]).max() <= 61.2


@pytest.mark.slow
def test_train_forward_with_dn(rng):
    batch, gts = tiny_batch(rng)
    model = make_model(train=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        preprocess_images(batch["imgs"]),
        *list(batch.values())[1:],
        **gts,
    )
    outs, _ = model.apply(
        variables,
        preprocess_images(batch["imgs"]),
        *list(batch.values())[1:],
        **gts,
        rngs={"dn": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    S = 4 * 10  # max_gt * dn_groups
    assert outs["dn_cls_scores"].shape == (6, 1, S, 10)
    assert outs["all_cls_scores"].shape == (6, 1, 12, 10)
    assert np.isfinite(np.asarray(outs["dn_bbox_preds"])).all()


@pytest.mark.slow
def test_bn_frame0_only_reference_semantics(rng):
    """`bn_frame0_only=True` reproduces the reference's train-mode BN rule
    (`/root/reference/models/racformer.py:316-331`): the BEV branches'
    updated batch statistics come from frame 0 ONLY, so perturbing history
    frames' radar/depth inputs must not move them. The default batched path
    pools stats over all T frames (the documented deviation this flag
    bounds — docs/PARITY.md)."""
    batch, gts = tiny_batch(rng)
    pert = {k: np.copy(v) for k, v in batch.items()}
    # history-frame (t>0) inputs only; imgs untouched so the trunk (whose
    # BNs are frozen anyway) sees identical data
    pert["radar_points"][:, 1:] *= 5.0
    pert["radar_depth"][:, 1:] += 7.0
    pert["radar_rcs"][:, 1:] *= -2.0

    def new_stats(model, b):
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            preprocess_images(b["imgs"]), *list(b.values())[1:], **gts,
        )
        _, mut = model.apply(
            variables, preprocess_images(b["imgs"]), *list(b.values())[1:],
            **gts,
            rngs={"dn": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    ref = make_model(train=True, bn_frame0_only=True)
    s0 = new_stats(ref, batch)
    s1 = new_stats(ref, pert)
    for key in ("radar_encoder", "img_lss_view_transformer"):
        a = jax.tree_util.tree_leaves(s0[key])
        b = jax.tree_util.tree_leaves(s1[key])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0,
                                       err_msg=f"{key} stats moved")

    default = make_model(train=True)
    d0 = new_stats(default, batch)
    d1 = new_stats(default, pert)
    moved = max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max())
        for x, y in zip(jax.tree_util.tree_leaves(d0["radar_encoder"]),
                        jax.tree_util.tree_leaves(d1["radar_encoder"])))
    assert moved > 1e-6  # the default path pools history frames into stats
