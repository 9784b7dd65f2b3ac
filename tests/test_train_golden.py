"""Train-mode flagship-shape loss golden (VERDICT r4 item 2).

The eval-mode flagship golden (test_integration_golden.py) covers the
forward; this covers the TRAINING numerics that remained golden-tested only
at toy shapes: Hungarian targets, the polar match costs, per-layer focal/L1
set losses, the DN loss, and the SID depth focal loss — all at production
geometry (6 cams x 8 frames x 256x704, D=96, 128^2 BEV, Q=900 + DN).

Protocol: ONE flax train-mode forward produces the head outputs (incl. the
DN split); the flax loss stack (`train/losses.py`) and an independent torch
restatement of the reference loss (`tests/torch_mirror.py::
mirror_detection_losses` / `mirror_depth_loss`, written from
`/root/reference/models/racformer_head.py:249-485` and
`models/necks/view_transformer_racformer.py:593-678`) consume the SAME
outputs and must produce the same per-component losses. This pins the loss
semantics; the forward itself is pinned by the integration goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from racformer_tpu.model import RaCFormer, preprocess_images
from racformer_tpu.train.losses import depth_loss, detection_loss

from tests.test_model_forward import tiny_batch
from tests.torch_mirror import mirror_depth_loss, mirror_detection_losses


def _make_gt_depth(rng, batch):
    """Sparse lidar-style depth map [B, N, H, W] for frame 0 (0 = missing),
    ~5% fill like real projected sweeps."""
    B, _, N, H, W, _ = batch["imgs"].shape
    d = rng.uniform(0.5, 70.0, size=(B, N, H, W)).astype(np.float32)
    return np.where(rng.uniform(size=d.shape) < 0.05, d, 0.0)


def _run_case(cfg, batch, gts, depth_cfg):
    model = RaCFormer(**cfg)
    args = [preprocess_images(jnp.asarray(batch["imgs"]))] + [
        jnp.asarray(batch[k]) for k in (
            "radar_points", "radar_mask", "radar_depth", "radar_rcs",
            "lidar2img", "img2lidar", "time_diff")]
    gt = dict(gt_bboxes=jnp.asarray(gts["gt_bboxes"]),
              gt_labels=jnp.asarray(gts["gt_labels"]),
              gt_mask=jnp.asarray(gts["gt_mask"]))
    rngs = {"params": jax.random.PRNGKey(0), "dn": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(model.init)(rngs, *args, **gt)
    outs, _ = jax.jit(
        lambda v, *a, **kw: model.apply(
            v, *a, **kw,
            rngs={"dn": jax.random.PRNGKey(1),
                  "dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
    )(variables, *args, **gt)

    got = detection_loss(outs, gt["gt_bboxes"], gt["gt_labels"],
                         gt["gt_mask"], num_classes=model.num_classes)
    got["loss_depth"] = depth_loss(
        outs["depth_logits"], jnp.asarray(gts["gt_depth"]), **depth_cfg)
    got = {k: float(v) for k, v in got.items()}

    t = lambda a: torch.from_numpy(np.asarray(a, np.float32))
    want = mirror_detection_losses(
        t(outs["all_cls_scores"]), t(outs["all_bbox_preds"]),
        t(gts["gt_bboxes"]),
        torch.from_numpy(np.asarray(gts["gt_labels"])).long(),
        torch.from_numpy(np.asarray(gts["gt_mask"])),
        dn_cls=t(outs["dn_cls_scores"]) if "dn_cls_scores" in outs else None,
        dn_bbox=t(outs["dn_bbox_preds"]) if "dn_bbox_preds" in outs else None,
        dn_valid=(torch.from_numpy(np.asarray(
            outs["dn_meta"]["dn_valid"])) if "dn_meta" in outs else None),
        num_classes=model.num_classes,
    )
    want["loss_depth"] = mirror_depth_loss(
        t(outs["depth_logits"]), t(gts["gt_depth"]),
        num_bins=depth_cfg["num_bins"],
        downsample=depth_cfg.get("downsample", 16))
    deltas = {}
    for k, v in want.items():
        assert k in got, (k, sorted(got))
        w = float(v)
        deltas[k] = abs(got[k] - w) / max(abs(w), 1e-6)
        np.testing.assert_allclose(got[k], w, rtol=2e-4, atol=1e-5,
                                   err_msg=k)
    return deltas


@pytest.mark.slow
def test_train_loss_golden_tiny(rng):
    """Fast version of the golden at tiny shapes (same code path)."""
    batch, gts = tiny_batch(rng, B=2)
    gts["gt_depth"] = _make_gt_depth(rng, batch)
    cfg = dict(num_cams=2, num_frames=2, embed_dims=64, num_query=12,
               num_clusters=2, image_hw=(64, 128), depth_bins=16,
               bev_size=(32, 32), max_gt=4, train_mode=True,
               trunk_dtype=jnp.float32)
    _run_case(cfg, batch, gts, dict(num_bins=16, downsample=16))


@pytest.mark.slow
def test_train_loss_golden_flagship_shapes(rng):
    """The golden at production geometry — the last untested numerics
    surface before real data (matching/DN/losses at 900 queries + DN pad,
    ~32 GT, D=96, 6 layers). CPU-heavy: expect tens of minutes."""
    batch, gts = tiny_batch(rng, B=1, T=8, N=6, H=256, W=704, P=256,
                            max_gt=32)
    gts["gt_depth"] = _make_gt_depth(rng, batch)
    cfg = dict(train_mode=True, trunk_dtype=jnp.float32, max_gt=32)
    deltas = _run_case(cfg, batch, gts, dict(num_bins=96, downsample=16))
    print("flagship per-loss relative deltas:",
          {k: f"{v:.2e}" for k, v in deltas.items()})
