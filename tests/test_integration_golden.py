"""Full-detector integration golden: the composed torch mirror
(tests/torch_mirror.py, built from the reference sources) and the flax
detector must produce the same eval-mode outputs from the same weights.

This is the test the per-module goldens cannot replace: it exercises the
seams BETWEEN modules — layout/grouping of the FPN pyramid, the fused-map
cache format, frame ordering, dtype boundaries, the hoisted value
projections, and the head's output assembly
(`/root/reference/models/racformer.py:443-474` ->
`models/racformer_head.py:487-507`).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from racformer_tpu.model import RaCFormer, preprocess_images
from racformer_tpu.tools.convert_weights import convert_state_dict

from tests.test_model_forward import tiny_batch
from tests.torch_mirror import MirrorCfg, TorchRaCFormer


def _randomize_bn_stats(module, gen):
    """Give every BN nontrivial running stats so the batch_stats conversion
    is actually exercised (fresh stats are 0/1, which would hide a miswire)."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.2)
            m.running_var.copy_(
                0.5 + torch.rand(m.running_var.shape, generator=gen))


def _flax_model(cfg: MirrorCfg) -> RaCFormer:
    return RaCFormer(
        num_cams=cfg.num_cams,
        num_frames=cfg.num_frames,
        embed_dims=cfg.embed_dims,
        num_query=cfg.num_query,
        num_clusters=cfg.num_clusters,
        image_hw=cfg.image_hw,
        depth_bins=cfg.depth_bins,
        bev_size=cfg.bev_size,
        num_decoder_layers=cfg.num_layers,
        # f32 BEV value maps for exact comparison (production keeps bf16)
        decoder={"gather_dtype": jnp.float32},
        train_mode=False,
        trunk_dtype=jnp.float32,
    )


@pytest.mark.slow
def test_full_detector_golden(rng):
    cfg = MirrorCfg()
    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(11)
    mirror = TorchRaCFormer(cfg)
    mirror.eval()
    with torch.no_grad():
        _randomize_bn_stats(mirror, gen)
    sd = mirror.state_dict_reference()

    batch, _ = tiny_batch(rng, B=1, T=cfg.num_frames, N=cfg.num_cams,
                          H=cfg.image_hw[0], W=cfg.image_hw[1])
    model = _flax_model(cfg)
    args = (
        preprocess_images(jnp.asarray(batch["imgs"])),
        jnp.asarray(batch["radar_points"]),
        jnp.asarray(batch["radar_mask"]),
        jnp.asarray(batch["radar_depth"]),
        jnp.asarray(batch["radar_rcs"]),
        jnp.asarray(batch["lidar2img"]),
        jnp.asarray(batch["img2lidar"]),
        jnp.asarray(batch["time_diff"]),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)

    converted, unmatched = convert_state_dict(sd, variables, strict=False)
    assert unmatched == [], unmatched[:10]

    # --- torch side -------------------------------------------------------
    mean = np.array([123.675, 116.280, 103.530], np.float32)
    std = np.array([58.395, 57.120, 57.375], np.float32)
    imgs_t = (batch["imgs"][..., ::-1] - mean) / std
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a)).float()
    with torch.no_grad():
        want = mirror(
            t(imgs_t).permute(0, 1, 2, 5, 3, 4),
            t(batch["radar_points"]),
            torch.from_numpy(batch["radar_mask"]),
            t(batch["radar_depth"]),
            t(batch["radar_rcs"]),
            t(batch["lidar2img"]),
            t(batch["img2lidar"]),
            t(batch["time_diff"]),
        )

    # --- flax encode stage (localizes trunk/LSS/radar failures) -----------
    B, T = 1, cfg.num_frames
    N, (H, W) = cfg.num_cams, cfg.image_hw
    enc = model.apply(
        converted,
        args[0].reshape(B * T, N, H, W, 3),
        args[1].reshape(B * T, *batch["radar_points"].shape[2:]),
        args[2].reshape(B * T, -1),
        args[3].reshape(B * T, N, H, W),
        args[4].reshape(B * T, N, H, W),
        args[6].reshape(B * T, N, 4, 4),
        method=RaCFormer.encode_frame,
    )
    _, lss_bev, radar_bev, _ = enc
    ny, nx = cfg.bev_size
    np.testing.assert_allclose(
        np.asarray(lss_bev).reshape(B, T, ny, nx, cfg.embed_dims),
        want["lss_bev"].permute(0, 1, 3, 4, 2).numpy(),
        rtol=1e-3, atol=1e-3, err_msg="LSS BEV (trunk->CustomFPN->DepthNet->pool)")
    np.testing.assert_allclose(
        np.asarray(radar_bev).reshape(B, T, ny, nx, cfg.embed_dims),
        want["radar_bev"].permute(0, 1, 3, 4, 2).numpy(),
        rtol=1e-3, atol=1e-3, err_msg="radar pillar BEV")

    # --- full forward ------------------------------------------------------
    outs = jax.jit(model.apply)(converted, *args)

    np.testing.assert_allclose(
        np.asarray(outs["depth_logits"]),
        want["depth_logits"].permute(0, 1, 3, 4, 2).numpy(),
        rtol=1e-3, atol=1e-3, err_msg="depth logits")

    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        want["all_cls_scores"].numpy(),
        rtol=1e-3, atol=2e-3, err_msg="final cls scores")
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        want["all_bbox_preds"].numpy(),
        rtol=1e-3, atol=2e-3, err_msg="final bbox preds")


@pytest.mark.slow
def test_full_detector_golden_flagship_shapes(rng):
    """VERDICT r3 item 4: the SAME golden at production geometry — 6 cams,
    8 frames, 256x704 images, D=96 SID bins, 128^2 BEV, 900 queries, 6
    decoder iterations, B=1. This is the only proxy that exercises the
    resolution-dependent machinery (W-aligned map padding, 16-wide kernel
    windows, the full d_region schedule) before real data exists. CPU-heavy:
    expect tens of minutes on the 1-core test host."""
    cfg = MirrorCfg(
        num_cams=6, num_frames=8, embed_dims=256, num_query=900,
        num_clusters=6, num_layers=6, image_hw=(256, 704), depth_bins=96,
        bev_size=(128, 128),
    )
    torch.manual_seed(7)
    gen = torch.Generator().manual_seed(11)
    mirror = TorchRaCFormer(cfg)
    mirror.eval()
    with torch.no_grad():
        _randomize_bn_stats(mirror, gen)
    sd = mirror.state_dict_reference()

    batch, _ = tiny_batch(rng, B=1, T=cfg.num_frames, N=cfg.num_cams,
                          H=cfg.image_hw[0], W=cfg.image_hw[1], P=256)
    model = _flax_model(cfg)
    args = (
        preprocess_images(jnp.asarray(batch["imgs"])),
        jnp.asarray(batch["radar_points"]),
        jnp.asarray(batch["radar_mask"]),
        jnp.asarray(batch["radar_depth"]),
        jnp.asarray(batch["radar_rcs"]),
        jnp.asarray(batch["lidar2img"]),
        jnp.asarray(batch["img2lidar"]),
        jnp.asarray(batch["time_diff"]),
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    converted, unmatched = convert_state_dict(sd, variables, strict=False)
    assert unmatched == [], unmatched[:10]

    mean = np.array([123.675, 116.280, 103.530], np.float32)
    std = np.array([58.395, 57.120, 57.375], np.float32)
    imgs_t = (batch["imgs"][..., ::-1] - mean) / std
    t = lambda a: torch.from_numpy(np.ascontiguousarray(a)).float()
    with torch.no_grad():
        want = mirror(
            t(imgs_t).permute(0, 1, 2, 5, 3, 4),
            t(batch["radar_points"]),
            torch.from_numpy(batch["radar_mask"]),
            t(batch["radar_depth"]),
            t(batch["radar_rcs"]),
            t(batch["lidar2img"]),
            t(batch["img2lidar"]),
            t(batch["time_diff"]),
        )

    outs = jax.jit(model.apply)(converted, *args)
    np.testing.assert_allclose(
        np.asarray(outs["depth_logits"]),
        want["depth_logits"].permute(0, 1, 3, 4, 2).numpy(),
        rtol=2e-3, atol=3e-3, err_msg="depth logits @ flagship shapes")
    np.testing.assert_allclose(
        np.asarray(outs["all_cls_scores"]),
        want["all_cls_scores"].numpy(),
        rtol=2e-3, atol=5e-3, err_msg="final cls scores @ flagship shapes")
    np.testing.assert_allclose(
        np.asarray(outs["all_bbox_preds"]),
        want["all_bbox_preds"].numpy(),
        rtol=2e-3, atol=5e-3, err_msg="final bbox preds @ flagship shapes")
