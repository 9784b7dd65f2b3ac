"""Tests for the dense pillar ops (radar branch substrate)."""

import numpy as np

from racformer_tpu.ops.pillars import (
    PillarGrid,
    augment_pillar_points,
    pillar_bev_features,
    pillar_indices,
)

GRID = PillarGrid(
    pc_range=(-51.2, -51.2, -5.0, 51.2, 51.2, 3.0),
    voxel_size=(0.8, 0.8, 8.0),
    nx=128,
    ny=128,
)


def test_pillar_indices_bounds(rng):
    pts = rng.uniform(-60, 60, size=(200, 2)).astype(np.float32)
    mask = np.ones(200, bool)
    ids, valid = pillar_indices(pts, mask, GRID)
    ids, valid = np.asarray(ids), np.asarray(valid)
    inside = (np.abs(pts) < 51.2).all(-1)
    np.testing.assert_array_equal(valid, inside)
    assert (ids[~valid] == 128 * 128).all()
    iy, ix = ids[valid] // 128, ids[valid] % 128
    np.testing.assert_array_equal(ix, ((pts[valid, 0] + 51.2) / 0.8).astype(int))
    np.testing.assert_array_equal(iy, ((pts[valid, 1] + 51.2) / 0.8).astype(int))


def test_augment_cluster_and_center(rng):
    # two points in the same pillar
    pts = np.zeros((3, 7), np.float32)
    pts[0, :2] = [0.1, 0.1]
    pts[1, :2] = [0.3, 0.5]
    pts[2, :2] = [30.0, -20.0]
    mask = np.ones(3, bool)
    feats, ids, valid = augment_pillar_points(pts, mask, GRID)
    feats = np.asarray(feats)
    assert feats.shape == (3, 13)
    # cluster offsets of points 0/1 are symmetric about their mean
    np.testing.assert_allclose(feats[0, 7:10] + feats[1, 7:10], 0, atol=1e-5)
    # center offset: pillar of point 0 is (ix=64, iy=64) -> center (0.4, 0.4)
    np.testing.assert_allclose(feats[0, 10:12], [0.1 - 0.4, 0.1 - 0.4], atol=1e-5)
    # z center offset: z=0 vs pillar z-center -1.0
    np.testing.assert_allclose(feats[0, 12], 1.0, atol=1e-5)


def test_bev_scatter_max(rng):
    pts = np.zeros((4, 7), np.float32)
    pts[:, :2] = [[0.1, 0.1], [0.2, 0.2], [-10, -10], [100, 100]]
    mask = np.array([True, True, True, True])
    ids, valid = pillar_indices(pts[:, :2], mask, GRID)
    f = rng.normal(size=(4, 6)).astype(np.float32)
    bev = np.asarray(pillar_bev_features(f, ids, valid, GRID))
    assert bev.shape == (128, 128, 6)
    np.testing.assert_allclose(bev[64, 64], np.maximum(f[0], f[1]), atol=1e-6)
    # out-of-range point contributes nothing; empty pillars are exactly 0
    assert bev[0, 0].sum() == 0


def test_cap_first_k_semantics():
    """Hard-voxelization cap: first k valid points per pillar IN POINT ORDER
    survive (mmdet3d deterministic `max_num_points` semantics,
    `/root/reference/configs/..._f8.py:122-127`)."""
    import jax.numpy as jnp

    from racformer_tpu.ops.pillars import cap_pillar_points

    ids = np.array([5, 7, 5, 5, 7, 5, 5], np.int32)
    valid = np.array([1, 1, 1, 0, 1, 1, 1], bool)
    out = np.asarray(
        cap_pillar_points(jnp.asarray(ids), jnp.asarray(valid), 2, 100))
    # pillar 5's valid arrivals are indices 0,2,5,6 -> first 2 kept (0,2);
    # pillar 7's are 1,4 -> both kept; index 3 stays invalid
    np.testing.assert_array_equal(out, [True, True, True, False, True,
                                        False, False])


def test_cap_zero_disables():
    pts = np.zeros((5, 7), np.float32)
    pts[:, :2] = 0.1
    mask = np.ones(5, bool)
    _, _, v0 = augment_pillar_points(pts, mask, GRID, max_pts_per_pillar=0)
    _, _, v2 = augment_pillar_points(pts, mask, GRID, max_pts_per_pillar=2)
    assert np.asarray(v0).sum() == 5
    assert np.asarray(v2).sum() == 2


def test_dense_pillar_golden_vs_torch_mirror(rng):
    """VERDICT r3 item 6 'Done' gate: a DENSE fixture (>10 points in one
    pillar) through the full flax pillar encoder vs the torch mirror's
    loop-based hard voxelization, exact within fp32 tolerance. The cap is
    load-bearing here: the same fixture through an UNCAPPED encoder differs."""
    import jax
    import jax.numpy as jnp
    import torch

    from racformer_tpu.nn.pillar_encoder import RadarPillarEncoder
    from tests.torch_mirror import MirrorCfg, TRadarEncoder

    cfg = MirrorCfg()
    torch.manual_seed(0)
    tm = TRadarEncoder(cfg).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(size=m.running_mean.shape)
                    .astype(np.float32) * 0.1))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 1.5, m.running_var.shape)
                    .astype(np.float32)))

    ny, nx = cfg.bev_size
    vx = (cfg.pc_range[3] - cfg.pc_range[0]) / nx
    grid = PillarGrid(pc_range=cfg.pc_range,
                      voxel_size=(vx, vx, cfg.pc_range[5] - cfg.pc_range[2]),
                      nx=nx, ny=ny)
    enc = RadarPillarEncoder(out_channels=cfg.embed_dims, grid=grid)

    # dense fixture: 24 points in ONE pillar, interleaved with scattered ones
    P = 48
    pts = np.zeros((1, P, 7), np.float32)
    pts[0, :, :2] = rng.uniform(-40, 40, (P, 2)).astype(np.float32)
    dense = np.arange(0, P, 2)
    pts[0, dense, 0] = rng.uniform(0.2, vx - 0.2, dense.size)
    pts[0, dense, 1] = rng.uniform(0.2, vx - 0.2, dense.size)
    pts[0, :, 3:] = rng.normal(size=(P, 4)).astype(np.float32)
    mask = np.ones((1, P), bool)

    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(mask))
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    pfn = tm.pfn_layers[0]
    params["pfn_linear"]["kernel"] = pfn.linear.weight.detach().numpy().T
    params["pfn_bn"]["scale"] = pfn.norm.weight.detach().numpy()
    params["pfn_bn"]["bias"] = pfn.norm.bias.detach().numpy()
    stats["pfn_bn"]["mean"] = pfn.norm.running_mean.numpy()
    stats["pfn_bn"]["var"] = pfn.norm.running_var.numpy()
    for i, mod in enumerate(tm.radar_bev_conv):
        name = f"conv{i + 1}"
        params[name]["conv"]["kernel"] = (
            mod.conv.weight.detach().numpy().transpose(2, 3, 1, 0))
        params[name]["norm"]["scale"] = mod.bn.weight.detach().numpy()
        params[name]["norm"]["bias"] = mod.bn.bias.detach().numpy()
        stats[name]["norm"]["mean"] = mod.bn.running_mean.numpy()
        stats[name]["norm"]["var"] = mod.bn.running_var.numpy()

    out_flax = np.asarray(enc.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.asarray(mask), train=False))
    with torch.no_grad():
        out_torch = tm(torch.from_numpy(pts),
                       torch.from_numpy(mask)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out_flax, out_torch, atol=2e-4, rtol=1e-4)

    # prove the fixture is dense enough that the cap matters
    enc_uncapped = RadarPillarEncoder(out_channels=cfg.embed_dims, grid=grid,
                                      max_pts_per_pillar=0)
    out_uncapped = np.asarray(enc_uncapped.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(pts), jnp.asarray(mask), train=False))
    assert np.abs(out_uncapped - out_flax).max() > 1e-3
