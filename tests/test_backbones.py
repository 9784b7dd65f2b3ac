import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.nn.vovnet import VoVNet
from racformer_tpu.nn.bev_nets import BEVResNet, FPNLSS
from racformer_tpu.nn.resnet import ResNet50


@pytest.mark.slow
def test_resnet50_shapes(rng):
    m = ResNet50(dtype=jnp.float32, remat=False)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    c2, c3, c4, c5 = m.apply(v, x)
    assert c2.shape == (1, 16, 32, 256)
    assert c3.shape == (1, 8, 16, 512)
    assert c4.shape == (1, 4, 8, 1024)
    assert c5.shape == (1, 2, 4, 2048)
    # parameter count sanity: torch resnet50 has 25.56M params incl fc;
    # without fc = 23.5M
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v["params"]))
    assert 23_000_000 < n < 24_000_000


@pytest.mark.slow
def test_vovnet_shapes(rng):
    m = VoVNet(spec_name="V-19-slim-eSE", remat=False, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert len(outs) == 4
    # strides 4, 8, 16, 32; channels from spec stage_out
    assert outs[0].shape == (1, 16, 16, 112)
    assert outs[3].shape == (1, 2, 2, 512)


def test_bev_resnet_and_fpnlss(rng):
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 64)), jnp.float32)
    m = BEVResNet(dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 128), (1, 8, 8, 256), (1, 4, 4, 512)]

    neck = FPNLSS(out_channels=64, input_feature_index=(0, 2), dtype=jnp.float32)
    nv = neck.init(jax.random.PRNGKey(1), feats)
    out = neck.apply(nv, feats)
    assert out.shape == (1, 32, 32, 64)


def test_fpn_golden_vs_torch(rng):
    """mmdet-FPN torch mirror (lateral 1x1, nearest top-down add, 3x3 out)
    converted through convert_state_dict must reproduce all 4 levels."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from racformer_tpu.nn.fpn import FPN
    from racformer_tpu.tools.convert_weights import convert_state_dict

    torch.manual_seed(2)
    chans = (32, 64, 128, 256)
    C = 48

    lats = tnn.ModuleList([tnn.Conv2d(c, C, 1) for c in chans])
    fpns = tnn.ModuleList([tnn.Conv2d(C, C, 3, padding=1) for _ in chans])

    feats = [rng.normal(size=(1, 32 >> i, 48 >> i, c)).astype(np.float32)
             for i, c in enumerate(chans)]
    t_in = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
    with torch.no_grad():
        l = [m(x) for m, x in zip(lats, t_in)]
        for i in range(3, 0, -1):
            l[i - 1] = l[i - 1] + F.interpolate(l[i], scale_factor=2,
                                                mode="nearest")
        want = [m(x).numpy() for m, x in zip(fpns, l)]

    sd = {}
    for i in range(4):
        sd[f"img_neck.lateral_convs.{i}.conv.weight"] = lats[i].weight.detach().numpy()
        sd[f"img_neck.lateral_convs.{i}.conv.bias"] = lats[i].bias.detach().numpy()
        sd[f"img_neck.fpn_convs.{i}.conv.weight"] = fpns[i].weight.detach().numpy()
        sd[f"img_neck.fpn_convs.{i}.conv.bias"] = fpns[i].bias.detach().numpy()

    model = FPN(out_channels=C, num_levels=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           [jnp.asarray(f) for f in feats])
    wrapped = {"params": {"img_neck": variables["params"]}}
    converted, unmatched = convert_state_dict(sd, wrapped, strict=True)
    assert unmatched == [], unmatched
    outs = model.apply({"params": converted["params"]["img_neck"]},
                       [jnp.asarray(f) for f in feats])
    for got, w in zip(outs, want):
        np.testing.assert_allclose(
            np.transpose(np.asarray(got), (0, 3, 1, 2)), w,
            rtol=2e-4, atol=2e-4)


def test_custom_fpn_golden_vs_torch(rng):
    """CustomFPN (2 laterals, top-down add, single out conv at out_ids=[0],
    ref necks/fpn.py:108-181) torch mirror through the converter."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    from racformer_tpu.nn.fpn import CustomFPN
    from racformer_tpu.tools.convert_weights import convert_state_dict

    torch.manual_seed(3)
    chans = (64, 128)
    C = 48
    lats = tnn.ModuleList([tnn.Conv2d(c, C, 1) for c in chans])
    fpn0 = tnn.Conv2d(C, C, 3, padding=1)

    feats = [rng.normal(size=(1, 16 >> i, 24 >> i, c)).astype(np.float32)
             for i, c in enumerate(chans)]
    t_in = [torch.from_numpy(f).permute(0, 3, 1, 2) for f in feats]
    with torch.no_grad():
        l = [m(x) for m, x in zip(lats, t_in)]
        l[0] = l[0] + F.interpolate(l[1], scale_factor=2, mode="nearest")
        want = fpn0(l[0]).numpy()

    sd = {}
    for i in range(2):
        sd[f"img_lss_neck.lateral_convs.{i}.conv.weight"] = lats[i].weight.detach().numpy()
        sd[f"img_lss_neck.lateral_convs.{i}.conv.bias"] = lats[i].bias.detach().numpy()
    sd["img_lss_neck.fpn_convs.0.conv.weight"] = fpn0.weight.detach().numpy()
    sd["img_lss_neck.fpn_convs.0.conv.bias"] = fpn0.bias.detach().numpy()

    model = CustomFPN(out_channels=C, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           [jnp.asarray(f) for f in feats])
    wrapped = {"params": {"img_lss_neck": variables["params"]}}
    converted, unmatched = convert_state_dict(sd, wrapped, strict=True)
    assert unmatched == [], unmatched
    got = model.apply({"params": converted["params"]["img_lss_neck"]},
                      [jnp.asarray(f) for f in feats])
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want,
        rtol=2e-4, atol=2e-4)
