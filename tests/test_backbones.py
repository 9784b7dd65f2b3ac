import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.nn.vovnet import VoVNet
from racformer_tpu.nn.bev_nets import BEVResNet, FPNLSS
from racformer_tpu.nn.resnet import ResNet50


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
