"""Equivalence of the custom-VJP sampling path (Pallas gather forward,
`ops/gather_kernel.py`; Pallas scatter backward, `ops/scatter_kernel.py`)
vs the plain XLA gather + autodiff path.

The forward agrees to 1 ULP (the kernel's multiply-then-reduce contracts
differently than XLA's fused lerp); the backward tests check the
hand-written VJP against jax.grad of the autodiff path for features,
locations, and through the weighted aggregations used by the deform-attn
and msmv call sites. On CPU both kernels run in interpret mode.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from racformer_tpu.ops.bilinear import bilinear_sample_views_nhwc, pad_for_sampling

N, H, W, C = 4, 24, 40, 64  # 2C = 128: the custom-kernel channel layout
K = 50
J = 2  # views per point-batch row (the blocked-views contract)


@pytest.fixture
def data(rng):
    feat = rng.normal(size=(N, H, W, C)).astype(np.float32)
    # blocked views: batch row s only references slabs [s*J, (s+1)*J)
    sub = rng.integers(0, J, size=(2, K)).astype(np.int32)
    view = (np.arange(2, dtype=np.int32)[:, None] * J + sub)
    # include out-of-bounds and boundary locations
    x = rng.uniform(-4, W + 3, size=(2, K)).astype(np.float32)
    y = rng.uniform(-4, H + 3, size=(2, K)).astype(np.float32)
    g = rng.normal(size=(2, K, C)).astype(np.float32)
    return feat, view, x, y, g


def _run(feat, view, x, y, custom):
    return bilinear_sample_views_nhwc(
        jnp.asarray(feat), jnp.asarray(view), jnp.asarray(x), jnp.asarray(y),
        custom_grad=custom, blocked_views=True,
    )


def test_forward_identical(data):
    feat, view, x, y, _ = data
    a = _run(feat, view, x, y, True)
    b = _run(feat, view, x, y, False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-6, atol=2e-6)  # few-ULP FMA contraction


def test_grad_feat_matches_autodiff(data):
    feat, view, x, y, g = data

    def loss(f, custom):
        out = _run(f, view, x, y, custom)
        return jnp.sum(out * jnp.asarray(g))

    ga = jax.grad(functools.partial(loss, custom=True))(jnp.asarray(feat))
    gb = jax.grad(functools.partial(loss, custom=False))(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-2, atol=2e-2)


def test_grad_locations_match_autodiff(data):
    feat, view, x, y, g = data

    def loss(xy, custom):
        out = _run(feat, view, xy[0], xy[1], custom)
        return jnp.sum(out * jnp.asarray(g))

    xy = jnp.stack([jnp.asarray(x), jnp.asarray(y)])
    ga = jax.grad(functools.partial(loss, custom=True))(xy)
    gb = jax.grad(functools.partial(loss, custom=False))(xy)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=2e-2, atol=2e-2)


def test_grad_through_weighted_sum_prepadded(data):
    """The deform-attn shape: pre-padded operand, weighted point sum."""
    feat, view, x, y, _ = data
    padded = pad_for_sampling(jnp.asarray(feat))
    w = jnp.asarray(np.linspace(0.1, 1.0, 2 * K).reshape(2, K), jnp.float32)

    def loss(p, wgt, custom):
        out = bilinear_sample_views_nhwc(
            p, jnp.asarray(view), jnp.asarray(x), jnp.asarray(y),
            pre_padded=True, custom_grad=custom, blocked_views=True,
        )
        return jnp.sum(out * wgt[..., None])

    for arg in (0, 1):
        ga = jax.grad(functools.partial(loss, custom=True), argnums=arg)(padded, w)
        gb = jax.grad(functools.partial(loss, custom=False), argnums=arg)(padded, w)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-2, atol=2e-2)


def test_grad_bf16_feat(data):
    """bf16 operands (the production trunk dtype)."""
    feat, view, x, y, g = data

    def loss(f, custom):
        out = _run(f.astype(jnp.bfloat16), view, x, y, custom)
        return jnp.sum(out.astype(jnp.float32) * jnp.asarray(g))

    ga = jax.grad(functools.partial(loss, custom=True))(jnp.asarray(feat))
    gb = jax.grad(functools.partial(loss, custom=False))(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=5e-2, atol=5e-2)


def test_grad_feat_multichunk_tail(rng):
    """K large enough to span multiple kernel chunks: every point's gradient
    must flow — guards the chunk//GROUP divisibility bug where a chunk size
    not divisible by GROUP silently dropped the tail points' grads."""
    from racformer_tpu.ops.scatter_kernel import GROUP, chunk_layout

    chunk, nch, kpad = chunk_layout(3000)
    assert chunk % GROUP == 0 and nch * chunk >= 3000

    Kbig = 3000
    feat = rng.normal(size=(2, 8, 12, 64)).astype(np.float32)
    view = np.zeros((1, Kbig), np.int32)  # S=1, J=2: slab row 0, views {0,1}
    view[:] = rng.integers(0, 2, size=(1, Kbig))
    x = rng.uniform(0, 11, size=(1, Kbig)).astype(np.float32)
    y = rng.uniform(0, 7, size=(1, Kbig)).astype(np.float32)
    g = rng.normal(size=(1, Kbig, 64)).astype(np.float32)

    def loss(f, custom):
        out = bilinear_sample_views_nhwc(
            f, jnp.asarray(view), jnp.asarray(x), jnp.asarray(y),
            custom_grad=custom, blocked_views=True)
        return jnp.sum(out * jnp.asarray(g))

    ga = jax.grad(functools.partial(loss, custom=True))(jnp.asarray(feat))
    gb = jax.grad(functools.partial(loss, custom=False))(jnp.asarray(feat))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=5e-2, atol=5e-2)


def test_pallas_bwd_regather_matches_xla_bwd(rng):
    """The Pallas-forward path's backward reconstructs the four corner
    values from ONE corner-pair kernel call (`patch_corners_pallas`) instead
    of the XLA patch re-gather (round-4 train profile: 72 ms/iteration per
    BEV site); gradients must match the XLA backward exactly."""
    import jax
    import jax.numpy as jnp

    from racformer_tpu.ops.bilinear import _patch_sample, _patch_sample_pallas

    S, J, R0, Wp, C2 = 2, 2, 9, 24, 128
    fused = jnp.asarray(rng.normal(size=(S * J, R0, Wp, C2)), jnp.float32)
    K = 37
    view = jnp.asarray(
        np.stack([rng.integers(0, J, K) + s * J for s in range(S)]), jnp.int32)
    y0p = jnp.asarray(rng.integers(0, R0 - 1, (S, K)), jnp.int32)
    x0p = jnp.asarray(rng.integers(0, Wp - 17, (S, K)), jnp.int32)
    wx = jnp.asarray(rng.uniform(0, 1, (S, K)), jnp.float32)
    wy = jnp.asarray(rng.uniform(0, 1, (S, K)), jnp.float32)

    def f_x(fu, a, b):
        return (_patch_sample(False, fu, view, y0p, x0p, a, b) ** 2).sum()

    def f_p(fu, a, b):
        return (_patch_sample_pallas(False, fu, view, y0p, x0p, a, b) ** 2).sum()

    gx = jax.grad(f_x, argnums=(0, 1, 2))(fused, wx, wy)
    gp = jax.grad(f_p, argnums=(0, 1, 2))(fused, wx, wy)
    for a, b, n in zip(gx, gp, ["fused", "wx", "wy"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=n)
