"""Golden tests for decoder submodules vs torch oracles with shared weights
(reference semantics: `models/racformer_transformer.py:282-335` SASA,
`:549-616` AdaptiveMixing)."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np
import torch
import torch.nn.functional as F

from racformer_tpu.nn.adaptive_mixing import AdaptiveMixing
from racformer_tpu.nn.sasa import ScaleAdaptiveSelfAttention
from racformer_tpu.ops.bbox_codec import decode_bbox, theta_d_to_xy

PC = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


def test_sasa_matches_torch_mha(rng):
    B, Q, C, M = 2, 10, 32, 4
    qb = rng.uniform(0, 1, size=(B, Q, 10)).astype(np.float32)
    qf = rng.normal(size=(B, Q, C)).astype(np.float32)

    mod = ScaleAdaptiveSelfAttention(C, M, pc_range=PC)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(qb), jnp.asarray(qf))
    got = np.asarray(mod.apply(params, jnp.asarray(qb), jnp.asarray(qf)))

    p = params["params"]
    wq = np.asarray(p["q_proj"]["kernel"]).T  # [C, C] torch layout
    wk = np.asarray(p["k_proj"]["kernel"]).T
    wv = np.asarray(p["v_proj"]["kernel"]).T
    in_proj_w = torch.from_numpy(np.concatenate([wq, wk, wv], 0))
    in_proj_b = torch.from_numpy(np.concatenate(
        [np.asarray(p[k]["bias"]) for k in ("q_proj", "k_proj", "v_proj")]))
    out_w = torch.from_numpy(np.asarray(p["out_proj"]["kernel"]).T)
    out_b = torch.from_numpy(np.asarray(p["out_proj"]["bias"]))

    # bias: -dist * tau per head (reference `inner_forward`)
    centers = np.asarray(decode_bbox(theta_d_to_xy(qb), PC))[..., :2]
    dist = -np.linalg.norm(centers[:, :, None] - centers[:, None], axis=-1)
    tau = np.asarray(qf @ np.asarray(p["gen_tau"]["kernel"])) + np.asarray(
        p["gen_tau"]["bias"])
    attn_mask = torch.from_numpy(
        (dist[:, None] * tau.transpose(0, 2, 1)[..., None]).reshape(B * M, Q, Q)
    )

    x = torch.from_numpy(qf).transpose(0, 1)  # [Q, B, C]
    out, _ = F.multi_head_attention_forward(
        x, x, x, C, M, in_proj_w, in_proj_b, None, None, False, 0.0,
        out_w, out_b, training=False, need_weights=False, attn_mask=attn_mask,
    )
    want = qf + out.transpose(0, 1).numpy()  # residual add
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_adaptive_mixing_matches_torch(rng):
    B, Q, G, P, c, C = 1, 6, 2, 8, 16, 32
    x = rng.normal(size=(B, Q, G, P, c)).astype(np.float32)
    qf = rng.normal(size=(B, Q, C)).astype(np.float32)

    mod = AdaptiveMixing(in_points=P, out_points=12, n_groups=G, embed_dims=C)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(qf))
    # zero-init generator produces pure-bias params; randomize for a real test
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape), jnp.float32) * 0.1,
        params,
    )
    got = np.asarray(mod.apply(p, jnp.asarray(x), jnp.asarray(qf)))

    pg_w = np.asarray(p["params"]["parameter_generator"]["kernel"])
    pg_b = np.asarray(p["params"]["parameter_generator"]["bias"])
    op_w = np.asarray(p["params"]["out_proj"]["kernel"])
    op_b = np.asarray(p["params"]["out_proj"]["bias"])

    tq = torch.from_numpy(qf)
    tx = torch.from_numpy(x)
    par = tq @ torch.from_numpy(pg_w) + torch.from_numpy(pg_b)
    par = par.reshape(B * Q, G, -1)
    m_par, s_par = par.split([c * c, 12 * P], 2)
    M_ = m_par.reshape(B * Q, G, c, c)
    S_ = s_par.reshape(B * Q, G, 12, P)
    out = tx.reshape(B * Q, G, P, c)
    out = torch.matmul(out, M_)
    out = F.layer_norm(out, [out.size(-2), out.size(-1)])
    out = F.relu(out)
    out = torch.matmul(S_, out)
    out = F.layer_norm(out, [out.size(-2), out.size(-1)])
    out = F.relu(out)
    out = out.reshape(B, Q, -1)
    want = (tq + out @ torch.from_numpy(op_w) + torch.from_numpy(op_b)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_gru_semantics(rng):
    """ConvGRU structural semantics (`racformer_transformer.py:665-720`):
    frames t >= min(4, T) emit the zero state; gate math matches a torch
    oracle for the first step."""
    from racformer_tpu.nn.conv_gru import ConvGRU

    B, T, H, W, C = 1, 6, 8, 8, 4
    x = rng.normal(size=(B, T, H, W, C)).astype(np.float32)
    mod = ConvGRU(hidden=C, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert out.shape == (B, T, H, W, C)
    # frames 4, 5 are the zero initial state
    np.testing.assert_allclose(out[:, 4:], 0.0, atol=1e-7)

    # torch oracle for step 0 (h_prev = 0)
    p = params["params"]["cell"]
    wm = np.asarray(p["matching"]["kernel"])  # [1,1,C,C]
    bm = np.asarray(p["matching"]["bias"])
    wg = np.asarray(p["gates"]["kernel"])  # [3,3,2C,3C]
    bg = np.asarray(p["gates"]["bias"])
    tx = torch.from_numpy(x[0, 0]).permute(2, 0, 1)[None]
    h0 = torch.zeros_like(tx)
    hm = F.conv2d(h0, torch.from_numpy(wm).permute(3, 2, 0, 1), torch.from_numpy(bm))
    comb = torch.cat([tx, hm], 1)
    gates = F.conv2d(comb, torch.from_numpy(wg).permute(3, 2, 0, 1),
                     torch.from_numpy(bg), padding=1)
    z, r, cand = gates.split(C, dim=1)
    z, r = torch.sigmoid(z), torch.sigmoid(r)
    cand = torch.tanh(cand + r * h0)
    want = ((1 - z) * h0 + z * cand)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out[0, 0], want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_intermediates_capture(rng):
    """DUMP-equivalent sow capture: per-iteration tau + sample points."""
    from tests.test_model_forward import make_model, tiny_batch
    from racformer_tpu.model import preprocess_images

    batch, _ = tiny_batch(rng)
    model = make_model(train=False)
    args = [jnp.asarray(batch[k]) for k in (
        "radar_points", "radar_mask", "radar_depth", "radar_rcs",
        "lidar2img", "img2lidar", "time_diff")]
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), preprocess_images(jnp.asarray(batch["imgs"])), *args)
    outs, inter = model.apply(
        variables, preprocess_images(jnp.asarray(batch["imgs"])), *args,
        mutable=["intermediates"])
    flat = jax.tree_util.tree_leaves_with_path(inter["intermediates"])
    names = {"/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat}
    assert any("sasa_tau" in n for n in names)
    assert any("sample_points" in n for n in names)
    # per-iteration leading axis from the scan
    taus = [v for path, v in flat if "sasa_tau" in str(path)]
    assert taus[0].shape[0] == 6  # 6 decoder iterations
