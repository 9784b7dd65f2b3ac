"""Round-5: measure the CONSECUTIVE-WINDOW share rate of the production
sampling geometry.

The gather kernel stages one [16,128] window per point. The D radial
siblings of a (query, point, frame) are consecutive along the kernel's K
axis and lie within the per-layer `d_region` of each other — if they land in
the same (row, window) the carry kernel (docs/experiments/gather_v6_share.py)
stages once and reuses. This script runs the flagship model forward once,
captures the sown sampling geometry (image `sample_points`, BEV `bev_loc`),
and reports the exact fraction of points whose window key equals the
previous point's — i.e. the staging copies the carry kernel would skip.

Usage: python docs/experiments/window_share_study.py
"""
import sys

import os

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("STUDY_CPU", "1") == "1":
    # geometry is backend-independent and the flagship forward compiles in
    # ~2 min on host CPU vs >10 min through the axon remote-compile tunnel
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from __graft_entry__ import _example_batch, _flagship_model  # noqa: E402
from racformer_tpu.model import preprocess_images  # noqa: E402

PAD = 2


def share_rate(keys2d):
    """keys2d: [slabs, K] int64 window keys in kernel iteration order."""
    same = keys2d[:, 1:] == keys2d[:, :-1]
    return float(same.mean())


def window_keys(view, x_pix, y_pix, H, W, R0):
    x0 = np.clip(np.floor(x_pix), -PAD, W).astype(np.int64) + PAD
    y0 = np.clip(np.floor(y_pix), -PAD, H).astype(np.int64) + PAD
    row = view.astype(np.int64) * R0 + y0
    xb = (x0 // 8) * 8
    return (row << 16) | xb


def main():
    model = _flagship_model(train=False)
    batch = _example_batch(model)
    arg_keys = ("radar_points", "radar_mask", "radar_depth", "radar_rcs",
                "lidar2img", "img2lidar", "time_diff")
    args = [preprocess_images(jnp.asarray(batch["imgs"]))] + [
        jnp.asarray(batch[k]) for k in arg_keys]
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    outs, state = jax.jit(
        lambda v, *a: model.apply(v, *a, mutable=["intermediates"])
    )(variables, *args)
    inter = jax.device_get(state["intermediates"])

    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    sp = bev = None
    bevs = []
    for path, leaf in flat:
        p = "/".join(str(k) for k in path)
        if "sample_points" in p:
            sp = np.asarray(leaf)
        if "bev_loc" in p:
            bevs.append((p, np.asarray(leaf)))
    assert sp is not None, [p for p, _ in flat]

    # ---- image site ------------------------------------------------------
    # sp: [6, B, Q, T, G, PD, 3] lidar-frame points (see nn/img_sampling.py)
    from racformer_tpu.ops.sampling import project_points_to_views

    it, B, Q, T, G, PD, _ = sp.shape
    Himg, Wimg = model.image_hw
    N = model.num_cams
    l2i = jnp.asarray(batch["lidar2img"])
    print(f"image sample_points {sp.shape}")
    for i in range(it):
        pts = jnp.asarray(sp[i]).transpose(0, 2, 1, 3, 4, 5).reshape(
            B, T, Q, G * PD, 3)
        lx, ly, lv = project_points_to_views(pts, l2i, Himg, Wimg,
                                             packed=False)
        lx, ly, lv = (np.asarray(a).reshape(B, T, Q, G, PD)
                      .transpose(0, 1, 3, 2, 4).reshape(B * T * G, Q * PD)
                      for a in (lx, ly, lv))
        rates = []
        for lvl in range(4):
            Hl, Wl = Himg // (4 << lvl), Wimg // (4 << lvl)
            R0 = Hl + 2 * PAD - 1
            keys = window_keys(lv, lx * (Wl - 1), ly * (Hl - 1), Hl, Wl, R0)
            rates.append(share_rate(keys))
        print(f"  iter {i}: share " +
              " ".join(f"L{l}={r:.3f}" for l, r in enumerate(rates)))

    # ---- BEV sites -------------------------------------------------------
    Hb, Wb = model.bev_size if hasattr(model, "bev_size") else (128, 128)
    R0b = Hb + 2 * PAD - 1
    M = 4
    for p, leaf in bevs:
        # sown tuple -> leaf is loc_x or loc_y: [6, B, Q, M, T, PD]
        pass
    # group the two leaves (x, y) per module path
    by_mod = {}
    for p, leaf in bevs:
        mod = p.rsplit("/", 1)[0]
        by_mod.setdefault(mod, []).append(leaf)
    for mod, leaves in by_mod.items():
        lx, ly = leaves  # sown in (x, y) order
        it, B, Q, M, T, PDb = lx.shape
        print(f"BEV {mod} loc {lx.shape}")
        for i in range(it):
            x = lx[i].transpose(0, 3, 1, 2, 4).reshape(B * T, Q * M * PDb)
            y = ly[i].transpose(0, 3, 1, 2, 4).reshape(B * T, Q * M * PDb)
            head = np.broadcast_to(
                np.arange(M)[None, None, :, None],
                (B * T, Q, M, PDb)).reshape(B * T, Q * M * PDb)
            keys = window_keys(head, x * Wb - 0.5, y * Hb - 0.5, Hb, Wb, R0b)
            print(f"  iter {i}: share={share_rate(keys):.3f}")


if __name__ == "__main__":
    main()
