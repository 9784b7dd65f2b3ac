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


def _ln(kind: str) -> Tuple[str, Any]:
    """LayerNorm leaf map: weight->scale, bias->bias."""
    return {"weight": ("params", "scale"), "bias": ("params", "bias")}[kind]


def _bn(kind: str) -> Tuple[str, str]:
    return {"weight": ("params", "scale"), "bias": ("params", "bias"),
            "running_mean": ("batch_stats", "mean"),
            "running_var": ("batch_stats", "var")}[kind]


def _dense_or_conv1x1(val: np.ndarray) -> np.ndarray:
    """torch Linear [out,in] or 1x1 Conv [out,in,1,1] -> flax Dense [in,out]."""
    if val.ndim == 4:
        val = val[:, :, 0, 0]
    return np.transpose(val, (1, 0))


# Generic rule table: (regex on the torch key, path template using regex
# groups, value transform). Targets are '/'-joined into the flax tree under
# either params/ or batch_stats/ (decided by the BN/LN leaf maps).
# Reference module names from /root/reference/models/* (see each rule).
_DETECTOR_RULES = []


def _rule(pattern, template, fn=np.asarray):
    _DETECTOR_RULES.append((re.compile(pattern), template, fn))


def _convbn(src_prefix, dst_prefix):
    """ConvModule / conv+bn pair -> our ConvBN {conv, norm}."""
    _rule(rf"{src_prefix}\.conv\.weight$", f"params/{dst_prefix}/conv/kernel", _conv)
    _rule(rf"{src_prefix}\.conv\.bias$", f"params/{dst_prefix}/conv/bias")
    _rule(rf"{src_prefix}\.bn\.(weight|bias|running_mean|running_var)$",
          f"{{bn0}}/{dst_prefix}/norm/{{bn1}}")


# --- LSS view transformer / DepthNet (`view_transformer_racformer.py:481-567`)
_VT = "img_lss_view_transformer"
_DN = f"{_VT}.depth_net"
_DNP = f"{_VT}/depth_net"
_rule(rf"{_DN}\.reduce_conv\.0\.weight$", f"params/{_DNP}/reduce_conv/conv/kernel", _conv)
_rule(rf"{_DN}\.reduce_conv\.0\.bias$", f"params/{_DNP}/reduce_conv/conv/bias")
_rule(rf"{_DN}\.reduce_conv\.1\.(weight|bias|running_mean|running_var)$",
      f"{{bn0}}/{_DNP}/reduce_conv/norm/{{bn1}}")
_rule(rf"{_DN}\.context_conv\.(weight)$", f"params/{_DNP}/context_conv/kernel", _conv)
_rule(rf"{_DN}\.context_conv\.(bias)$", f"params/{_DNP}/context_conv/bias")
_rule(rf"{_DN}\.bn\.(weight|bias|running_mean|running_var)$",
      f"{{bn0}}/{_DNP}/mlp_bn/{{bn1}}")
for mlp in ("depth_mlp", "context_mlp"):
    for fc in ("fc1", "fc2"):
        _rule(rf"{_DN}\.{mlp}\.{fc}\.weight$", f"params/{_DNP}/{mlp}/{fc}/kernel", _linear)
        _rule(rf"{_DN}\.{mlp}\.{fc}\.bias$", f"params/{_DNP}/{mlp}/{fc}/bias")
for se in ("depth_se", "context_se"):
    for cv in ("conv_reduce", "conv_expand"):
        _rule(rf"{_DN}\.{se}\.{cv}\.weight$", f"params/{_DNP}/{se}/{cv}/kernel", _dense_or_conv1x1)
        _rule(rf"{_DN}\.{se}\.{cv}\.bias$", f"params/{_DNP}/{se}/{cv}/bias")
_rule(rf"{_DN}\.dep_proj\.weight$", f"params/{_DNP}/dep_proj/kernel", _conv)
_rule(rf"{_DN}\.dep_proj\.bias$", f"params/{_DNP}/dep_proj/bias")
for i, blk in enumerate(("block1", "block2", "block3")):
    for cj, (c, b) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        _rule(rf"{_DN}\.depth_conv\.{i}\.{c}\.weight$",
              f"params/{_DNP}/{blk}/conv{cj + 1}/conv/kernel", _conv)
        _rule(rf"{_DN}\.depth_conv\.{i}\.{b}\.(weight|bias|running_mean|running_var)$",
              f"{{bn0}}/{_DNP}/{blk}/conv{cj + 1}/norm/{{bn1}}")
for j in range(1, 5):
    _rule(rf"{_DN}\.depth_conv\.3\.aspp{j}\.atrous_conv\.weight$",
          f"params/{_DNP}/aspp/aspp{j}/conv/kernel", _conv)
    _rule(rf"{_DN}\.depth_conv\.3\.aspp{j}\.bn\.(weight|bias|running_mean|running_var)$",
          f"{{bn0}}/{_DNP}/aspp/aspp{j}/norm/{{bn1}}")
_rule(rf"{_DN}\.depth_conv\.3\.global_avg_pool\.1\.weight$",
      f"params/{_DNP}/aspp/gap_conv/conv/kernel", _conv)
_rule(rf"{_DN}\.depth_conv\.3\.global_avg_pool\.2\.(weight|bias|running_mean|running_var)$",
      f"{{bn0}}/{_DNP}/aspp/gap_conv/norm/{{bn1}}")
_rule(rf"{_DN}\.depth_conv\.3\.conv1\.weight$", f"params/{_DNP}/aspp/project/conv/kernel", _conv)
_rule(rf"{_DN}\.depth_conv\.3\.bn1\.(weight|bias|running_mean|running_var)$",
      f"{{bn0}}/{_DNP}/aspp/project/norm/{{bn1}}")
_rule(rf"{_DN}\.depth_conv\.4\.weight$", f"params/{_DNP}/depth_out/kernel", _conv)
_rule(rf"{_DN}\.depth_conv\.4\.bias$", f"params/{_DNP}/depth_out/bias")
_rule(rf"{_VT}\.rcs_embedding\.weight$", f"params/{_VT}/rcs_embedding/kernel", _dense_or_conv1x1)
_rule(rf"{_VT}\.rcs_embedding\.bias$", f"params/{_VT}/rcs_embedding/bias")

# --- radar pillar branch (`models/racformer.py:77-99`)
_rule(r"radar_voxel_encoder\.pfn_layers\.0\.linear\.weight$",
      "params/radar_encoder/pfn_linear/kernel", _linear)
_rule(r"radar_voxel_encoder\.pfn_layers\.0\.norm\.(weight|bias|running_mean|running_var)$",
      "{bn0}/radar_encoder/pfn_bn/{bn1}")
for i in range(3):
    _convbn(rf"radar_bev_conv\.{i}", f"radar_encoder/conv{i + 1}")

# --- head (`models/racformer_head.py`) -----------------------------------
_H = "pts_bbox_head"
_rule(rf"{_H}\.init_query_bbox\.weight$", f"params/{_H}/init_query_bbox")
_rule(rf"{_H}\.label_enc\.weight$", f"params/{_H}/label_enc/embedding")

# --- shared decoder layer (`models/racformer_transformer.py:145-236`) ----
_L = rf"{_H}\.transformer\.decoder\.decoder_layer"
_LP = f"{_H}/decoder/layer"
for i, (src, dst) in enumerate((("0", "fc1"), ("1", "ln1"), ("3", "fc2"), ("4", "ln2"))):
    kind = "kernel" if dst.startswith("fc") else "scale"
    fn = _linear if dst.startswith("fc") else np.asarray
    _rule(rf"{_L}\.position_encoder\.{src}\.weight$",
          f"params/{_LP}/position_encoder/{dst}/{kind}", fn)
    _rule(rf"{_L}\.position_encoder\.{src}\.bias$",
          f"params/{_LP}/position_encoder/{dst}/bias")
_rule(rf"{_L}\.self_attn\.gen_tau\.weight$", f"params/{_LP}/self_attn/gen_tau/kernel", _linear)
_rule(rf"{_L}\.self_attn\.gen_tau\.bias$", f"params/{_LP}/self_attn/gen_tau/bias")
_rule(rf"{_L}\.self_attn\.attention\.attn\.out_proj\.weight$",
      f"params/{_LP}/self_attn/out_proj/kernel", _linear)
_rule(rf"{_L}\.self_attn\.attention\.attn\.out_proj\.bias$",
      f"params/{_LP}/self_attn/out_proj/bias")
for br in ("sampling", "sampling_radar_bev", "sampling_lss_bev"):
    for lin in ("sampling_offset", "ray_points_offset", "scale_weights"):
        _rule(rf"{_L}\.{br}\.{lin}\.weight$", f"params/{_LP}/{br}/{lin}/kernel", _linear)
        _rule(rf"{_L}\.{br}\.{lin}\.bias$", f"params/{_LP}/{br}/{lin}/bias")
    _rule(rf"{_L}\.{br}\.attention\.output_proj\.weight$",
          f"params/{_LP}/{br}/attention/output_proj/kernel", _linear)
    _rule(rf"{_L}\.{br}\.attention\.output_proj\.bias$",
          f"params/{_LP}/{br}/attention/output_proj/bias")
    _rule(rf"{_L}\.{br}\.attention\.bev_queue_weight\.weight$",
          f"params/{_LP}/{br}/attention/bev_queue_weight/kernel", _linear)
    _rule(rf"{_L}\.{br}\.attention\.bev_queue_weight\.bias$",
          f"params/{_LP}/{br}/attention/bev_queue_weight/bias")
    # value projections were hoisted out of the scanned layer
    # (decoder.py: `sampling_*_value`)
    _rule(rf"{_L}\.{br}\.attention\.value_proj\.weight$",
          f"params/{_H}/decoder/{br}_value/value_proj/kernel", _linear)
    _rule(rf"{_L}\.{br}\.attention\.value_proj\.bias$",
          f"params/{_H}/decoder/{br}_value/value_proj/bias")
    _rule(rf"{_L}\.{br}\.positional_encoding\.row_embed\.weight$",
          f"params/{_H}/decoder/{br}_value/positional_encoding/row_embed/embedding")
    _rule(rf"{_L}\.{br}\.positional_encoding\.col_embed\.weight$",
          f"params/{_H}/decoder/{br}_value/positional_encoding/col_embed/embedding")
# radar temporal encoder (hoisted)
_TE = rf"{_L}\.sampling_radar_bev\.temporal_encoder"
_TEP = f"{_H}/decoder/sampling_radar_bev_temporal_encoder"
_rule(rf"{_TE}\.downsample\.weight$", f"params/{_TEP}/downsample/kernel", _conv)
_rule(rf"{_TE}\.downsample\.bias$", f"params/{_TEP}/downsample/bias")
_rule(rf"{_TE}\.upsample\.1\.weight$", f"params/{_TEP}/up_conv/kernel", _conv)
_rule(rf"{_TE}\.upsample\.1\.bias$", f"params/{_TEP}/up_conv/bias")
_rule(rf"{_TE}\.temporal_fusion\.weight$", f"params/{_TEP}/temporal_fusion/kernel", _conv)
_rule(rf"{_TE}\.temporal_fusion\.bias$", f"params/{_TEP}/temporal_fusion/bias")
_rule(rf"{_TE}\.convGRU\.convGRUCell\.gates_conv\.weight$",
      f"params/{_TEP}/gru/cell/gates/kernel", _conv)
_rule(rf"{_TE}\.convGRU\.convGRUCell\.gates_conv\.bias$",
      f"params/{_TEP}/gru/cell/gates/bias")
_rule(rf"{_TE}\.convGRU\.convGRUCell\.matching_layer\.weight$",
      f"params/{_TEP}/gru/cell/matching/kernel", _conv)
_rule(rf"{_TE}\.convGRU\.convGRUCell\.matching_layer\.bias$",
      f"params/{_TEP}/gru/cell/matching/bias")
# mixing / fusion / ffn / norms / branches
_rule(rf"{_L}\.mixing\.parameter_generator\.weight$",
      f"params/{_LP}/mixing/parameter_generator/kernel", _linear)
_rule(rf"{_L}\.mixing\.parameter_generator\.bias$",
      f"params/{_LP}/mixing/parameter_generator/bias")
_rule(rf"{_L}\.mixing\.out_proj\.weight$", f"params/{_LP}/mixing/out_proj/kernel", _linear)
_rule(rf"{_L}\.mixing\.out_proj\.bias$", f"params/{_LP}/mixing/out_proj/bias")
_rule(rf"{_L}\.fusion\.weight$", f"params/{_LP}/fusion/kernel", _linear)
_rule(rf"{_L}\.fusion\.bias$", f"params/{_LP}/fusion/bias")
_rule(rf"{_L}\.ffn\.layers\.0\.0\.weight$", f"params/{_LP}/ffn/fc1/kernel", _linear)
_rule(rf"{_L}\.ffn\.layers\.0\.0\.bias$", f"params/{_LP}/ffn/fc1/bias")
_rule(rf"{_L}\.ffn\.layers\.1\.weight$", f"params/{_LP}/ffn/fc2/kernel", _linear)
_rule(rf"{_L}\.ffn\.layers\.1\.bias$", f"params/{_LP}/ffn/fc2/bias")
for nm in ("norm1", "norm2", "norm3", "norm_radar_bev", "norm_lss_bev", "norm_fusion"):
    _rule(rf"{_L}\.{nm}\.weight$", f"params/{_LP}/{nm}/scale")
    _rule(rf"{_L}\.{nm}\.bias$", f"params/{_LP}/{nm}/bias")
for src, dst in (("0", "fc0"), ("1", "ln0"), ("3", "fc1"), ("4", "ln1"), ("6", "out")):
    kind = "scale" if dst.startswith("ln") else "kernel"
    fn = np.asarray if dst.startswith("ln") else _linear
    _rule(rf"{_L}\.cls_branch\.{src}\.weight$", f"params/{_LP}/cls_branch/{dst}/{kind}", fn)
    _rule(rf"{_L}\.cls_branch\.{src}\.bias$", f"params/{_LP}/cls_branch/{dst}/bias")
for src, dst in (("0", "fc0"), ("2", "fc1"), ("4", "out")):
    _rule(rf"{_L}\.reg_branch\.{src}\.weight$", f"params/{_LP}/reg_branch/{dst}/kernel", _linear)
    _rule(rf"{_L}\.reg_branch\.{src}\.bias$", f"params/{_LP}/reg_branch/{dst}/bias")


def _detector_rules(key: str):
    for pat, template, fn in _DETECTOR_RULES:
        m = pat.match(key)
        if m:
            if "{bn0}" in template:
                bn0, bn1 = _bn(m.group(1))
                return template.format(bn0=bn0, bn1=bn1), fn
            return template, fn
    return None


# state-dict entries with no flax counterpart BY DESIGN: recomputed from the
# config (frustum, code_weights) or pure bookkeeping (BN step counters).
IGNORED_KEYS = (
    re.compile(r"\.num_batches_tracked$"),
    re.compile(r"^img_lss_view_transformer\.frustum$"),
    re.compile(r"^pts_bbox_head\.code_weights$"),
)


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
        if any(p.search(key) for p in IGNORED_KEYS):
            continue
        val = np.asarray(val)
        targets = []  # list of (path, transformed value)
        rule = None
        if key.startswith("img_backbone."):
            rule = _resnet_rules(key[len("img_backbone."):])
        elif key.startswith("img_neck."):
            rule = _fpn_rules(key[len("img_neck."):], "img_neck")
        elif key.startswith("img_lss_neck."):
            rule = _fpn_rules(key[len("img_lss_neck."):], "img_lss_neck")
        else:
            rule = _detector_rules(key)
        if rule is not None:
            path, fn = rule
            targets.append((path, fn(val)))
        else:
            # torch MultiheadAttention fused qkv -> split projections
            m = re.match(
                rf"{_H}\.transformer\.decoder\.decoder_layer\.self_attn\."
                rf"attention\.attn\.in_proj_(weight|bias)$", key)
            if m:
                parts = np.split(val, 3, axis=0)
                leaf = "kernel" if m.group(1) == "weight" else "bias"
                for name, part in zip(("q_proj", "k_proj", "v_proj"), parts):
                    v = _linear(part) if leaf == "kernel" else part
                    targets.append(
                        (f"params/{_LP}/self_attn/{name}/{leaf}", v)
                    )
        if not targets:
            unmatched.append(key)
            continue
        for path, v in targets:
            try:
                if not _set(out, path, v, strict=strict):
                    # non-strict _set returns False on a missing target —
                    # report it; silently dropping a checkpoint tensor is
                    # exactly what the full-keyset gate exists to catch
                    unmatched.append(f"{key} (no target {path})")
            except (KeyError, ValueError) as e:
                if strict:
                    raise
                unmatched.append(f"{key} ({e})")
    return out, unmatched


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(np.asarray, tree)


def load_pretrained(path: str, params: Dict, revise_keys=None,
                    state_dict=None) -> Dict:
    """Load a torch checkpoint (pth) or pickled numpy state dict and merge the
    convertible weights into `params` (backbone/neck pretrain path).

    Pass `state_dict` to reuse an already-deserialized checkpoint (val.py
    reads the `version` field from the same file — avoid a second full
    torch.load of a multi-hundred-MB checkpoint)."""
    if state_dict is not None:
        sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
              for k, v in state_dict.items()
              if hasattr(v, "numpy") or isinstance(v, np.ndarray)}
    elif path.endswith((".pth", ".pt")):
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
