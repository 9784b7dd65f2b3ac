"""The reference checkpoint's EXACT state-dict key set, independently derived
from the reference model sources (not from our converter), with shapes.

Sources (file:line are the module constructions):
  - detector assembly: /root/reference/models/racformer.py:48-99
  - head: /root/reference/models/racformer_head.py:41-53
  - transformer/decoder layer: /root/reference/models/racformer_transformer.py:85-212
  - samplers: racformer_transformer.py:340-473; BEVSelfAttention:
    /root/reference/models/bev_self_attention.py:96-102
  - temporal encoder + ConvGRU: racformer_transformer.py:625-707
  - AdaptiveMixing: racformer_transformer.py:555-575
  - view transformer + DepthNet/ASPP/SE/Mlp:
    /root/reference/models/necks/view_transformer_racformer.py:334-582
  - FPN/CustomFPN: /root/reference/models/necks/fpn.py:108-152 + mmdet FPN
  - ResNet-50 / BasicBlock: mmdet conventions (torchvision-style keys)
  - PillarFeatureNet: mmdet3d conventions

Flagship hyperparameters (configs/racformer_r50_nuimg_704x256_f8.py:26-52):
C=256, layers=6, frames=8, levels=4, num_points=4, num_points_bev=4,
img_depth_num=3, bev_depth_num=5, Q=900, classes=10, D=96 depth bins.
"""

from __future__ import annotations

from typing import Dict, Tuple

C = 256          # embed_dims
Q = 900          # num_query
NCLS = 10
NF = 8           # num_frames
NLVL = 4         # num_levels
NPTS = 4         # num_points (img)
NPTS_BEV = 4
DEPTH_IMG = 3    # img_depth_num
DEPTH_BEV = 5
D = 96           # SID depth bins
MID = 256        # DepthNet mid_channels
HID = 64         # temporal encoder hidden dims


def _linear(d, name, out, inp, bias=True):
    d[f"{name}.weight"] = (out, inp)
    if bias:
        d[f"{name}.bias"] = (out,)


def _conv(d, name, out, inp, k, bias=True):
    d[f"{name}.weight"] = (out, inp, k, k)
    if bias:
        d[f"{name}.bias"] = (out,)


def _ln(d, name, dim):
    d[f"{name}.weight"] = (dim,)
    d[f"{name}.bias"] = (dim,)


def _bn(d, name, dim):
    d[f"{name}.weight"] = (dim,)
    d[f"{name}.bias"] = (dim,)
    d[f"{name}.running_mean"] = (dim,)
    d[f"{name}.running_var"] = (dim,)
    d[f"{name}.num_batches_tracked"] = ()


def resnet50_keys(prefix="img_backbone") -> Dict[str, Tuple]:
    d = {}
    _conv(d, f"{prefix}.conv1", 64, 3, 7, bias=False)
    _bn(d, f"{prefix}.bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for li, n in enumerate(blocks, start=1):
        width = 64 * 2 ** (li - 1)
        cout = width * 4
        for b in range(n):
            p = f"{prefix}.layer{li}.{b}"
            _conv(d, f"{p}.conv1", width, cin if b == 0 else cout, 1,
                  bias=False)
            _bn(d, f"{p}.bn1", width)
            _conv(d, f"{p}.conv2", width, width, 3, bias=False)
            _bn(d, f"{p}.bn2", width)
            _conv(d, f"{p}.conv3", cout, width, 1, bias=False)
            _bn(d, f"{p}.bn3", cout)
            if b == 0:
                _conv(d, f"{p}.downsample.0", cout, cin, 1, bias=False)
                _bn(d, f"{p}.downsample.1", cout)
        cin = cout
    return d


def fpn_keys(prefix="img_neck") -> Dict[str, Tuple]:
    d = {}
    chans = (256, 512, 1024, 2048)
    for i, cin in enumerate(chans):
        _conv(d, f"{prefix}.lateral_convs.{i}.conv", C, cin, 1)
        _conv(d, f"{prefix}.fpn_convs.{i}.conv", C, C, 3)
    return d


def custom_fpn_keys(prefix="img_lss_neck") -> Dict[str, Tuple]:
    # in_channels [1024, 2048], out 256, out_ids [0] (fpn.py:108-132)
    d = {}
    for i, cin in enumerate((1024, 2048)):
        _conv(d, f"{prefix}.lateral_convs.{i}.conv", 256, cin, 1)
    _conv(d, f"{prefix}.fpn_convs.0.conv", 256, 256, 3)
    return d


def depthnet_keys(prefix="img_lss_view_transformer.depth_net"):
    d = {}
    # reduce_conv: Conv+BN+ReLU (view_transformer_racformer.py:494-500)
    _conv(d, f"{prefix}.reduce_conv.0", MID, 256, 3)
    _bn(d, f"{prefix}.reduce_conv.1", MID)
    _conv(d, f"{prefix}.context_conv", 256, MID, 1)
    _bn(d, f"{prefix}.bn", 9)  # BatchNorm1d(9) on the camera MLP input
    for mlp in ("depth_mlp", "context_mlp"):
        _linear(d, f"{prefix}.{mlp}.fc1", MID, 9)
        _linear(d, f"{prefix}.{mlp}.fc2", MID, MID)
    for se in ("depth_se", "context_se"):
        _conv(d, f"{prefix}.{se}.conv_reduce", MID, MID, 1)
        _conv(d, f"{prefix}.{se}.conv_expand", MID, MID, 1)
    # dep_proj: Conv2d(mid + D + 1 + 32, mid, 1) (:510)
    _conv(d, f"{prefix}.dep_proj", MID, MID + D + 1 + 32, 1)
    # depth_conv: BasicBlock x3 + ASPP + final 1x1 (use_dcn=False) (:514-540)
    for i in range(3):
        p = f"{prefix}.depth_conv.{i}"
        _conv(d, f"{p}.conv1", MID, MID, 3, bias=False)
        _bn(d, f"{p}.bn1", MID)
        _conv(d, f"{p}.conv2", MID, MID, 3, bias=False)
        _bn(d, f"{p}.bn2", MID)
    aspp = f"{prefix}.depth_conv.3"
    for i, k in zip(range(1, 5), (1, 3, 3, 3)):
        _conv(d, f"{aspp}.aspp{i}.atrous_conv", MID, MID, k, bias=False)
        _bn(d, f"{aspp}.aspp{i}.bn", MID)
    _conv(d, f"{aspp}.global_avg_pool.1", MID, MID, 1, bias=False)
    _bn(d, f"{aspp}.global_avg_pool.2", MID)
    _conv(d, f"{aspp}.conv1", MID, MID * 5, 1, bias=False)
    _bn(d, f"{aspp}.bn1", MID)
    _conv(d, f"{prefix}.depth_conv.4", D, MID, 1)
    return d


def view_transformer_keys(prefix="img_lss_view_transformer"):
    d = depthnet_keys(f"{prefix}.depth_net")
    _conv(d, f"{prefix}.rcs_embedding", 32, 64, 1)  # (:581)
    d[f"{prefix}.frustum"] = (D, 16, 44, 3)  # non-trainable buffer (:109)
    return d


def radar_keys():
    d = {}
    # PillarFeatureNet(in=7, feat=[64]; +3 cluster center, +3 voxel center
    # with legacy=False -> 13 inputs)
    _linear(d, "radar_voxel_encoder.pfn_layers.0.linear", 64, 13, bias=False)
    _bn(d, "radar_voxel_encoder.pfn_layers.0.norm", 64)
    # radar_bev_conv: 3 ConvModules 64->64->64->256 (racformer.py:80-99)
    for i, (cin, cout) in enumerate(((64, 64), (64, 64), (64, 256))):
        _conv(d, f"radar_bev_conv.{i}.conv", cout, cin, 3, bias=False)
        _bn(d, f"radar_bev_conv.{i}.bn", cout)
    return d


def bev_sampling_keys(prefix, temp_radar):
    d = {}
    _linear(d, f"{prefix}.ray_points_offset", DEPTH_BEV, C)
    _linear(d, f"{prefix}.sampling_offset",
            DEPTH_BEV * 4 * NPTS_BEV * 2, C)
    _linear(d, f"{prefix}.scale_weights", 4 * 1 * DEPTH_BEV * NPTS_BEV, C)
    d[f"{prefix}.positional_encoding.row_embed.weight"] = (128, 128)
    d[f"{prefix}.positional_encoding.col_embed.weight"] = (128, 128)
    _linear(d, f"{prefix}.attention.value_proj", C, C)
    _linear(d, f"{prefix}.attention.output_proj", C, C)
    _linear(d, f"{prefix}.attention.bev_queue_weight", NF, C)
    if temp_radar:
        t = f"{prefix}.temporal_encoder"
        _conv(d, f"{t}.downsample", HID, C, 3)
        _conv(d, f"{t}.upsample.1", HID, HID, 3)
        _conv(d, f"{t}.temporal_fusion", C, C + HID, 3)
        _conv(d, f"{t}.convGRU.convGRUCell.gates_conv", 3 * HID, 2 * HID, 3)
        _conv(d, f"{t}.convGRU.convGRUCell.matching_layer", HID, HID, 1)
    return d


def decoder_layer_keys(prefix="pts_bbox_head.transformer.decoder.decoder_layer"):
    d = {}
    # position_encoder: Linear,LN,ReLU,Linear,LN,ReLU (:170-177)
    _linear(d, f"{prefix}.position_encoder.0", C, 3)
    _ln(d, f"{prefix}.position_encoder.1", C)
    _linear(d, f"{prefix}.position_encoder.3", C, C)
    _ln(d, f"{prefix}.position_encoder.4", C)
    # SASA: mmcv MultiheadAttention + gen_tau (:288-289)
    sa = f"{prefix}.self_attn"
    d[f"{sa}.attention.attn.in_proj_weight"] = (3 * C, C)
    d[f"{sa}.attention.attn.in_proj_bias"] = (3 * C,)
    _linear(d, f"{sa}.attention.attn.out_proj", C, C)
    _linear(d, f"{sa}.gen_tau", 8, C)
    # image radial sampling (:350-353)
    sp = f"{prefix}.sampling"
    _linear(d, f"{sp}.ray_points_offset", DEPTH_IMG, C)
    _linear(d, f"{sp}.sampling_offset", DEPTH_IMG * 4 * NPTS * 3, C)
    _linear(d, f"{sp}.scale_weights",
            4 * NF * DEPTH_IMG * NPTS * NLVL, C)
    # the two BEV branches (:183-185)
    d.update(bev_sampling_keys(f"{prefix}.sampling_radar_bev", True))
    d.update(bev_sampling_keys(f"{prefix}.sampling_lss_bev", False))
    # AdaptiveMixing (:186, 555-575): in_points = 4*8*3 = 96, out 128
    in_points = NPTS * NF * DEPTH_IMG
    eff = C // 4
    total = eff * eff + in_points * 128
    _linear(d, f"{prefix}.mixing.parameter_generator", 4 * total, C)
    _linear(d, f"{prefix}.mixing.out_proj", C, eff * 128 * 4)
    # FFN (mmcv): layers.0.0 Linear(256,512), layers.1 Linear(512,256)
    _linear(d, f"{prefix}.ffn.layers.0.0", 512, C)
    _linear(d, f"{prefix}.ffn.layers.1", C, 512)
    for n in ("norm1", "norm2", "norm3", "norm_radar_bev", "norm_lss_bev",
              "norm_fusion"):
        _ln(d, f"{prefix}.{n}", C)
    _linear(d, f"{prefix}.fusion", C, 3 * C)
    # cls branch: (Linear,LN,ReLU) x2 + Linear (:199-205)
    _linear(d, f"{prefix}.cls_branch.0", C, C)
    _ln(d, f"{prefix}.cls_branch.1", C)
    _linear(d, f"{prefix}.cls_branch.3", C, C)
    _ln(d, f"{prefix}.cls_branch.4", C)
    _linear(d, f"{prefix}.cls_branch.6", NCLS, C)
    # reg branch: (Linear,ReLU) x2 + Linear (:207-212)
    _linear(d, f"{prefix}.reg_branch.0", C, C)
    _linear(d, f"{prefix}.reg_branch.2", C, C)
    _linear(d, f"{prefix}.reg_branch.4", 10, C)
    return d


def head_keys():
    d = {}
    d["pts_bbox_head.code_weights"] = (10,)  # frozen nn.Parameter (:41)
    d["pts_bbox_head.init_query_bbox.weight"] = (Q, 10)
    d["pts_bbox_head.label_enc.weight"] = (NCLS + 1, C - 1)
    d.update(decoder_layer_keys())
    return d


def full_reference_keyset() -> Dict[str, Tuple]:
    d = {}
    d.update(resnet50_keys())
    d.update(fpn_keys())
    d.update(custom_fpn_keys())
    d.update(view_transformer_keys())
    d.update(radar_keys())
    d.update(head_keys())
    return d
