from .bbox_codec import (
    normalize_bbox,
    denormalize_bbox,
    encode_bbox,
    decode_bbox,
    theta_d_to_xy,
    xy_to_theta_d,
    rotation_2d_in_bev,
    inverse_sigmoid,
)
from .depth_bins import sid_bin_values, depth_to_sid_index
from .bilinear import bilinear_sample_nhwc
from .msmv import msmv_sample
from .deform_attn import deform_attn_single_level
from .bev_pool import bev_pool, frustum_grid, make_frustum
from .pillars import pillar_bev_features
from .sampling import make_sample_points, project_points_to_views
