from .depth_maps import points_to_depth_map, radar_to_depth_rcs_maps
from .transforms import ImageAug, apply_image_aug, bev_rot_scale_aug
from .synthetic import SyntheticDataset
from .nuscenes import NuScenesRadarDataset
