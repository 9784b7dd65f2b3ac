from .layers import ConvBN, FrozenBatchNorm, MlpBlock, FFN
from .resnet import ResNet50
from .fpn import FPN, CustomFPN
from .depthnet import DepthNet
from .view_transformer import LSSViewTransformer
from .pillar_encoder import RadarPillarEncoder
from .conv_gru import ConvGRU, RadarBEVTemporalEncoder
from .positional import LearnedPositionalEncoding2D
from .sasa import ScaleAdaptiveSelfAttention
from .adaptive_mixing import AdaptiveMixing
from .bev_sampling import BEVSampling, BEVCrossFrameAttention
from .img_sampling import ImageRadialSampling
from .decoder import RaCFormerDecoder
from .head import RaCFormerHead
