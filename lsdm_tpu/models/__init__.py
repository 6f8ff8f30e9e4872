"""Model zoo: SDM denoiser + backbones + baseline families."""

from lsdm_tpu.models.sdm import SceneDiffusionModel
from lsdm_tpu.models.pointnet2 import PointNet2Backbone
from lsdm_tpu.models.posa import POSADecoderBackbone, POSAEncoder, POSADecoder, POSA
