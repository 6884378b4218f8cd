from openpvsg_tpu.models.resnet import ResNet
from openpvsg_tpu.models.mask2former import Mask2Former, Mask2FormerHead
from openpvsg_tpu.models.fusion import (
    panoptic_fusion, panoptic_fusion_batch, query_feats_by_segment,
    instance_postprocess)
