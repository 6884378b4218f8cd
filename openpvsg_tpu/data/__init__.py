from openpvsg_tpu.data import rle
from openpvsg_tpu.data.pvsg import PVSGAnnotation, PVSGRelationAnnotation, data_source_of
from openpvsg_tpu.data.masks import (
    decode_palette_mask,
    panoptic_from_instance_map,
    pan_mm2hb,
    pan_hb2mm,
    masks_to_boxes,
)
