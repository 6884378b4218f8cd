from openpvsg_tpu.ops.pallas.fusion_kernel import fused_fusion_maps
