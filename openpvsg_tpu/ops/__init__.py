from openpvsg_tpu.ops.sampling import (
    bilinear_sample,
    grid_sample,
    point_sample,
    ms_deform_attn,
    uncertainty_sampled_points,
)
