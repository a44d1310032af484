from .correlation import (
    correlation_volume,
    correlation_volume_golden,
    groupwise_correlation,
)
from .downsample import downsample_disp
from .encodings import fourier_coord_embed, fourier_grid_embed
from .histogram import soft_histogram
from .msda import ms_deform_attn
from .nms import max_pool_1d_3, nms_topk_seeds
from .sampling import disp_warp, grid_sample_2d, sample_cost

__all__ = [
    "correlation_volume",
    "correlation_volume_golden",
    "groupwise_correlation",
    "downsample_disp",
    "fourier_coord_embed",
    "fourier_grid_embed",
    "soft_histogram",
    "ms_deform_attn",
    "max_pool_1d_3",
    "nms_topk_seeds",
    "disp_warp",
    "grid_sample_2d",
    "sample_cost",
]
