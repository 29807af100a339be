from .orientation import apply_orientation
from .raw2rgb import postprocess, get_color_matrix, apply_ccm, gamma_compression
from .denoise import frame_count_denoising_gauss, frame_count_denoising_median

__all__ = [
    "apply_orientation",
    "postprocess", "get_color_matrix", "apply_ccm", "gamma_compression",
    "frame_count_denoising_gauss", "frame_count_denoising_median",
]
