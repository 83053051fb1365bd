from .correlation import run_correlation, pair_correlation
from .error_boxes import run_error_boxes, bucket_quantiles
from .contour import difference_image, plot_contour
from .saliency import unet_saliency, sobel_locations

__all__ = [
    "run_correlation",
    "pair_correlation",
    "run_error_boxes",
    "bucket_quantiles",
    "difference_image",
    "plot_contour",
    "unet_saliency",
    "sobel_locations",
]
