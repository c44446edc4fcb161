"""L0 numeric/image primitives (NHWC, JAX)."""

from spaa_tpu.ops.image import (affine_grid, center_crop, expand_4d,
                                grid_sample, resize_area)
from spaa_tpu.ops.tps import (tps, tps_d, tps_depth, tps_grid, tps_sparse,
                              uniform_grid)
from spaa_tpu.ops.ssim import ssim, ssim_map
from spaa_tpu.ops.color import ciede2000_diff, deltaE, rgb2lab_diff, rgb2xyz
from spaa_tpu.ops import metrics

__all__ = [
    "affine_grid", "center_crop", "expand_4d", "grid_sample", "resize_area",
    "tps", "tps_d", "tps_depth", "tps_grid", "tps_sparse", "uniform_grid",
    "ssim", "ssim_map", "ciede2000_diff", "deltaE", "rgb2lab_diff",
    "rgb2xyz", "metrics",
]
