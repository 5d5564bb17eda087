"""Pure-function tensor ops (the analog of the reference's ``utils/``).

Everything here is shape-polymorphic, jit-safe, channel-last, and
unit-tested against golden torch behavior.
"""

from pips_tpu.ops.grids import coords_grid, gridcloud2d, meshgrid2d
from pips_tpu.ops.embed import get_3d_embedding, posemb_sincos_2d_xy, posemb_sincos_3d
from pips_tpu.ops.reduce import normalize, reduce_masked_mean
from pips_tpu.ops.samp import bilinear_sample2d, grid_sample_zeros
from pips_tpu.ops.resize import avg_pool2x2, resize_bilinear_align_corners
from pips_tpu.ops.corr import build_fmap_pyramid, corr_pyramid, sample_corr_pyramid
from pips_tpu.ops.fps import farthest_point_sample, farthest_point_sample_py

__all__ = [
    "avg_pool2x2",
    "bilinear_sample2d",
    "build_fmap_pyramid",
    "coords_grid",
    "corr_pyramid",
    "farthest_point_sample",
    "farthest_point_sample_py",
    "get_3d_embedding",
    "grid_sample_zeros",
    "gridcloud2d",
    "meshgrid2d",
    "normalize",
    "posemb_sincos_2d_xy",
    "posemb_sincos_3d",
    "reduce_masked_mean",
    "resize_bilinear_align_corners",
    "sample_corr_pyramid",
]
