"""TPU-native op kernels (jnp reference impls + Pallas hot paths)."""
from .interp import (
    grid_sample,
    grid_sample_grouped,
    resize_bilinear,
    resize_bilinear_at,
    resize_tap_plan,
    tap_reduce,
    resize_nearest,
    upsample_nearest,
    avg_pool_2x,
    interpolate_flow,
)
from .coords import (
    make_coordinate_grid,
    kp2gaussian,
    softargmax_kp,
    antialias_downsample,
    convex_hull_area,
)
from .color import rgb_to_yuv420, yuv420_to_rgb
from .vq import vq_quantize, vq_lookup, vq_nearest_indices
from .dcn import deform_conv2d, modulated_deform_conv2d
from .stylegan_ops import fused_leaky_relu, upfirdn2d, make_resample_kernel
from .tps import (
    RandomTPSParams,
    sample_random_tps,
    tps_warp_coordinates,
    tps_warp_frame_grid,
    tps_jacobian,
)

__all__ = [
    "grid_sample",
    "grid_sample_grouped",
    "resize_bilinear",
    "resize_nearest",
    "upsample_nearest",
    "avg_pool_2x",
    "interpolate_flow",
    "resize_bilinear_at",
    "resize_tap_plan",
    "tap_reduce",
    "make_coordinate_grid",
    "kp2gaussian",
    "softargmax_kp",
    "antialias_downsample",
    "convex_hull_area",
    "rgb_to_yuv420",
    "yuv420_to_rgb",
    "vq_quantize",
    "vq_lookup",
    "vq_nearest_indices",
    "RandomTPSParams",
    "sample_random_tps",
    "tps_warp_coordinates",
    "tps_warp_frame_grid",
    "tps_jacobian",
]
