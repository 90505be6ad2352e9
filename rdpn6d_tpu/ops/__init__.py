"""TPU-first ops: FPS, ROI warps, labels, binning, pose solvers."""

from .binning import decode_coord_bins, expected_coord_from_bins, quantize_coords
from .fps import fps_jax, fps_native, fps_numpy, fps_points_jax, get_fps_and_center
from .region import gather_region_fps, residual_coord_target, xyz_to_region
from .warp import (
    crop_affine,
    crop_resize,
    crop_resize_batch,
    crop_rois_from_frame,
)

__all__ = [
    "decode_coord_bins", "expected_coord_from_bins", "quantize_coords",
    "fps_jax", "fps_native", "fps_numpy", "fps_points_jax",
    "get_fps_and_center", "gather_region_fps", "residual_coord_target",
    "xyz_to_region", "crop_affine", "crop_resize", "crop_resize_batch",
    "crop_rois_from_frame",
]
