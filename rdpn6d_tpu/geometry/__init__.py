"""Pure-JAX geometry core: rotations, camera model, SE(3), symmetries."""

from .rotations import (
    angular_distance,
    axangle_to_mat,
    axangle_to_quat,
    exp_map,
    log_map,
    mat_to_ortho6d,
    mat_to_quat,
    normalize,
    ortho6d_to_mat,
    quat_mul,
    quat_to_mat,
)
from .allocentric import allo_to_ego_mat, ego_to_allo_mat
from .camera import (
    backproject_depth,
    crop_K,
    project,
    recover_pose_centroid_z,
)
from .se3 import compose, invert, to_homo, transform_pts
from .symmetry import closest_rot, pad_symmetries, symmetry_rotations

__all__ = [
    "angular_distance", "axangle_to_mat", "axangle_to_quat", "exp_map",
    "log_map", "mat_to_ortho6d", "mat_to_quat", "normalize", "ortho6d_to_mat",
    "quat_mul", "quat_to_mat", "allo_to_ego_mat", "ego_to_allo_mat",
    "backproject_depth", "crop_K", "project", "recover_pose_centroid_z",
    "compose", "invert", "to_homo", "transform_pts",
    "closest_rot", "pad_symmetries", "symmetry_rotations",
]
