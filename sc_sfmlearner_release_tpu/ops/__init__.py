from .geometry import (
    pixel_grid,
    pixel2cam,
    cam2pixel,
    euler2mat,
    quat2mat,
    pose_vec2mat,
    pose_mat4,
    invert_pose_mat4,
    inverse_warp,
    inverse_warp2,
)
from .grid_sample import grid_sample
from .warp_mxu import grid_sample_mxu
from .ssim import ssim
from .losses import (
    photo_and_geometry_loss,
    pairwise_loss,
    smooth_loss,
    mean_on_mask,
)
from .metrics import compute_depth_errors

__all__ = [
    "pixel_grid",
    "pixel2cam",
    "cam2pixel",
    "euler2mat",
    "quat2mat",
    "pose_vec2mat",
    "pose_mat4",
    "invert_pose_mat4",
    "inverse_warp",
    "inverse_warp2",
    "grid_sample",
    "grid_sample_mxu",
    "ssim",
    "photo_and_geometry_loss",
    "pairwise_loss",
    "smooth_loss",
    "mean_on_mask",
    "compute_depth_errors",
]
