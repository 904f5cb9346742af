"""Real-data preprocessing: FITS I/O, distortion correction, Shepard
re-interpolation, spectral median filtering."""

from .distortion import (
    generate_label_image,
    median_filter_slices,
    mrs_slices_distortion_correction,
    sort_labels_by_centroid,
)
from .fits_io import fits_open, fits_write
from .metadata import (
    mean_slit_world_coords,
    parse_raw_name,
    propagate_rotation,
    propagate_target_coords,
    rank_files_by_target_distance,
    swap_slit_blocks,
    swap_slit_blocks_in_files,
)
from .s3d import nan_border, read_s3d, resample_cube_to_grid
from .shepard import exponential_modified_shepard

__all__ = [
    "exponential_modified_shepard",
    "fits_open",
    "fits_write",
    "generate_label_image",
    "mean_slit_world_coords",
    "median_filter_slices",
    "mrs_slices_distortion_correction",
    "nan_border",
    "parse_raw_name",
    "read_s3d",
    "resample_cube_to_grid",
    "propagate_rotation",
    "propagate_target_coords",
    "rank_files_by_target_distance",
    "sort_labels_by_centroid",
    "swap_slit_blocks",
    "swap_slit_blocks_in_files",
]
