"""Real-data preprocessing: FITS I/O, distortion correction, Shepard
re-interpolation, spectral median filtering."""

from .distortion import (
    generate_label_image,
    median_filter_slices,
    mrs_slices_distortion_correction,
    sort_labels_by_centroid,
)
from .fits_io import fits_open, fits_write
from .shepard import exponential_modified_shepard

__all__ = [
    "exponential_modified_shepard",
    "fits_open",
    "fits_write",
    "generate_label_image",
    "median_filter_slices",
    "mrs_slices_distortion_correction",
    "sort_labels_by_centroid",
]
