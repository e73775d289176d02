"""Multi-view geometry: fundamental-matrix estimation and epipolar filtering."""
from opticalflow_tpu.geometry.epipolar import (
    eight_point_fundamental, sampson_distance, ransac_fundamental,
    build_epipolar_mask, sampson_penalty)

__all__ = ["eight_point_fundamental", "sampson_distance",
           "ransac_fundamental", "build_epipolar_mask", "sampson_penalty"]
