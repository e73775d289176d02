"""TPU-native compute ops: correlation cost volume, bilinear warp, conv/deconv."""
from opticalflow_tpu.ops.correlation import correlation, correlation_lax
from opticalflow_tpu.ops.warp import bilinear_warp, warp_with_mask, grid_sample
from opticalflow_tpu.ops.convops import conv2d, deconv2d, leaky_relu

__all__ = ["correlation", "correlation_lax", "bilinear_warp", "warp_with_mask",
           "grid_sample", "conv2d", "deconv2d", "leaky_relu"]
