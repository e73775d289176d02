"""Convolution / transposed-convolution primitives with torch-exact semantics.

The model definition (``opticalflow_tpu.models.pwcnet``) needs two building
blocks whose numerics must match the reference's ``nn.Conv2d`` /
``nn.ConvTranspose2d`` so that imported ``pwc_net.pth.tar`` weights reproduce
the reference bit-for-bit (reference ``models/PWCNet.py:26-36``):

  * ``conv2d``: standard cross-correlation conv, NHWC activations, HWIO
    kernels (XLA/TPU-native layout — torch OIHW kernels are transposed once
    at import time, see ``opticalflow_tpu.models.torch_import``);
  * ``deconv2d``: torch ``ConvTranspose2d(k=4, s=2, p=1)`` ≡ a regular conv
    over the input dilated 2× with (k-1-p)=2 zero padding and the kernel
    spatially flipped + in/out transposed.  We store the kernel already
    flipped/transposed in HWIO so runtime is a single
    ``lax.conv_general_dilated`` with ``lhs_dilation``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv2d", "deconv2d", "leaky_relu"]


def conv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None, *,
           stride: int = 1, padding: int = 1, dilation: int = 1,
           precision=None, out_dtype=jnp.float32) -> jax.Array:
    """NHWC conv matching torch Conv2d(stride, padding, dilation).

    ``precision``: pass ``jax.lax.Precision.HIGHEST`` for exact float32
    accumulation (required for checkpoint-fidelity parity); None inherits the
    backend default (single-pass bf16 on MXU — the throughput path).
    ``out_dtype``: the emitted dtype — the MXU accumulates f32 internally
    either way, but a bf16 output halves the HBM write for activations that
    are immediately re-cast (the fast path's pyramid/dense convs).
    """
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=dn,
        preferred_element_type=out_dtype,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def deconv2d(x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None, *,
             stride: int = 2, kernel_size: int = 4, padding: int = 1,
             precision=None, out_dtype=jnp.float32) -> jax.Array:
    """NHWC transposed conv matching torch ConvTranspose2d(k, s, p).

    ``kernel`` is HWIO of the *equivalent forward conv* (already spatially
    flipped and in/out-transposed relative to the torch ConvTranspose2d
    weight).  Output spatial size = in*s for (k=4, s=2, p=1).
    """
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = kernel_size - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=dn,
        preferred_element_type=out_dtype,
        precision=precision,
    )
    if bias is not None:
        out = out + bias
    return out


def leaky_relu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """LeakyReLU(0.1), the activation used throughout PWC-Net."""
    return jnp.where(x >= 0, x, x * negative_slope)
