"""Pallas dilated-conv kernel vs the lax oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops.convops import conv2d
from opticalflow_tpu.ops.pallas_dilated import (_dilated_dw, _dilated_impl,
                                                _row_tile)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("d", [2, 4, 8])
@pytest.mark.parametrize("shape,co", [((1, 16, 32, 8), 12),
                                      ((2, 32, 48, 16), 8)])
def test_forward_matches_lax(d, shape, co):
    x = jnp.asarray(_rand(shape, d) * 0.3)
    w = jnp.asarray(_rand((3, 3, shape[-1], co), 10 + d) * 0.2)
    ref = conv2d(x, w, None, stride=1, padding=d, dilation=d)
    out = _dilated_impl(x, w, d, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_forward_d16_full_height_tile():
    """H=14 has no 8-divisible tile; the whole-image tile path must work
    (the L6/L5 grids and the d=16 conv at small heights hit this)."""
    x = jnp.asarray(_rand((1, 14, 32, 8), 3) * 0.3)
    w = jnp.asarray(_rand((3, 3, 8, 8), 4) * 0.2)
    ref = conv2d(x, w, None, stride=1, padding=16, dilation=16)
    out = _dilated_impl(x, w, 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_bf16_inputs_f32_accumulation():
    x = jnp.asarray(_rand((1, 16, 32, 8), 5)).astype(jnp.bfloat16)
    w = jnp.asarray(_rand((3, 3, 8, 8), 6) * 0.2).astype(jnp.bfloat16)
    out = _dilated_impl(x, w, 2, True)
    assert out.dtype == jnp.bfloat16
    ref = conv2d(x.astype(jnp.float32), w.astype(jnp.float32), None,
                 stride=1, padding=2, dilation=2)
    np.testing.assert_allclose(np.asarray(out).astype(np.float32),
                               np.asarray(ref), atol=5e-2, rtol=5e-2)


def test_custom_vjp_matches_lax_grad():
    d = 4
    x = jnp.asarray(_rand((1, 16, 24, 6), 7) * 0.3)
    w = jnp.asarray(_rand((3, 3, 6, 10), 8) * 0.2)
    g = jnp.asarray(_rand((1, 16, 24, 10), 9))

    def loss_ref(a, k):
        return jnp.sum(conv2d(a, k, None, stride=1, padding=d, dilation=d)
                       * g)

    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    # dx = the same kernel on g with flipped/channel-swapped weights
    # (what _dilated_vjp_bwd runs); interpret mode for the CPU backend
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _dilated_impl(g, wt, d, True)
    dw = _dilated_dw(d, x, g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("d", [1, 2, 8])
def test_fused_epilogue_matches_lax(d):
    """bias + LeakyReLU fused in-kernel == conv2d + bias + leaky."""
    from opticalflow_tpu.ops.convops import leaky_relu
    x = jnp.asarray(_rand((1, 16, 32, 8), 20 + d) * 0.3)
    w = jnp.asarray(_rand((3, 3, 8, 12), 21 + d) * 0.2)
    b = jnp.asarray(_rand((12,), 22 + d) * 0.1)
    ref = leaky_relu(conv2d(x, w, None, stride=1, padding=d, dilation=d) + b)
    out = _dilated_impl(x, w, d, True, True, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_act_vjp_matches_lax_grad():
    """Sign-recovered activation mask: grads of leaky(conv+b) agree with
    lax autodiff for x, w, and b."""
    from opticalflow_tpu.ops.convops import leaky_relu
    from opticalflow_tpu.ops.pallas_dilated import _dilated_act_vjp_bwd
    d = 2
    x = jnp.asarray(_rand((1, 16, 24, 6), 30) * 0.3)
    w = jnp.asarray(_rand((3, 3, 6, 10), 31) * 0.2)
    b = jnp.asarray(_rand((10,), 32) * 0.1)
    g = jnp.asarray(_rand((1, 16, 24, 10), 33))

    def loss_ref(a, k, bb):
        y = leaky_relu(conv2d(a, k, None, stride=1, padding=d, dilation=d)
                       + bb)
        return jnp.sum(y * g)

    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    y = _dilated_impl(x, w, d, True, True, b)
    # replicate the bwd with the dx kernel in interpret mode
    gp = jnp.where(y > 0, g, 0.1 * g)
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _dilated_impl(gp, wt, d, True)
    dw = _dilated_dw(d, x, gp)
    db = jnp.sum(gp, axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rb),
                               atol=1e-4, rtol=1e-4)


def test_row_tile_respects_divisibility():
    th = _row_tile(112, 256, 128, 128, 16, 2)
    assert th is not None and 112 % th == 0
    assert _row_tile(112, 256, 128, 128, 2, 2) is not None
