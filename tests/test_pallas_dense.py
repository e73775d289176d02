"""Fused dense-block+heads Pallas kernel vs the lax reference (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops.pallas_dense import (_fused_impl, dense_heads_lax,
                                              fused_dense_heads)


def _setup(b=1, h=16, w=24, c0=13, widths=(16, 16, 8), heads=((2, False),
                                                              (16, True)),
           seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    xin = jnp.asarray(rng.randn(b, h, w, c0) * 0.5, dtype)
    conv_ws, conv_bs = [], []
    cin = c0
    for cw in widths:
        conv_ws.append(jnp.asarray(rng.randn(3, 3, cin, cw) * 0.2, dtype))
        conv_bs.append(jnp.asarray(rng.randn(cw) * 0.1, jnp.float32))
        cin += cw
    head_ws, head_bs, head_acts = [], [], []
    for ch, act in heads:
        head_ws.append(jnp.asarray(rng.randn(3, 3, cin, ch) * 0.2, dtype))
        head_bs.append(None if not act
                       else jnp.asarray(rng.randn(ch) * 0.1, jnp.float32))
        head_acts.append(act)
    return xin, tuple(conv_ws), tuple(conv_bs), tuple(head_ws), \
        tuple(head_bs), tuple(head_acts)


@pytest.mark.parametrize("shape", [(1, 16, 24, 13), (2, 8, 17, 5)])
def test_fused_matches_lax(shape):
    b, h, w, c0 = shape
    xin, cw, cb, hw, hb, ha = _setup(b, h, w, c0)
    ref = dense_heads_lax(xin, cw, cb, hw, hb, ha)
    out = _fused_impl(xin, cw, cb, hw, hb, ha, True)  # interpret mode
    assert len(out) == len(ref) == 2
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=1e-4, rtol=1e-4)


def test_fused_l2_geometry():
    """The real level-2 configuration (117ch in, 128/128/96/64/32 widths,
    pf2+dc1 heads) at a reduced spatial size."""
    xin, cw, cb, hw, hb, ha = _setup(
        1, 8, 32, 117, widths=(128, 128, 96, 64, 32),
        heads=((2, False), (128, True)), seed=1)
    ref = dense_heads_lax(xin, cw, cb, hw, hb, ha)
    out = _fused_impl(xin, cw, cb, hw, hb, ha, True)
    for o, r in zip(out, ref):
        # 565·9 ≈ 5e3 f32 products summed in a different order (per-piece
        # taps vs one implicit GEMM): reordering noise ≈ n·eps·|sum| ≈ 4e-3
        # on these O(7) sums, amplified relatively near the leaky kink
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=5e-3, rtol=2e-3)


def test_fused_bf16():
    xin, cw, cb, hw, hb, ha = _setup(1, 8, 16, 8, widths=(16, 8),
                                     heads=((2, False),), seed=2,
                                     dtype=jnp.bfloat16)
    ref = dense_heads_lax(xin, cw, cb, hw, hb, ha)
    out = _fused_impl(xin, cw, cb, hw, hb, ha, True)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref[0], np.float32),
        atol=5e-2, rtol=5e-2)


def test_fused_custom_vjp_matches_lax_grad():
    xin, cw, cb, hw, hb, ha = _setup(1, 8, 12, 7, widths=(8, 8),
                                     heads=((2, False), (8, True)), seed=3)
    rng = np.random.RandomState(4)

    def loss_fused(x, cws, cbs, hws):
        o = fused_dense_heads(x, cws, cbs, hws, hb, ha)
        return sum(jnp.sum(jnp.asarray(t, jnp.float32) ** 2) for t in o)

    def loss_ref(x, cws, cbs, hws):
        o = dense_heads_lax(x, cws, cbs, hws, hb, ha)
        return sum(jnp.sum(jnp.asarray(t, jnp.float32) ** 2) for t in o)

    # forward goes through the kernel (interpret is not reachable through
    # custom_vjp here, so run this grad check on CPU where _fused_impl would
    # fail — instead compare the *backward rule* directly via vjp of lax
    g1 = jax.grad(loss_ref, argnums=(0, 1))(xin, cw, cb, hw)
    # the custom bwd is literally jax.vjp(dense_heads_lax), so check the
    # fwd/bwd pair wiring instead: bwd(residuals, g) == vjp of reference
    from opticalflow_tpu.ops.pallas_dense import _fused_bwd
    cot = tuple(jnp.ones((1, 8, 12, c), xin.dtype) for c, _ in
                ((2, False), (8, True)))
    dx, dcw, dcb, dhw, dhb = _fused_bwd(ha, (xin, cw, cb, hw, hb), cot)

    def f(x, cws, cbs, hws, hbs):
        return dense_heads_lax(x, cws, cbs, hws, hbs, ha)
    _, vjp = jax.vjp(f, xin, cw, cb, hw, hb)
    rdx, rdcw, rdcb, rdhw, rdhb = vjp(cot)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rdx), atol=1e-5)
    for a, b in zip(dcw, rdcw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert dhb[0] is None  # bias-less head stays bias-less
