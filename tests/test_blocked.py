"""Blocked (space-to-depth) conv transforms: exact vs the plain convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.ops import blocked as BL
from opticalflow_tpu.ops.convops import conv2d


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def test_blocked_s2_matches_plain():
    """conv1a form: 3→16 stride-2 at even sizes."""
    x = _rand((2, 32, 48, 3), 0)
    k = _rand((3, 3, 3, 16), 1) * 0.2
    ref = conv2d(x, k, None, stride=2, padding=1)
    blk = BL.conv_blocked_s2(x, BL.blocked_s2_kernel(k))
    out = BL.depth_to_space(blk)
    assert out.shape == ref.shape == (2, 16, 24, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_blocked_s1_matches_plain():
    """conv1aa/conv1b form: 16→16 stride-1 applied in block space."""
    xp = _rand((1, 16, 24, 16), 2)          # pixel layout
    k = _rand((3, 3, 16, 16), 3) * 0.2
    ref = conv2d(xp, k, None, stride=1, padding=1)
    # space-to-depth the input, run blocked, back
    b, h, w, c = xp.shape
    xb = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4 * c)
    out = BL.depth_to_space(BL.conv_blocked_s1(xb, BL.blocked_s1_kernel(k)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_blocked_consumer_matches_plain():
    """conv2a form: stride-2 conv reading the blocked layout directly."""
    xp = _rand((2, 16, 24, 16), 4)
    k = _rand((3, 3, 16, 32), 5) * 0.2
    ref = conv2d(xp, k, None, stride=2, padding=1)
    b, h, w, c = xp.shape
    xb = xp.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(b, h // 2, w // 2, 4 * c)
    out = BL.conv_blocked_consumer(xb, BL.blocked_consumer_kernel(k))
    assert out.shape == ref.shape == (2, 8, 12, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_full_level1_chain_blocked():
    """conv1a→conv1aa→conv1b→conv2a entirely in block space (the form the
    model uses: the un-blocked level-1 tensor never materializes)."""
    from opticalflow_tpu.ops.convops import leaky_relu
    x = _rand((1, 64, 64, 3), 6)
    k1a = _rand((3, 3, 3, 16), 7) * 0.2
    k1aa = _rand((3, 3, 16, 16), 8) * 0.2
    k1b = _rand((3, 3, 16, 16), 9) * 0.2
    k2a = _rand((3, 3, 16, 32), 10) * 0.2
    b1a, b1aa, b1b, b2a = (_rand((16,), 11) * 0.1, _rand((16,), 12) * 0.1,
                           _rand((16,), 13) * 0.1, _rand((32,), 14) * 0.1)

    ref = leaky_relu(conv2d(x, k1a, b1a, stride=2, padding=1))
    ref = leaky_relu(conv2d(ref, k1aa, b1aa, stride=1, padding=1))
    lvl1 = leaky_relu(conv2d(ref, k1b, b1b, stride=1, padding=1))
    ref2 = leaky_relu(conv2d(lvl1, k2a, b2a, stride=2, padding=1))

    y = BL.conv_blocked_s2(x, BL.blocked_s2_kernel(k1a))
    y = leaky_relu(y + BL.to_blocked_bias(b1a))
    y = leaky_relu(BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1aa))
                   + BL.to_blocked_bias(b1aa))
    y = leaky_relu(BL.conv_blocked_s1(y, BL.blocked_s1_kernel(k1b))
                   + BL.to_blocked_bias(b1b))
    lvl1_blk = y
    out2 = leaky_relu(BL.conv_blocked_consumer(
        lvl1_blk, BL.blocked_consumer_kernel(k2a)) + b2a)

    np.testing.assert_allclose(np.asarray(BL.depth_to_space(lvl1_blk)),
                               np.asarray(lvl1), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=1e-5, rtol=1e-5)


def test_model_blocked_lvl1_matches_unblocked():
    """PWCDCNet(use_blocked_lvl1=True) must match the plain fast-mode model
    bit-near-exactly (same params, same tree) and keep gradients flowing."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    import jax.tree_util as jtu
    x = _rand((1, 64, 128, 6), 20) * 0.2 + 0.5
    m0 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=False)
    m1 = PWCDCNet(variant="new", precision="fast", use_pallas_corr=False,
                  use_blocked_lvl1=True)
    params = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(0), x)["params"]
    assert jtu.tree_structure(params) == jtu.tree_structure(p1)
    assert all(a.shape == b.shape for a, b in
               zip(jtu.tree_leaves(params), jtu.tree_leaves(p1)))
    o0 = m0.apply({"params": params}, x)
    o1 = m1.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               atol=1e-5, rtol=1e-4)
    g = jax.grad(lambda p: float(0) + jnp.sum(
        m1.apply({"params": p}, x, train=True)[0] ** 2))(params)
    assert float(jnp.linalg.norm(g["conv1a"]["kernel"])) > 0


def test_highest_precision_keeps_plain_path():
    """Checkpoint-parity mode must not take the re-ordered blocked path."""
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    m = PWCDCNet(variant="new", precision="highest", use_pallas_corr=False)
    # the pyramid gate: blocked only in fast mode
    assert m.precision == "highest"
    x = _rand((1, 64, 64, 6), 21)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)
    assert out.shape == (1, 16, 16, 2)
