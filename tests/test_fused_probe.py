"""Pin the fused warp⊕corr probe kernel's correctness (interpret mode).

The kernel itself is a measured NEGATIVE (PERF.md round 5: 2.3× slower
than the composed path at L3, infeasible at L2) and is not wired into the
model — but the probe is the documented §7-closure evidence, so its
correctness claim stays regression-tested: the Pallas kernel (scalar
SMEM-indexed gather + vectorized bilinear/correlation) must keep matching
warp_with_mask → correlation_lax exactly.
"""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
def test_fused_kernel_matches_composed_interpret():
    import jax.numpy as jnp

    import probe_fused_warpcorr as p

    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(2, 16, 32, 8), jnp.float32)
    f2 = jnp.asarray(rng.randn(2, 16, 32, 8), jnp.float32)
    # flows large enough to push samples out of bounds (mask + zero pad)
    flow = jnp.asarray(rng.randn(2, 16, 32, 2) * 5, jnp.float32)

    got = np.asarray(p.fused_warp_corr(f1, f2, flow, th=8, interpret=True))
    want = np.asarray(p.composed_lax(f1, f2, flow))
    np.testing.assert_allclose(got, want, atol=1e-4)
