"""Epipolar geometry tests: synthetic two-view ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.geometry.epipolar import (
    eight_point_fundamental, sampson_distance, ransac_fundamental,
    build_epipolar_mask, sampson_penalty, flow_to_pairs)


def _synthetic_two_view(n=200, seed=0, noise=0.0):
    """Random 3D points seen by two cameras; returns (x1, x2, F_true)."""
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3) * [8, 6, 4] + [-4, -3, 6]   # in front of cameras
    k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    # camera 1 at origin; camera 2 translated + slightly rotated
    t = np.array([0.5, 0.1, 0.05])
    ang = 0.05
    r = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    p1 = (k @ pts.T).T
    p2 = (k @ (r @ pts.T + t[:, None])).T
    x1 = p1 / p1[:, 2:3]
    x2 = p2 / p2[:, 2:3]
    if noise:
        x1[:, :2] += rng.randn(n, 2) * noise
        x2[:, :2] += rng.randn(n, 2) * noise
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    e = tx @ r
    f_true = np.linalg.inv(k).T @ e @ np.linalg.inv(k)
    return (x1.astype(np.float32), x2.astype(np.float32),
            f_true / f_true[2, 2])


def test_eight_point_recovers_f():
    """float32 on-device solve: Sampson residuals must be far below the
    RANSAC threshold (0.5 px²) on exact correspondences.  (The solve is
    precision-limited in f32 — with jax_enable_x64 residuals drop to
    ~1e-11 — but 0.5 px² headroom is what the masking pipeline needs.)"""
    x1, x2, _ = _synthetic_two_view()
    f = np.asarray(eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2)))
    d = np.asarray(sampson_distance(jnp.asarray(f), jnp.asarray(x1),
                                    jnp.asarray(x2)))
    assert np.median(d) < 0.05
    assert d.max() < 0.5


def test_eight_point_minimal_sample_fits_its_own_points():
    """The N=8 minimal solve (the RANSAC hypothesis path) must fit its own
    EXACT correspondences to ~solver precision.  Regression for the
    reduced-SVD bug: svd(full_matrices=False) on the (8, 9) design matrix
    omits the null-space right singular vector, so vt[-1] was a row-space
    vector and every RANSAC hypothesis carried 0.64 px² mean residual on
    its own fitting points — larger than the 0.5 px² inlier threshold."""
    for seed in range(5):
        x1, x2, _ = _synthetic_two_view(n=8, seed=seed)
        f = eight_point_fundamental(jnp.asarray(x1), jnp.asarray(x2))
        d = np.asarray(sampson_distance(f, jnp.asarray(x1), jnp.asarray(x2)))
        assert d.max() < 1e-3, (seed, d.max())


def test_ransac_rejects_outliers():
    x1, x2, _ = _synthetic_two_view(n=300, noise=0.05)
    rng = np.random.RandomState(3)
    x2c = x2.copy()
    bad = rng.choice(300, 60, replace=False)          # 20% outliers
    x2c[bad, :2] += rng.randn(60, 2) * 30.0
    f, inliers, count = ransac_fundamental(
        jnp.asarray(x1), jnp.asarray(x2c), jax.random.PRNGKey(0),
        iters=128, thresh=0.5)
    inliers = np.asarray(inliers)
    assert int(count) > 150
    # most marked inliers should be true inliers
    assert inliers[bad].mean() < 0.25
    d = np.asarray(sampson_distance(f, jnp.asarray(x1), jnp.asarray(x2c)))
    good = np.setdiff1d(np.arange(300), bad)
    assert np.median(d[good]) < 0.5


def test_epipolar_mask_consistent_flow_keeps_pixels():
    """A flow consistent with a pure-translation epipolar geometry should
    keep a healthy share of pixels; tau-quantile logic caps it at the
    keep_ratio quantile."""
    h, w = 48, 64
    flow = np.tile(np.array([2.0, 1.0], np.float32), (h, w, 1))
    flow += np.random.RandomState(0).randn(h, w, 2).astype(np.float32) * 0.01
    mask = np.asarray(build_epipolar_mask(
        jnp.asarray(flow), jax.random.PRNGKey(1), tau=1.0, stride=4,
        keep_ratio=0.5, min_keep=0.05, iters=64))
    assert mask.shape == (h, w)
    assert mask.mean() >= 0.2


def test_sampson_penalty_zero_for_exact_geometry():
    x1, x2, f_true = _synthetic_two_view(n=64 * 48)
    # build a dense "flow" whose endpoints are the exact correspondences
    h, w = 48, 64
    # synthesize: flow = x2 - x1 arranged on a grid
    u = (x2[:, 0] - x1[:, 0]).reshape(h, w)
    v = (x2[:, 1] - x1[:, 1]).reshape(h, w)
    # the grid positions must be x1 — rebuild exact x1 grid flow instead:
    # use sampson_penalty on points via flow trick is approximate; just
    # check it is small for consistent flow and larger for corrupted flow.
    flow = np.stack([u, v], axis=-1).astype(np.float32)[None]
    f = jnp.asarray(np.tile(f_true[None], (1, 1, 1)).astype(np.float32))
    base = float(sampson_penalty(jnp.asarray(flow), f))
    corrupted = flow + np.random.RandomState(1).randn(*flow.shape).astype(
        np.float32) * 20.0
    worse = float(sampson_penalty(jnp.asarray(corrupted), f))
    assert worse > base


def test_flow_to_pairs_shapes():
    flow = jnp.zeros((32, 48, 2))
    x1, x2 = flow_to_pairs(flow, stride=8)
    assert x1.shape == (4 * 6, 3) and x2.shape == (4 * 6, 3)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_epipolar_mask_relaxes_to_min_keep_coverage():
    """When tau sits below the min_keep quantile of the Sampson map, the
    mask must relax to ~min_keep coverage rather than starving the
    photometric loss (the relaxed threshold must not be re-clamped by tau,
    which would reproduce the original mask; reference fallback
    train_fundamental.py:258-325)."""
    h, w = 48, 64
    rng = np.random.RandomState(3)
    # incoherent flow -> RANSAC fits SOME F but the Sampson residuals are
    # broadly large, so a tiny tau keeps (almost) nothing without the relax
    flow = rng.randn(h, w, 2).astype(np.float32) * 6.0
    mask = np.asarray(build_epipolar_mask(
        jnp.asarray(flow), jax.random.PRNGKey(0), tau=1e-9, stride=4,
        keep_ratio=0.2, min_keep=0.05, iters=64))
    # either the RANSAC-failure fallback fired (all True) or the relaxation
    # guaranteed ~min_keep coverage; both are >= min_keep by construction
    assert mask.mean() >= 0.05 * 0.9, mask.mean()
