"""Epipolar geometry filtering for self-supervised flow — JAX-native.

Functional equivalent of the reference's host-side numpy pipeline
(``train_fundamental.py:169-325``): estimate a fundamental matrix from the
predicted flow via the normalized 8-point algorithm inside RANSAC over
Sampson distances, then build a per-pixel inlier mask (absolute threshold
``tau`` ∧ ``keep_ratio``-quantile, relaxed to ``min_keep`` if too sparse)
that gates the photometric loss; plus the optional soft Sampson penalty
(``train_fundamental.py:330-382``).

TPU-first redesign: the reference runs a 2000-iteration Python RANSAC loop
on the host per sample.  Here every RANSAC hypothesis is an independent
9×9 SVD — all of them solved in one vmapped batch inside jit, the winner
selected with an argmax, and the final refit done as a weighted 8-point
solve (inlier-masked rows) so shapes stay static.  The whole mask
construction composes into the train step — no host↔device round trip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["flow_to_pairs", "eight_point_fundamental", "sampson_distance",
           "ransac_fundamental", "build_epipolar_mask", "epipolar_mask_and_f",
           "sampson_penalty"]


def flow_to_pairs(flow: jax.Array, stride: int = 4
                  ) -> Tuple[jax.Array, jax.Array]:
    """(H, W, 2) flow → homogeneous correspondences (N, 3), (N, 3) sampled
    on a stride grid (``train_fundamental.py:169-193``).  Static N."""
    h, w, _ = flow.shape
    ys = jnp.arange(0, h, stride)
    xs = jnp.arange(0, w, stride)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    u = gx.reshape(-1).astype(jnp.float32)
    v = gy.reshape(-1).astype(jnp.float32)
    du = flow[gy, gx, 0].reshape(-1)
    dv = flow[gy, gx, 1].reshape(-1)
    ones = jnp.ones_like(u)
    x1 = jnp.stack([u, v, ones], axis=1)
    x2 = jnp.stack([u + du, v + dv, ones], axis=1)
    return x1, x2


def _normalize_points(x: jax.Array, wgt: Optional[jax.Array] = None):
    """Hartley normalization (mean → 0, mean radius → √2), optionally
    weighted so masked-out rows don't move the frame."""
    if wgt is None:
        wgt = jnp.ones(x.shape[0], x.dtype)
    wsum = jnp.sum(wgt) + 1e-12
    mean = jnp.sum(x[:, :2] * wgt[:, None], axis=0) / wsum
    xc = x[:, :2] - mean
    md = jnp.sum(jnp.sqrt(jnp.sum(xc ** 2, axis=1) + 1e-24) * wgt) / wsum
    s = jnp.sqrt(2.0) / (md + 1e-12)
    t = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    t = t.at[0, 0].set(s).at[1, 1].set(s)
    t = t.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    xn = x @ t.T
    return xn, t


def eight_point_fundamental(x1: jax.Array, x2: jax.Array,
                            weights: Optional[jax.Array] = None) -> jax.Array:
    """Normalized 8-point fundamental matrix from (N, 3) homogeneous
    correspondences; ``weights`` (N,) soft-select rows (0 rows drop out of
    the SVD), enabling static-shape RANSAC refits."""
    x1n, t1 = _normalize_points(x1, weights)
    x2n, t2 = _normalize_points(x2, weights)
    u, v = x1n[:, 0], x1n[:, 1]
    up, vp = x2n[:, 0], x2n[:, 1]
    a = jnp.stack([u * up, v * up, up, vp * u, vp * v, vp, u, v,
                   jnp.ones_like(u)], axis=1)
    if weights is not None:
        a = a * weights[:, None]
    # full_matrices=True is REQUIRED: for the minimal N=8 case A is (8, 9)
    # and the null-space right singular vector lives in the 9th row of vt,
    # which the reduced SVD omits — vt[-1] of the reduced form is a row-
    # space vector with singular value ~0.2, not the solution of Af=0
    # (measured: Sampson residuals 0.64 px² on the hypothesis's own exact
    # fitting points vs ~1e-9 with the full SVD, against a 0.5 px²
    # RANSAC inlier threshold).  N≥9 callers are unaffected.
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[-1].reshape(3, 3)
    # rank-2 projection
    uu, ss, vvt = jnp.linalg.svd(f)
    f = (uu * ss.at[-1].set(0.0)[None, :]) @ vvt
    f = t2.T @ f @ t1
    # normalize like the reference: by f22 when safe, else by Frobenius norm
    denom = jnp.where(jnp.abs(f[2, 2]) > 1e-12, f[2, 2],
                      jnp.linalg.norm(f) + 1e-12)
    return f / denom


def sampson_distance(f: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) distance for (N, 3) points."""
    fx1 = x1 @ f.T
    ftx2 = x2 @ f
    x2fx1 = jnp.sum(x2 * fx1, axis=1)
    denom = (fx1[:, 0] ** 2 + fx1[:, 1] ** 2
             + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2 + 1e-12)
    return (x2fx1 ** 2) / denom


@functools.partial(jax.jit, static_argnames=("iters", "min_samples"))
def ransac_fundamental(x1: jax.Array, x2: jax.Array, key: jax.Array, *,
                       iters: int = 256, thresh: float = 0.5,
                       min_samples: int = 8):
    """Batched-hypothesis RANSAC: returns (F, inlier_mask, best_count).

    All ``iters`` minimal 8-point solves run as one vmapped SVD batch; the
    best hypothesis (most Sampson inliers) is refit on its inliers with a
    weighted 8-point solve.  Equivalent in behavior to the reference's
    sequential loop (``train_fundamental.py:235-255``) at a fraction of the
    wall-clock, and differentiable-by-construction shapes.
    """
    n = x1.shape[0]
    keys = jax.random.split(key, iters)

    def hypothesis(k):
        idx = jax.random.choice(k, n, (min_samples,), replace=False)
        return eight_point_fundamental(x1[idx], x2[idx])

    fs = jax.vmap(hypothesis)(keys)                      # (iters, 3, 3)
    dists = jax.vmap(lambda f: sampson_distance(f, x1, x2))(fs)
    inl = dists < thresh                                 # (iters, N)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_mask = inl[best]
    f_ref = eight_point_fundamental(x1, x2, best_mask.astype(x1.dtype))
    return f_ref, best_mask, counts[best]


@functools.partial(jax.jit,
                   static_argnames=("stride", "iters", "min_samples"))
def epipolar_mask_and_f(flow: jax.Array, key: jax.Array, *, tau: float = 1.0,
                        stride: int = 4, keep_ratio: float = 0.2,
                        min_keep: float = 0.05, iters: int = 256,
                        thresh: float = 0.5, min_samples: int = 8):
    """(H, W, 2) flow → ((H, W) bool keep-mask, (3, 3) fundamental matrix).

    Threshold = min(tau, keep_ratio-quantile of the Sampson map), relaxed to
    the min_keep quantile when the mask would fall below that coverage
    (``train_fundamental.py:258-325``).  When RANSAC finds fewer than
    ``min_samples`` inliers the mask is all-True (the reference's failure
    fallback).
    """
    h, w, _ = flow.shape
    x1s, x2s = flow_to_pairs(flow, stride)
    f, _, count = ransac_fundamental(x1s, x2s, key, iters=iters,
                                     thresh=thresh, min_samples=min_samples)

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(gx)
    x1 = jnp.stack([gx.ravel(), gy.ravel(), ones.ravel()], axis=1)
    x2 = jnp.stack([(gx + flow[..., 0]).ravel(),
                    (gy + flow[..., 1]).ravel(), ones.ravel()], axis=1)
    d = sampson_distance(f, x1, x2).reshape(h, w)

    thr = jnp.minimum(jnp.float32(tau), jnp.quantile(d, keep_ratio))
    keep = d <= thr
    # relax when coverage < min_keep: the relaxed threshold must NOT be
    # re-clamped by tau — coverage can only fall below min_keep when
    # tau < quantile(d, min_keep), so min(tau, .) would reproduce the
    # original mask and starve the photometric loss
    thr_relaxed = jnp.quantile(d, min_keep)
    keep = jnp.where(jnp.mean(keep) < min_keep, d <= thr_relaxed, keep)
    # RANSAC failure → keep everything
    keep = jnp.where(count < min_samples, jnp.ones_like(keep), keep)
    return keep, f


def build_epipolar_mask(flow: jax.Array, key: jax.Array, **kwargs) -> jax.Array:
    """Mask-only convenience wrapper around :func:`epipolar_mask_and_f`."""
    return epipolar_mask_and_f(flow, key, **kwargs)[0]


def sampson_penalty(flow: jax.Array, f: jax.Array,
                    valid: Optional[jax.Array] = None,
                    robust: str = "huber", delta: float = 1.0) -> jax.Array:
    """Soft epipolar consistency penalty on a (B, H, W, 2) flow batch with
    per-sample (B, 3, 3) fundamental matrices
    (``train_fundamental.py:330-382``, applied with weight ``epi_soft_w``)."""
    b, h, w, _ = flow.shape
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones(h * w, jnp.float32)

    def per_sample(fl, fm):
        x1 = jnp.stack([gx.ravel(), gy.ravel(), ones], axis=1)
        x2 = jnp.stack([(gx + fl[..., 0]).ravel(),
                        (gy + fl[..., 1]).ravel(), ones], axis=1)
        return sampson_distance(fm, x1, x2).reshape(h, w)

    d = jax.vmap(per_sample)(flow, f)
    if valid is not None:
        m = (valid > 0.5).astype(d.dtype)
    else:
        m = jnp.ones_like(d)
    if robust == "huber":
        r = jnp.sqrt(d + 1e-12)
        v = jnp.where(r <= delta, 0.5 * r * r / delta, r - 0.5 * delta)
    elif robust == "l1":
        v = jnp.sqrt(d + 1e-12)
    else:
        v = d
    return jnp.sum(v * m) / (jnp.sum(m) + 1e-12)
