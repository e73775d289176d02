"""Resize ops vs torch F.interpolate semantics (both conventions)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from opticalflow_tpu.ops.resize import (resize_bilinear, resize_nearest,
                                        upsample_flow_to, flow_resize)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("ac", [False, True])
@pytest.mark.parametrize("size", [(8, 12), (40, 60), (17, 33)])
def test_resize_bilinear_matches_torch(ac, size):
    x = _rand((2, 24, 36, 3), 1)
    out = resize_bilinear(jnp.asarray(x), *size, align_corners=ac)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                        mode="bilinear", align_corners=ac)
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)


def test_resize_nearest_matches_torch():
    x = _rand((1, 20, 30, 2), 2)
    out = resize_nearest(jnp.asarray(x), 7, 11)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                        size=(7, 11), mode="nearest")
    np.testing.assert_array_equal(np.asarray(out),
                                  ref.permute(0, 2, 3, 1).numpy())


def test_upsample_flow_scales_vectors():
    """upsample_flow_to clones data_processing_or.py:300-310."""
    flow = _rand((1, 8, 16, 2), 3)
    out = np.asarray(upsample_flow_to(jnp.asarray(flow), 32, 32))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=(32, 32), mode="bilinear",
                        align_corners=False)
    ref[:, 0] *= 32 / 16
    ref[:, 1] *= 32 / 8
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)


def test_flow_resize_ac_true():
    """flow_resize clones inference_kitti.py:83-91 (align_corners=True)."""
    flow = _rand((1, 10, 14, 2), 4)
    out = np.asarray(flow_resize(jnp.asarray(flow), 25, 35))
    t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = F.interpolate(t, size=(25, 35), mode="bilinear", align_corners=True)
    ref[:, 0] *= 35 / 14
    ref[:, 1] *= 25 / 10
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-4)
