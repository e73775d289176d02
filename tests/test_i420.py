"""I420 upload mode: the on-device YUV→RGB kernel must be bit-exact to
cv2's integer conversion, and the i420 runner must agree with the bgr
runner up to nothing but the 4:2:0 chroma subsample (i.e. it must EQUAL
the bgr runner fed host-cv2-round-tripped frames).

The mode exists because H2D bytes are the end-to-end wall of the
streaming pipeline on bandwidth-starved hosts (PERF.md round 4): planar
YUV 4:2:0 is 1.5 B/px vs RGB's 3 B/px.  No reference counterpart (the
reference's loop is serial BGR all the way, pwc_extract_flow_video.py).
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opticalflow_tpu.video import VideoFlowRunner, yuv_i420_to_rgb_u8
from test_video_runner import StubFlow


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    # blur so chroma is smooth-ish (like real video), but keep hard pixels
    fr = []
    for _ in range(n):
        f = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fr.append(cv2.GaussianBlur(f, (0, 0), 1.5))
    return fr


@pytest.mark.parametrize("h,w", [(64, 128), (70, 64), (94, 130)])
def test_device_i420_kernel_bit_exact_vs_cv2(h, w):
    """Includes h % 4 != 0 heights (70, 94): the U/V boundary falls
    mid-row there, so the kernel must slice the chroma region by element
    count (a row slice crashed on every even-but-not-/4 height)."""
    rng = np.random.RandomState(1)
    b = 3
    yuvs = (rng.rand(b, h * 3 // 2, w) * 255).astype(np.uint8)
    got = np.asarray(jax.jit(yuv_i420_to_rgb_u8)(jnp.asarray(yuvs)))
    for k in range(b):
        want_bgr = cv2.cvtColor(yuvs[k], cv2.COLOR_YUV2BGR_I420)
        np.testing.assert_array_equal(got[k], want_bgr[..., ::-1],
                                      err_msg=f"frame {k}")


def test_i420_runner_equals_bgr_runner_on_roundtripped_frames():
    """Feed the bgr runner frames that went through the host cv2
    I420 round trip: with a bit-exact device kernel both runners see
    identical uint8 network inputs, so the flows must match."""
    model = StubFlow()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6)))["params"]
    kw = dict(preset="rgb_unit", flow_scale=2.0, batch=3)
    r_i420 = VideoFlowRunner(model, params, upload="i420", **kw)
    r_bgr = VideoFlowRunner(model, params, upload="bgr", **kw)

    frames = _frames(5, 96, 130, seed=2)  # pads to 128x192 (even, /64)

    def roundtrip(f_bgr):
        # the i420 runner converts the UNPADDED (even-dim) frame and
        # edge-pads to /64 on device; the bgr runner edge-pads on host —
        # identical network input when fed the round-tripped frame
        rgb = np.ascontiguousarray(f_bgr[..., ::-1])
        back = cv2.cvtColor(
            cv2.cvtColor(rgb, cv2.COLOR_RGB2YUV_I420),
            cv2.COLOR_YUV2BGR_I420)[..., ::-1]  # back to RGB
        return np.ascontiguousarray(back[..., ::-1])  # original-size BGR

    a = [q for _, _, q in r_i420.run(iter(frames))]
    b = [q for _, _, q in r_bgr.run(iter(roundtrip(f) for f in frames))]
    assert len(a) == len(b) == 4
    for qa, qb in zip(a, b):
        np.testing.assert_allclose(qa, qb, atol=1e-5, rtol=1e-5)
    # and the mode actually changed the upload layout: planar (H*3/2, W)
    assert r_i420.upload == "i420"


def test_i420_flow_close_to_bgr_flow_on_video_like_content():
    """On smooth (video-like) content the chroma subsample perturbs the
    flow only marginally — the approximation users actually sign up for."""
    model = StubFlow()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6)))["params"]
    kw = dict(preset="rgb_unit", flow_scale=2.0, batch=3)
    frames = _frames(4, 64, 64, seed=3)
    a = [q for _, _, q in
         VideoFlowRunner(model, params, upload="i420", **kw).run(iter(frames))]
    b = [q for _, _, q in
         VideoFlowRunner(model, params, upload="bgr", **kw).run(iter(frames))]
    for qa, qb in zip(a, b):
        # StubFlow is a conv of the inputs; uint8 deltas of a couple LSB
        # stay small through it
        assert np.abs(qa - qb).max() < 0.2


def test_invalid_upload_mode_rejected():
    model = StubFlow()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6)))["params"]
    with pytest.raises(ValueError, match="upload"):
        VideoFlowRunner(model, params, upload="nv12")
