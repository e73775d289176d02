"""Video runner logic (pairing, batching, padding) with a stub model."""

import numpy as np
import pytest

import jax.numpy as jnp
import flax.linen as nn

from opticalflow_tpu.video import VideoFlowRunner


class StubFlow(nn.Module):
    """Quarter-res 'flow' = mean of each input's channels (deterministic,
    shape-correct stand-in for PWCDCNet)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        gain = self.param("gain", nn.initializers.ones, ())
        pooled = nn.avg_pool(x, (4, 4), (4, 4))
        u = jnp.mean(pooled[..., :3], axis=-1, keepdims=True)
        v = jnp.mean(pooled[..., 3:], axis=-1, keepdims=True)
        return jnp.concatenate([u, v], axis=-1) * gain


def _frames(n, h=96, w=130, seed=0):
    rng = np.random.RandomState(seed)
    return [(rng.rand(h, w, 3) * 255).astype(np.uint8) for _ in range(n)]


@pytest.fixture(scope="module")
def runner():
    model = StubFlow()
    import jax
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6)))["params"]
    return VideoFlowRunner(model, params, preset="rgb_unit",
                           flow_scale=2.0, batch=3, depth=1)


def test_pairing_and_counts(runner):
    frames = _frames(8)
    outs = list(runner.run(iter(frames)))
    assert len(outs) == 7  # n-1 consecutive pairs
    # each yield carries BOTH original (BGR) frames of its pair
    np.testing.assert_array_equal(outs[0][0], frames[0])
    np.testing.assert_array_equal(outs[0][1], frames[1])
    np.testing.assert_array_equal(outs[-1][0], frames[6])
    np.testing.assert_array_equal(outs[-1][1], frames[7])


def test_quarter_res_and_padding(runner):
    frames = _frames(4, h=96, w=130)  # padded to 128 x 192
    outs = list(runner.run(iter(frames)))
    for _, _, q in outs:
        assert q.shape == (128 // 4, 192 // 4, 2)
        assert np.isfinite(q).all()


def test_partial_batch_values_match_full(runner):
    """Values must not depend on how pairs fall into batches (the padded
    final batch must be cropped correctly)."""
    frames = _frames(5, seed=3)  # 4 pairs = batch(3) + partial(1)
    outs_a = [q for _, _, q in runner.run(iter(frames))]
    # same pairs, streamed again
    outs_b = [q for _, _, q in runner.run(iter(frames))]
    assert len(outs_a) == 4
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_equal(a, b)


def test_mesh_sharded_runner_matches():
    import jax
    from opticalflow_tpu.parallel import mesh as meshlib
    model = StubFlow()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 6)))["params"]
    mesh = meshlib.make_mesh(jax.devices()[:4])
    r_mesh = VideoFlowRunner(model, params, preset="rgb_unit",
                             flow_scale=2.0, batch=4, mesh=mesh)
    r_solo = VideoFlowRunner(model, params, preset="rgb_unit",
                             flow_scale=2.0, batch=4)
    frames = _frames(6, h=64, w=64, seed=5)
    a = [q for _, _, q in r_mesh.run(iter(frames))]
    b = [q for _, _, q in r_solo.run(iter(frames))]
    assert len(a) == len(b) == 5
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        VideoFlowRunner(model, params, batch=3, mesh=mesh)


def test_each_frame_uploaded_once(runner):
    """The device step receives (B+1, H, W, 3) frame windows — interior
    frames are NOT duplicated into (B, H, W, 6) pair tensors (2x H2D)."""
    shapes = []
    orig = runner._step

    def spy(params, arr, fh, fw):
        shapes.append(arr.shape)
        return orig(params, arr, fh, fw)

    runner._step = spy
    try:
        list(runner.run(iter(_frames(7))))  # 6 pairs = 2 windows of batch 3
    finally:
        runner._step = orig
    assert shapes == [(4, 128, 192, 3), (4, 128, 192, 3)]


def test_preset_applied(runner):
    """flow_scale and preprocessing reach the output: uniform gray frames
    give u = mean(gray/255) * scale."""
    f = [np.full((64, 64, 3), 128, np.uint8)] * 2
    (_, _, q), = list(runner.run(iter(f)))
    expected = (128 / 255.0) * 2.0
    np.testing.assert_allclose(q[..., 0], expected, atol=1e-5)


def test_async_writer_encoder_error_surfaces_not_deadlocks(tmp_path):
    """If the encoder thread dies mid-stream, write() must raise the error
    instead of blocking forever on the full queue (review finding)."""
    import numpy as np
    import cv2
    from opticalflow_tpu.io.video import AsyncVideoWriter

    wr = AsyncVideoWriter(str(tmp_path / "x.mp4"),
                          cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 16),
                          queue_size=2)

    class _Boom:
        def write(self, frame):
            raise RuntimeError("encoder boom")

        def release(self):
            pass

    wr._wr = _Boom()
    frame = np.zeros((16, 32, 3), np.uint8)
    with pytest.raises(RuntimeError, match="encoder boom"):
        for _ in range(50):  # far beyond queue_size: would deadlock before
            wr.write(frame)
    with pytest.raises(RuntimeError, match="encoder boom"):
        wr.release()
