"""Dataset + loader tests on synthetic fixtures."""

import os
import time

import numpy as np
import pytest

from opticalflow_tpu.data.datasets import (KittiFlowTrain, KittiPairsEval,
                                           SintelPairs)
from opticalflow_tpu.data.loader import Loader
from opticalflow_tpu.data import augment as aug
from opticalflow_tpu.io.flo import write_flo
from opticalflow_tpu.io.kitti import write_flow_png


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("kitti")
    (root / "image_2").mkdir()
    (root / "flow_occ").mkdir()
    rng = np.random.RandomState(0)
    for i in range(5):
        im = (rng.rand(120, 300, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / "image_2" / f"{i:06d}.png"), im)
        if i < 4:
            flow = rng.randn(120, 300, 2).astype(np.float32)
            write_flow_png(str(root / "flow_occ" / f"{i:06d}.png"), flow,
                           np.ones((120, 300), bool))
    return str(root)


def test_kitti_train_dataset(kitti_root):
    ds = KittiFlowTrain(kitti_root, crop_hw=(96, 224), seed=1)
    assert len(ds) == 4  # temporal neighbors with GT
    s = ds.get(0, epoch=0)
    assert s["images"].shape == (96, 224, 6)
    assert s["flow"].shape == (96, 224, 2)
    assert s["valid"].shape == (96, 224)
    assert 0.0 <= s["images"].min() and s["images"].max() <= 1.0
    # deterministic per (seed, epoch, idx)
    s2 = ds.get(0, epoch=0)
    np.testing.assert_array_equal(s["images"], s2["images"])
    s3 = ds.get(0, epoch=1)
    assert not np.array_equal(s["images"], s3["images"])


def test_kitti_train_upsizes_small_frames(kitti_root):
    ds = KittiFlowTrain(kitti_root, crop_hw=(320, 896), augment=False, seed=0)
    s = ds.get(0, epoch=0)  # 120x300 frames must be upsized to fit the crop
    assert s["images"].shape == (320, 896, 6)


def test_loader_batching_and_resume(kitti_root):
    ds = KittiFlowTrain(kitti_root, crop_hw=(64, 128), seed=2)
    loader = Loader(ds, batch_size=2, num_workers=2, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (2, 64, 128, 6)
    assert loader.epoch == 1

    # resume mid-epoch: restoring {epoch:5, batch:1} yields epoch 5's 2nd batch
    l2 = Loader(ds, batch_size=2, num_workers=1, seed=3)
    l2.epoch = 5
    full = list(l2)
    l3 = Loader(ds, batch_size=2, num_workers=1, seed=3)
    l3.restore({"epoch": 5, "batch": 1, "seed": 3})
    it = iter(l3)
    first = next(it)
    # state() reports the ABSOLUTE epoch position after a mid-epoch
    # restore (restored offset + consumed), not the consumed count alone —
    # a checkpoint written here must NOT replay batches 1..offset
    assert l3.state() == {"epoch": 5, "batch": 2, "seed": 3}
    rest = [first] + list(it)
    assert len(rest) == 1
    np.testing.assert_array_equal(rest[0]["images"], full[1]["images"])
    assert l3.state() == {"epoch": 6, "batch": 0, "seed": 3}


def test_consecutive_frames_video_cached_capture(tmp_path):
    """ConsecutiveFrames on a video must decode correct frames through the
    cached-capture path (review finding: the old code opened + seeked the
    container for EVERY read) — sequential pairs, the (i,i+1)/(i+1,i+2)
    overlap served from cache, and out-of-order access all agree with a
    fresh per-frame decode."""
    cv2 = pytest.importorskip("cv2")
    from opticalflow_tpu.data.datasets import ConsecutiveFrames

    # frames with distinct, compression-robust solid colors
    path = str(tmp_path / "v.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    levels = [0, 60, 120, 180, 240]
    for lv in levels:
        wr.write(np.full((64, 64, 3), lv, np.uint8))
    wr.release()

    ds = ConsecutiveFrames(path, size_hw=(64, 64), preset="rgb_unit")
    assert len(ds) == 4

    def mean_of(k):
        return float(ds._read(k).mean())

    # out-of-order first (forces a seek), then sequential (seek-free)
    got = [mean_of(k) for k in (3, 0, 1, 2, 1, 4)]
    want = [levels[k] for k in (3, 0, 1, 2, 1, 4)]
    assert np.allclose(got, want, atol=12), (got, want)  # codec tolerance
    # the overlap read (second 1) must hit the cache
    assert 1 in ds._cache and 4 in ds._cache
    # __getitem__ end-to-end: pair (i, i+1) preprocessed
    s = ds[2]
    assert s["images"].shape[-3:] == (64, 64, 6)


def test_kitti_eval_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    base = tmp_path / "training"
    (base / "image_2").mkdir(parents=True)
    (base / "flow_occ").mkdir()
    rng = np.random.RandomState(1)
    for i in range(2):
        for suf in ("_10", "_11"):
            cv2.imwrite(str(base / "image_2" / f"{i:06d}{suf}.png"),
                        (rng.rand(80, 160, 3) * 255).astype(np.uint8))
        write_flow_png(str(base / "flow_occ" / f"{i:06d}_10.png"),
                       rng.randn(80, 160, 2).astype(np.float32),
                       np.ones((80, 160), bool))
    ds = KittiPairsEval(str(tmp_path), year=2015)
    assert len(ds) == 2
    s = ds[0]
    assert s["im1"].shape == (80, 160, 3)
    assert s["flow"].shape == (80, 160, 2)
    assert s["valid"].dtype == bool


def test_sintel_dataset(tmp_path):
    import imageio.v2 as imageio
    rng = np.random.RandomState(2)
    seq = tmp_path / "training" / "clean" / "alley_1"
    seq.mkdir(parents=True)
    fseq = tmp_path / "training" / "flow" / "alley_1"
    fseq.mkdir(parents=True)
    for i in range(1, 4):
        imageio.imwrite(str(seq / f"frame_{i:04d}.png"),
                        (rng.rand(64, 96, 3) * 255).astype(np.uint8))
    for i in range(1, 3):
        write_flo(str(fseq / f"frame_{i:04d}.flo"),
                  rng.randn(64, 96, 2).astype(np.float32))
    ds = SintelPairs(str(tmp_path), render="clean")
    assert len(ds) == 2
    assert ds[0]["flow"].shape == (64, 96, 2)
    assert ds[0]["stem"] == "alley_1/frame_0001"


def test_hflip_negates_u():
    rng = np.random.RandomState(3)
    im1 = rng.rand(8, 8, 3); im2 = rng.rand(8, 8, 3)
    flow = rng.randn(8, 8, 2).astype(np.float32)
    valid = np.ones((8, 8), bool)
    f1, f2, fl, v = aug.hflip(im1, im2, flow.copy(), valid)
    np.testing.assert_allclose(fl[..., 0], -flow[:, ::-1, 0])
    np.testing.assert_allclose(fl[..., 1], flow[:, ::-1, 1])


def test_reduced_affine_transforms_vectors():
    """A pure-rotation affine must rotate flow vectors by the linear part."""
    cv2 = pytest.importorskip("cv2")
    h = w = 64
    m, a = aug.affine_matrix((w / 2, h / 2), 30.0, 1.0, 1.0)
    flow = np.tile(np.array([1.0, 0.0], np.float32), (h, w, 1))
    fu = cv2.warpAffine(flow[..., 0], m, (w, h), flags=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT_101)
    fv = cv2.warpAffine(flow[..., 1], m, (w, h), flags=cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REFLECT_101)
    rotated = np.stack([a[0, 0] * fu + a[0, 1] * fv,
                        a[1, 0] * fu + a[1, 1] * fv], axis=-1)
    c, s = np.cos(np.deg2rad(30)), np.sin(np.deg2rad(30))
    np.testing.assert_allclose(rotated[32, 32], [c, s], atol=1e-5)


def test_loader_propagates_producer_errors():
    """A fetch/collate/device_put fault in the prefetch thread must raise
    in the consumer, not strand it on q.get() forever (found via a
    non-divisible sharded batch hanging the training CLI)."""
    from opticalflow_tpu.data.loader import Loader

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise RuntimeError("fetch exploded")
            import numpy as np
            return {"images": np.zeros((8, 8, 6), np.float32)}

    loader = Loader(Boom(), batch_size=2, num_workers=1, shuffle=False,
                    device_put=False)
    with pytest.raises(RuntimeError, match="fetch exploded"):
        for _ in loader:
            pass


def test_loader_abandoned_iterator_unblocks_producer():
    """Breaking out of iteration must not leave the producer thread
    blocked on a full queue forever."""
    import threading

    from opticalflow_tpu.data.loader import Loader

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            import numpy as np
            return {"images": np.zeros((4, 4, 6), np.float32)}

    n0 = threading.active_count()
    loader = Loader(DS(), batch_size=2, num_workers=1, shuffle=False,
                    device_put=False, prefetch=1)
    for _ in loader:
        break  # abandon with the queue full (producer mid-batches)
    deadline = time.time() + 10
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "producer thread leaked"

    class Tiny(DS):
        def __len__(self):
            return 4  # 2 batches: after one consume the producer has
                      # queued everything and blocks on the final put(None)

    # abandon when the producer has ALREADY queued everything and is
    # blocked on the end-of-data sentinel — that put must be stop-aware too
    loader = Loader(Tiny(), batch_size=2, num_workers=1, shuffle=False,
                    device_put=False, prefetch=1)
    it = iter(loader)
    next(it)
    time.sleep(0.3)   # let the producer fill the queue and hit put(None)
    it.close()
    deadline = time.time() + 10
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n0, "sentinel put stranded producer"
