"""Evaluation runner semantics with a stub engine (no network)."""

import numpy as np
import pytest

from opticalflow_tpu.evaluate import evaluate_pairs


class StubEngine:
    """Returns a constant flow; records calls."""

    def __init__(self, flow_uv=(2.0, -1.0)):
        self.flow_uv = flow_uv
        self.calls = []

    def flow_from_pair(self, im1, im2, preset="bgr_unit", size_mode="pad"):
        self.calls.append((im1.shape, preset, size_mode))
        h, w = im1.shape[:2]
        return np.tile(np.asarray(self.flow_uv, np.float32), (h, w, 1))


class StubDataset:
    def __init__(self, n=3, with_gt=True):
        rng = np.random.RandomState(0)
        self.samples = []
        for i in range(n):
            s = {"im1": (rng.rand(40, 60, 3) * 255).astype(np.uint8),
                 "im2": (rng.rand(40, 60, 3) * 255).astype(np.uint8),
                 "stem": f"s{i}"}
            if with_gt:
                s["flow"] = np.tile(np.array([2.0, -1.0], np.float32),
                                    (40, 60, 1))
                s["valid"] = np.ones((40, 60), bool)
            self.samples.append(s)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_perfect_prediction_scores_zero():
    eng = StubEngine()
    res = evaluate_pairs(eng, StubDataset(), verbose=False)
    assert res["epe"] == pytest.approx(0.0)
    assert res["fl_all"] == pytest.approx(0.0)
    assert res["num_pairs"] == 3
    assert all(c[2] == "pad" for c in eng.calls)


def test_wrong_prediction_scores_epe():
    eng = StubEngine(flow_uv=(5.0, 3.0))  # off by (3, 4) -> EPE 5
    res = evaluate_pairs(eng, StubDataset(), verbose=False)
    assert res["epe"] == pytest.approx(5.0)
    assert res["fl_all"] == pytest.approx(100.0)


def test_limit_and_size_mode_and_save(tmp_path):
    pytest.importorskip("cv2")
    eng = StubEngine()
    res = evaluate_pairs(eng, StubDataset(), size_mode="resize", limit=2,
                         save_dir=str(tmp_path), verbose=False)
    assert res["num_pairs"] == 2
    assert all(c[2] == "resize" for c in eng.calls)
    assert sorted(p.name for p in tmp_path.iterdir()) == ["s0.png", "s1.png"]


def test_save_format_flo(tmp_path):
    from opticalflow_tpu.io.flo import read_flo
    eng = StubEngine()
    evaluate_pairs(eng, StubDataset(1), save_dir=str(tmp_path),
                   save_format="flo", verbose=False)
    flow = read_flo(str(tmp_path / "s0.flo"))
    assert flow.shape == (40, 60, 2)
    np.testing.assert_allclose(flow[0, 0], [2.0, -1.0])


def test_no_gt_dataset_gives_nan():
    eng = StubEngine()
    res = evaluate_pairs(eng, StubDataset(with_gt=False), verbose=False)
    assert np.isnan(res["epe"])
