"""Automated end-to-end drives of every user-facing CLI.

Each test calls the CLI's ``main()`` in-process (conftest pins the 8-device
CPU backend) on tiny synthetic inputs with the deterministic fake torch
checkpoint the verify recipe uses — turning the round-2 manual TPU drive
logs (COMPONENTS.md) into regression tests.  Reference counterparts:
``script_pwc.py``, ``pwc_extract_flow.py``, ``pwc_extract_flow_video.py``,
``inference_kitti.py``, ``inference.py``, ``pth2onnx.py``,
``capture_frame.py``.
"""

import os

import numpy as np
import pytest
import torch

from opticalflow_tpu.io.flo import read_flo

H, W = 70, 90  # non-/64 on purpose: exercises the resize/pad preprocessing


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """Reference-format .pth.tar with deterministic weights (the verify
    recipe's fake checkpoint: OraclePWC, seed 0, x0.5)."""
    from oracles.torch_pwcnet import OraclePWC

    torch.manual_seed(0)
    net = OraclePWC(variant="new")
    for p in net.parameters():
        p.data *= 0.5
    sd = net.state_dict_flat()
    path = tmp_path_factory.mktemp("ckpt") / "fake_pwc.pth.tar"
    torch.save({"state_dict": {f"module.{k}": v for k, v in sd.items()}},
               str(path))
    return str(path)


@pytest.fixture(scope="module")
def image_pair(tmp_path_factory):
    import cv2

    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("imgs")
    paths = []
    base = (rng.rand(H + 8, W + 8, 3) * 255).astype(np.uint8)
    for i, (dy, dx) in enumerate(((0, 0), (2, 3))):
        p = str(d / f"im{i + 1}.png")
        cv2.imwrite(p, base[dy:dy + H, dx:dx + W])
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    import cv2

    rng = np.random.RandomState(1)
    path = str(tmp_path_factory.mktemp("clip") / "clip.mp4")
    big = cv2.GaussianBlur((rng.rand(96, 128, 3) * 255).astype(np.uint8),
                           (0, 0), 2)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (90, 66))
    for t in range(6):
        wr.write(big[t:t + 66, 2 * t:2 * t + 90])
    wr.release()
    return path


@pytest.mark.slow
def test_script_pwc_cli(ckpt, image_pair, tmp_path):
    from opticalflow_tpu.cli.script_pwc import main

    out = str(tmp_path / "pair.flo")
    rc = main([*image_pair, out, "--ckpt", ckpt, "--size-mode", "resize"])
    assert rc == 0
    flow = read_flo(out)
    assert flow.shape == (H, W, 2) and np.isfinite(flow).all()


@pytest.mark.slow
def test_extract_flow_cli(ckpt, image_pair, tmp_path):
    from opticalflow_tpu.cli.extract_flow import main

    out = str(tmp_path / "fl")
    rc = main([*image_pair, "--out-dir", out, "--ckpt", ckpt])
    assert rc == 0
    names = os.listdir(out)
    for suffix in (".npy", ".flo"):
        assert any(n.endswith(suffix) for n in names), names
    assert sum(n.endswith(".png") for n in names) >= 2, names  # wheel+quiver


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["arrows", "color", "compare", "vanish",
                                  "topview"])
def test_extract_video_cli(ckpt, clip, tmp_path, mode):
    import cv2

    from opticalflow_tpu.cli.extract_video import main

    out = str(tmp_path / f"overlay_{mode}.mp4")
    rc = main([clip, out, "--ckpt", ckpt, "--mode", mode, "--batch", "2"])
    assert rc == 0
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n >= 4, n  # 5 consecutive pairs, minus any encoder slack


@pytest.mark.slow
def test_infer_kitti_cli(ckpt, tmp_path, capsys):
    import cv2

    from opticalflow_tpu.cli.infer_kitti import main
    from opticalflow_tpu.io.kitti import write_flow_png

    rng = np.random.RandomState(2)
    img = tmp_path / "training" / "image_2"
    occ = tmp_path / "training" / "flow_occ"
    img.mkdir(parents=True)
    occ.mkdir(parents=True)
    for i in range(2):
        for tag in ("10", "11"):
            cv2.imwrite(str(img / f"{i:06d}_{tag}.png"),
                        (rng.rand(H, W, 3) * 255).astype(np.uint8))
        write_flow_png(str(occ / f"{i:06d}_10.png"),
                       rng.randn(H, W, 2).astype(np.float32),
                       valid=np.ones((H, W)))

    rc = main(["--root", str(tmp_path), "--ckpt", ckpt, "--batch", "2",
               "--save-dir", str(tmp_path / "pred")])
    assert rc == 0
    assert "epe" in capsys.readouterr().out.lower()
    assert len(os.listdir(tmp_path / "pred")) == 2


@pytest.mark.slow
def test_eval_sintel_cli(ckpt, tmp_path, capsys):
    import cv2

    from opticalflow_tpu.cli.eval_sintel import main
    from opticalflow_tpu.io.flo import write_flo

    rng = np.random.RandomState(3)
    img = tmp_path / "training" / "clean" / "seq_1"
    flo = tmp_path / "training" / "flow" / "seq_1"
    img.mkdir(parents=True)
    flo.mkdir(parents=True)
    for t in range(1, 4):
        cv2.imwrite(str(img / f"frame_{t:04d}.png"),
                    (rng.rand(H, W, 3) * 255).astype(np.uint8))
    for t in range(1, 3):
        write_flo(str(flo / f"frame_{t:04d}.flo"),
                  rng.randn(H, W, 2).astype(np.float32))

    rc = main(["--root", str(tmp_path), "--ckpt", ckpt, "--batch", "2"])
    assert rc == 0
    assert "epe" in capsys.readouterr().out.lower()


def test_convert_ckpt_cli_roundtrip(ckpt, tmp_path):
    from opticalflow_tpu.cli.convert_ckpt import main
    from opticalflow_tpu.train.checkpoints import load_params

    orbax_dir = str(tmp_path / "orbax")
    assert main([ckpt, orbax_dir]) == 0
    back = str(tmp_path / "back.pth.tar")
    assert main([orbax_dir, back, "--to-torch"]) == 0

    a = load_params(ckpt, variant="new")
    b = load_params(back, variant="new")
    leaves_a, leaves_b = (np.concatenate([np.ravel(x) for x in
                                          __import__("jax").tree.leaves(t)])
                          for t in (a, b))
    np.testing.assert_allclose(leaves_a, leaves_b, rtol=0, atol=0)


def test_capture_frame_cli(clip, tmp_path):
    from opticalflow_tpu.cli.capture_frame import main

    out = str(tmp_path / "frame.png")
    rc = main([clip, "3", out])
    assert rc == 0
    assert os.path.isfile(out)


@pytest.mark.slow
def test_parity_cli(ckpt, tmp_path, capsys):
    from opticalflow_tpu.cli.parity import main

    artifact = str(tmp_path / "model.stablehlo")
    report = str(tmp_path / "report.png")
    rc = main(["--ckpt", ckpt, "--artifact", artifact,
               "--shape", "1", "64", "64", "--report-image", report])
    assert rc == 0
    assert "PARITY: PASS" in capsys.readouterr().out
    assert os.path.isfile(artifact) and os.path.isfile(report)


@pytest.mark.parametrize("cli", ("eval_sintel", "infer_kitti"))
def test_eval_cli_bad_parallel_specs_exit_cleanly(cli):
    # ADVICE r4: bad --data-parallel specs and the --data-parallel ×
    # --dispatch-chunk combination must exit with a message, not a traceback.
    # The mesh checks run before checkpoint load, so a dummy ckpt suffices.
    import importlib
    main = importlib.import_module(f"opticalflow_tpu.cli.{cli}").main
    base = ["--root", "/nonexistent", "--ckpt", "/nonexistent.pth.tar"]
    for extra in (["--data-parallel", "foo"],
                  ["--data-parallel", "0"],
                  ["--data-parallel", "all", "--dispatch-chunk", "8"]):
        with pytest.raises(SystemExit) as ei:
            main(base + extra)
        assert not isinstance(ei.value.code, int) or ei.value.code != 0


def test_serve_cli_parser():
    # the serving pipeline itself (dispatcher + HTTP) is covered end-to-end
    # in tests/test_serve.py; here: the CLI contract parses
    from opticalflow_tpu.cli.serve import build_parser
    a = build_parser().parse_args(["--ckpt", "x.pth.tar", "--port", "0",
                                   "--max-batch", "4", "--warmup", "436x1024"])
    assert (a.max_batch, a.port, a.warmup) == (4, 0, "436x1024")
    assert a.dtype == "bfloat16"  # serving defaults to the fast path
    assert a.bucket_sizes == "auto"  # lone requests ride the B=1 program


def test_serve_cli_bad_bucket_sizes_exit_cleanly():
    """Malformed --bucket-sizes specs must exit with a message before any
    checkpoint load or compile, not surface as a traceback."""
    from opticalflow_tpu.cli.serve import main
    base = ["--ckpt", "/nonexistent.pth.tar", "--port", "0"]
    for spec in ("banana,1", "1,banana"):
        with pytest.raises(SystemExit) as ei:
            main(base + ["--bucket-sizes", spec])
        assert "bucket-sizes" in str(ei.value.code)
