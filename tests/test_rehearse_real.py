"""Dry-run the real-data rehearsal harness on a synthetic fixture tree.

``scripts/rehearse_real.py`` is the one command a real-data host runs to
close the north star (EPE delta ≤0.01 vs ``pwc_net.pth.tar`` + published
Sintel averages).  No real data exists here, so this test proves the
harness itself: a miniature Sintel tree + the deterministic fake
checkpoint must drive import → oracle canonical-pair delta → clean/final
eval → KITTI eval end-to-end, with the fidelity gates PASSING (both
stacks run the same fake weights, so the delta gate is exercised for
real) and the published-EPE rows reported as info.
"""

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

H, W = 68, 94  # non-/64: the resize path must actually resize


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """{ckpt, sintel, kitti}: fake weights + miniature dataset trees."""
    import cv2

    from oracles.torch_pwcnet import OraclePWC
    from opticalflow_tpu.io.flo import write_flo
    from opticalflow_tpu.io.kitti import write_flow_png

    root = tmp_path_factory.mktemp("rehearse")
    torch.manual_seed(0)
    net = OraclePWC(variant="new")
    for p in net.parameters():
        p.data *= 0.5
    ckpt = root / "fake_pwc.pth.tar"
    torch.save({"state_dict": {f"module.{k}": v
                               for k, v in net.state_dict_flat().items()}},
               str(ckpt))

    rng = np.random.RandomState(0)
    base = cv2.GaussianBlur((rng.rand(H + 8, W + 8, 3) * 255)
                            .astype(np.uint8), (0, 0), 2)
    sintel = root / "sintel"
    for render in ("clean", "final"):
        img = sintel / "training" / render / "seq_1"
        img.mkdir(parents=True)
        for t, (dy, dx) in enumerate(((0, 0), (2, 3), (4, 5))):
            cv2.imwrite(str(img / f"frame_{t + 10:04d}.png"),
                        base[dy:dy + H, dx:dx + W])
    flo = sintel / "training" / "flow" / "seq_1"
    flo.mkdir(parents=True)
    for t in (10, 11):
        write_flo(str(flo / f"frame_{t:04d}.flo"),
                  rng.randn(H, W, 2).astype(np.float32))

    kitti = root / "kitti"
    img = kitti / "training" / "image_2"
    occ = kitti / "training" / "flow_occ"
    img.mkdir(parents=True)
    occ.mkdir(parents=True)
    for i in range(2):
        for tag in ("10", "11"):
            cv2.imwrite(str(img / f"{i:06d}_{tag}.png"),
                        (rng.rand(H, W, 3) * 255).astype(np.uint8))
        write_flow_png(str(occ / f"{i:06d}_10.png"),
                       rng.randn(H, W, 2).astype(np.float32),
                       valid=np.ones((H, W)))
    return {"ckpt": str(ckpt), "sintel": str(sintel), "kitti": str(kitti)}


@pytest.mark.slow
def test_rehearsal_runs_end_to_end(tree, capsys):
    import rehearse_real

    rc = rehearse_real.main(["--ckpt", tree["ckpt"],
                             "--sintel-root", tree["sintel"],
                             "--kitti-root", tree["kitti"],
                             "--batch", "2", "--limit", "2"])
    out = capsys.readouterr().out
    # fidelity gates pass (both stacks ran the same fake weights)
    assert rc == 0, out
    assert "[PASS] checkpoint import" in out
    assert "[PASS] EPE delta vs reference pipeline" in out
    # published-EPE rows are informational without --expect-published
    assert "[info] Sintel clean EPE" in out
    assert "[info] Sintel final EPE" in out
    assert "[info] KITTI2015 EPE / Fl-all" in out


@pytest.mark.slow
def test_rehearsal_expect_published_fails_on_fake_weights(tree, capsys):
    import rehearse_real

    rc = rehearse_real.main(["--ckpt", tree["ckpt"],
                             "--sintel-root", tree["sintel"],
                             "--renders", "clean",
                             "--batch", "2", "--limit", "2",
                             "--expect-published", "--skip-oracle"])
    out = capsys.readouterr().out
    assert rc == 1  # fake weights cannot hit the published 1.83
    assert "[FAIL] Sintel clean EPE" in out


def test_rehearsal_bad_ckpt_fails_cleanly(tmp_path, capsys):
    import rehearse_real

    bad = tmp_path / "bad.pth.tar"
    bad.write_bytes(b"not a checkpoint")
    rc = rehearse_real.main(["--ckpt", str(bad)])
    assert rc == 1
    assert "[FAIL] checkpoint import" in capsys.readouterr().out
