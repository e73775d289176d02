"""End-to-end drive of the unified training CLI on synthetic KITTI data.

Covers the full ``cli/train.py`` path — dataset discovery, prefetch loader
with sharded device_put, jitted sharded train step, JSONL metrics, Orbax
checkpoint, loss-curve PNG — the way the reference's ``train2.py`` would be
smoke-run (the reference has no tests at all, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


def _synth_kitti(root, n_images=9, h=96, w=128, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "image_2")
    flow_dir = os.path.join(root, "flow_occ")
    os.makedirs(img_dir)
    os.makedirs(flow_dir)
    from opticalflow_tpu.io.kitti import write_flow_png

    for i in range(n_images):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}_10.png"), img)
        if i < n_images - 1:  # temporal pair (i, i+1) labelled by stem i
            flow = rng.randn(h, w, 2).astype(np.float32) * 2.0
            write_flow_png(os.path.join(flow_dir, f"{i:06d}_10.png"), flow,
                           valid=np.ones((h, w)))


@pytest.mark.slow
def test_train_cli_one_epoch(tmp_path):
    from opticalflow_tpu.cli.train import main

    root = str(tmp_path / "kitti")
    out = str(tmp_path / "run")
    os.makedirs(root)
    _synth_kitti(root, n_images=12)  # 11 pairs: val split ragged vs 8 devices

    rc = main(["--regime", "multiscale", "--data-root", root,
               "--out-dir", out, "--epochs", "1", "--batch", "8",
               "--crop", "64", "64", "--workers", "2", "--log-every", "1",
               "--seed", "0", "--val-frac", "0.2", "--tensorboard"])
    assert rc == 0

    with open(os.path.join(out, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert recs and all(np.isfinite(r["loss"]) for r in recs if "loss" in r)
    # the val split (2 samples) is not divisible by the 8-device mesh:
    # the ragged batch must run single-device, not crash the epoch
    assert any("val" in r for r in recs), recs

    ckpts = [n for n in os.listdir(out) if n.startswith("step_")
             and os.path.isdir(os.path.join(out, n))]
    assert ckpts, os.listdir(out)
    assert os.path.isfile(os.path.join(out, "loss_curve.png"))

    # --tensorboard: train/epoch/val scalars land in an events file.
    # tensorboardX is an optional extra (pyproject `tensorboard`, not
    # `test`): without it the CLI degrades to JSONL-only with a warning,
    # so the tb assertions are gated rather than failing on listdir.
    import importlib.util
    if importlib.util.find_spec("tensorboardX") is not None:
        tb_dir = os.path.join(out, "tb")
        events = [n for n in os.listdir(tb_dir) if "tfevents" in n]
        assert events, os.listdir(tb_dir)
        assert os.path.getsize(os.path.join(tb_dir, events[0])) > 0


@pytest.mark.slow
def test_train_cli_preemption_saves_and_resumes(tmp_path):
    """SIGTERM mid-epoch must save a resumable checkpoint (with the loader
    position) and exit 0; --resume must re-enter the SAME epoch at the
    saved batch so no step is lost or repeated (managed TPU slices get a
    SIGTERM + grace window before eviction)."""
    import signal
    import threading
    import time

    from opticalflow_tpu.cli.train import main

    root = str(tmp_path / "kitti")
    out = str(tmp_path / "run")
    os.makedirs(root)
    _synth_kitti(root, n_images=65)  # 64 pairs -> 8 batches/epoch at B=8

    argv = ["--regime", "multiscale", "--data-root", root,
            "--out-dir", out, "--epochs", "2", "--batch", "8",
            "--crop", "64", "64", "--workers", "2", "--log-every", "1",
            "--seed", "0", "--save-every", "100"]

    log = os.path.join(out, "metrics.jsonl")

    def preempt_after_first_step():
        for _ in range(12000):  # <= 10 min: first step waits on compile
            try:
                if os.path.getsize(log) > 0:
                    os.kill(os.getpid(), signal.SIGTERM)
                    return
            except OSError:
                pass
            time.sleep(0.05)

    t = threading.Thread(target=preempt_after_first_step, daemon=True)
    t.start()
    try:
        assert main(argv) == 0
        t.join(timeout=60)

        steps = [json.loads(l)["step"] for l in open(log) if "step" in l]
        assert steps, "no steps ran before preemption"
        preempted_at = max(steps)
        assert preempted_at < 16, "preemption raced past the whole run"

        ckpts = sorted(n for n in os.listdir(out) if n.startswith("step_"))
        assert ckpts, os.listdir(out)

        # resume: must continue, not restart -- final step count is exactly
        # epochs * batches_per_epoch (a restarted epoch would overshoot)
        assert main(argv + ["--resume"]) == 0
        steps = [json.loads(l)["step"] for l in open(log) if "step" in l]
        assert max(steps) == 16, (preempted_at, sorted(set(steps)))
        assert sorted(set(steps)) == list(range(1, 17)), "steps lost/repeated"
        assert os.path.isfile(os.path.join(out, "loss_curve.png"))

        # exact-resume determinism: the preempted+resumed trajectory must be
        # BIT-IDENTICAL to an uninterrupted run (deterministic loader order,
        # per-(seed, epoch) augmentation, saved opt state) — jit caches are
        # warm in-process, so this is cheap
        from opticalflow_tpu.train import checkpoints as ckpt
        import jax
        out2 = str(tmp_path / "run_uninterrupted")
        argv2 = [a if a != out else out2 for a in argv]
        assert main(argv2) == 0
        a = ckpt.restore_train_state(os.path.join(out, "step_16"))
        b = ckpt.restore_train_state(os.path.join(out2, "step_16"))
        pa = jax.tree_util.tree_leaves_with_path(a["params"])
        lb = jax.tree.leaves(b["params"])
        assert len(pa) == len(lb)
        mism = [jax.tree_util.keystr(p) for (p, x), y in zip(pa, lb)
                if not np.array_equal(np.asarray(x), np.asarray(y))]
        assert not mism, f"resume diverged from uninterrupted run: {mism[:3]}"
    finally:
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
