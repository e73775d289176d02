"""Unified training CLI covering all four reference regimes.

  --regime charbonnier : supervised KITTI fine-tune, full-res masked
                         Charbonnier (``train.py``)
  --regime multiscale  : supervised multiscale loss + AdamW + grad clip
                         (``train2.py``)
  --regime pseudo      : self-supervised proxy-label (SSIM+L1 photometric +
                         smoothness) on consecutive frames (``train_pseudo.py``)
  --regime epipolar    : pseudo + per-sample epipolar inlier masking /
                         optional Sampson penalty (``train_fundamental.py``)

TPU-native: one jitted, state-donating train step; data-parallel over all
chips via a 1-D mesh; Orbax checkpoints with deterministic loader-state
resume; JSONL metrics + loss-curve PNG (the train2 ``plot_metrics``
equivalent).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description="PWC-Net training (TPU)")
    p.add_argument("--regime", default="multiscale",
                   choices=("charbonnier", "multiscale", "pseudo", "epipolar"))
    p.add_argument("--data-root", required=True,
                   help="KITTI training root (supervised) or a frames "
                        "dir/video file (self-supervised)")
    p.add_argument("--list-file", default=None)
    p.add_argument("--out-dir", default="runs/default")
    p.add_argument("--pretrained", default=None,
                   help="torch .pth(.tar) or Orbax checkpoint to start from")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--val-frac", type=float, default=0.0,
                   help="held-out fraction for per-epoch validation "
                        "(best-by-metric checkpointing, train2.py style)")
    p.add_argument("--plateau-factor", type=float, default=0.0,
                   help="ReduceLROnPlateau factor (0 disables; train2 "
                        "used the torch default 0.1)")
    p.add_argument("--plateau-patience", type=int, default=3)
    p.add_argument("--crop", type=int, nargs=2, default=(320, 896))
    p.add_argument("--size", type=int, nargs=2, default=(384, 512),
                   help="frame size for self-supervised regimes")
    p.add_argument("--flow-scale", type=float, default=1.0)
    p.add_argument("--lambda-photo", type=float, default=0.0)
    p.add_argument("--lambda-smooth", type=float, default=0.0)
    p.add_argument("--epi-tau", type=float, default=1.0)
    p.add_argument("--epi-stride", type=int, default=6)
    p.add_argument("--epi-soft-w", type=float, default=0.1)
    p.add_argument("--variant", choices=("new", "old"), default="new")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 network compute (f32 flow heads/optimizer)")
    p.add_argument("--grad-accum", type=int, default=1, metavar="K",
                   help="split each batch into K micro-batches inside the "
                        "jitted step (lax.scan), average grads, one "
                        "optimizer update — K× effective batch at the "
                        "memory of batch/K (the other large-batch knob "
                        "besides --remat)")
    p.add_argument("--remat", nargs="?", const="full", default="off",
                   choices=("off", "full", "l2"),
                   help="rematerialization policy: 'l2' recomputes only the "
                        "L2-resolution groups (largest activations, small "
                        "FLOP cost — PERF.md round-3), 'full' the whole "
                        "forward (~30%% more step FLOPs). Bare --remat = "
                        "full")
    p.add_argument("--distributed", action="store_true",
                   help="initialize the multi-host runtime (TPU pods "
                        "auto-detect; elsewhere give the --dist-* flags). "
                        "--batch is the GLOBAL batch; each host loads and "
                        "feeds its 1/num_processes share")
    p.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                   help="process-0 coordinator address (non-TPU backends)")
    p.add_argument("--dist-num-processes", type=int, default=None)
    p.add_argument("--dist-process-id", type=int, default=None)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--save-every", type=int, default=1, metavar="EPOCHS")
    p.add_argument("--log-every", type=int, default=10, metavar="STEPS")
    p.add_argument("--tensorboard", action="store_true",
                   help="also write train/val scalars as TensorBoard events "
                        "under <out-dir>/tb (the reference installs "
                        "tensorboardX in its Dockerfile:24 but never wires "
                        "it up; JSONL metrics are always written)")
    p.add_argument("--seed", type=int, default=0)
    return p


def _make_dataset(args):
    if args.regime in ("charbonnier", "multiscale"):
        from opticalflow_tpu.data.datasets import KittiFlowTrain
        return KittiFlowTrain(args.data_root, list_file=args.list_file,
                              crop_hw=tuple(args.crop), seed=args.seed)
    from opticalflow_tpu.data.datasets import ConsecutiveFrames
    return ConsecutiveFrames(args.data_root, size_hw=tuple(args.size))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax
    from opticalflow_tpu.parallel import mesh as meshlib

    # Preemption-safe training: managed TPU slices get a SIGTERM + grace
    # window before eviction. Flag it, finish the in-flight step, save a
    # resumable checkpoint (including mid-epoch loader position), exit 0.
    # (No reference counterpart — the reference scripts die and lose the
    # epoch; train.py:120-170.)
    import signal
    import threading
    preempt = threading.Event()
    try:
        signal.signal(signal.SIGTERM, lambda s, f: preempt.set())
    except ValueError:      # not on the main thread (library/test use)
        pass
    if args.distributed or args.dist_coordinator:
        pid, pcount = meshlib.distributed_init(
            args.dist_coordinator, args.dist_num_processes,
            args.dist_process_id)
        print(f"distributed: process {pid}/{pcount}, "
              f"{jax.local_device_count()} local devices")
    import jax.numpy as jnp
    import numpy as np
    from opticalflow_tpu.models.pwcnet import PWCDCNet
    from opticalflow_tpu.train.trainer import (TrainConfig, TrainState,
                                               PlateauController,
                                               create_train_state,
                                               make_eval_metrics_step,
                                               make_train_step)
    from opticalflow_tpu.train import checkpoints as ckpt
    from opticalflow_tpu.data.loader import Loader

    regime_to_loss = {"charbonnier": "charbonnier_full",
                      "multiscale": "multiscale", "pseudo": "proxy",
                      "epipolar": "proxy_epipolar"}
    cfg = TrainConfig(
        loss=regime_to_loss[args.regime],
        optimizer="adam" if args.regime != "multiscale" else "adamw",
        lr=args.lr, weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        plateau_factor=args.plateau_factor,
        plateau_patience=args.plateau_patience,
        lambda_photo=args.lambda_photo, lambda_smooth=args.lambda_smooth,
        epi_soft_weight=args.epi_soft_w if args.regime == "epipolar" else 0.0,
        flow_scale=args.flow_scale,
        remat={"off": False, "full": True, "l2": "l2"}[args.remat],
        grad_accum=args.grad_accum)

    model = PWCDCNet(variant=args.variant,
                     dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
                     precision="fast")
    mesh = meshlib.make_mesh()
    print(f"devices: {jax.device_count()} | mesh: {dict(mesh.shape)} | "
          f"regime: {args.regime}")
    if args.batch % jax.device_count():
        # the global batch shards over the full 'data' axis (all devices,
        # across hosts) — a late make_array/device_put error otherwise
        raise SystemExit(
            f"--batch {args.batch} must be divisible by the device "
            f"count ({jax.device_count()}) for data-parallel sharding")

    params = None
    if args.pretrained:
        params = ckpt.load_params(args.pretrained, variant=args.variant)
    state, tx = create_train_state(model, jax.random.PRNGKey(args.seed), cfg,
                                   params=params)

    ds = _make_dataset(args)
    val_loader = None
    pid, pcount = jax.process_index(), jax.process_count()
    is_main = pid == 0
    if pcount > 1 and args.val_frac > 0:
        raise SystemExit(
            "--val-frac with --distributed is not supported (validation "
            "would need collective batch scheduling); run a separate "
            "single-host eval job over the saved checkpoints")
    if args.val_frac > 0:
        from opticalflow_tpu.data.loader import train_val_split
        ds, val_ds = train_val_split(ds, args.val_frac, seed=args.seed)
        if val_ds is not None:
            # keep every val sample: no shuffling, no drop_last, and a batch
            # no larger than the split itself
            vb = min(args.batch, len(val_ds))
            val_loader = Loader(val_ds, vb, shuffle=False, drop_last=False,
                                num_workers=args.workers, seed=args.seed)
    # multi-host: --batch is global; every process loads a disjoint
    # stride-slice of the dataset, truncated to a common length so all
    # processes run the same number of (collective) steps per epoch
    local_batch = args.batch
    if pcount > 1:
        if args.batch % pcount:
            raise SystemExit(f"--batch {args.batch} not divisible by "
                             f"{pcount} processes")
        local_batch = args.batch // pcount
        from opticalflow_tpu.data.loader import process_shard
        ds = process_shard(ds, pid, pcount)

    # device-put prefetch overlaps H2D with compute; the epipolar regime
    # augments batches on host first, so it stays on numpy
    prefetch_dev = args.regime != "epipolar"
    loader = Loader(ds, local_batch, num_workers=args.workers,
                    seed=args.seed, device_put=prefetch_dev,
                    sharding=meshlib.batch_sharding(mesh))

    start_epoch = 0
    os.makedirs(args.out_dir, exist_ok=True)
    if args.resume:
        step = ckpt.latest_step(args.out_dir)
        if pcount > 1:
            # Only rank 0 writes checkpoints; every rank restores from its
            # own view of out_dir. On a non-shared filesystem the ranks
            # would silently restore DIFFERENT states (rank 0 trained, the
            # rest fresh) and replicate() would stitch them into one
            # corrupted "replicated" model — fail loudly instead.
            import numpy as _np
            from jax.experimental import multihost_utils
            mine = _np.asarray([-1 if step is None else int(step)])
            every = multihost_utils.process_allgather(mine)
            if len(set(int(v) for v in every.ravel())) != 1:
                raise SystemExit(
                    "--resume sees different checkpoint steps per process "
                    f"({every.ravel().tolist()}): out_dir must be one "
                    "shared filesystem visible to all hosts")
        if step is not None:
            import numpy as _np
            like = {"params": jax.tree.map(_np.asarray, state.params),
                    "opt_state": jax.tree.map(_np.asarray, state.opt_state),
                    "step": _np.asarray(0)}
            restored = ckpt.restore_train_state(args.out_dir, like=like)
            state = TrainState(step=jnp.asarray(restored["step"]),
                               params=restored["params"],
                               opt_state=jax.tree.map(
                                   jnp.asarray,
                                   restored.get("opt_state",
                                                state.opt_state)))
            meta = restored.get("metadata", {})
            # a preemption save is mid-epoch: re-enter the SAME epoch and
            # let the loader skip to the saved batch offset
            start_epoch = int(meta.get("epoch", 0)) \
                + (0 if meta.get("mid_epoch") else 1)
            if "loader" in meta:
                loader.restore(json.loads(meta["loader"]))
            print(f"resumed from step {step} (epoch {start_epoch}"
                  + (f", batch {loader.state()['batch']}"
                     if meta.get("mid_epoch") else "") + ")")

    step_fn = make_train_step(model, tx, cfg, mesh=mesh)
    eval_fn = make_eval_metrics_step(model, cfg, mesh=mesh) if val_loader \
        else None
    eval_fn_single = None      # lazy: compiled only if a ragged batch occurs
    plateau = PlateauController(cfg)
    state = meshlib.replicate(state, mesh)
    log_path = os.path.join(args.out_dir, "metrics.jsonl")
    tb = _open_tensorboard(args, is_main)
    # close (flush) the tb writer on every exit path — normal
    # return, preemption, and loader/step exceptions alike
    try:
        epi_keys = jax.random.split(jax.random.PRNGKey(args.seed + 1), 1 << 16)

        best_metric = float("inf")
        history = []
        for epoch in range(start_epoch, args.epochs):
            loader.epoch = epoch
            # >0 only on a mid-epoch (preemption) resume; __iter__ consumes it
            skip = loader.state()["batch"]
            t0 = time.perf_counter()
            epoch_loss, nsteps = 0.0, 0
            for batch in loader:
                if args.regime == "epipolar":
                    batch = _attach_epipolar(model, state, batch, args, epi_keys)
                    batch = meshlib.shard_batch(batch, mesh)
                state, metrics = step_fn(state, batch)
                nsteps += 1
                loss = float(metrics["loss"])
                epoch_loss += loss
                if nsteps % args.log_every == 0 and is_main:
                    rec = {"epoch": epoch, "step": int(state.step),
                           **{k: float(v) for k, v in metrics.items()}}
                    with open(log_path, "a") as f:
                        f.write(json.dumps(rec) + "\n")
                    if tb:
                        tb.scalars("train", metrics, int(state.step))
                    print(f"e{epoch} s{int(state.step)} "
                          + " ".join(f"{k}={float(v):.4f}"
                                     for k, v in metrics.items()))
                if preempt.is_set():
                    break
            if preempt.is_set():
                if is_main:
                    # preemption on the epoch's last batch completed the epoch:
                    # save as end-of-epoch or the resume would re-enter it,
                    # run zero steps, and log a bogus zero-loss epoch
                    done = skip + nsteps
                    full = done >= len(loader)
                    path = ckpt.save_train_state(
                        args.out_dir, int(state.step), state.params,
                        state.opt_state,
                        metadata={"epoch": epoch, "regime": args.regime,
                                  "mid_epoch": not full,
                                  "loader": json.dumps(
                                      {"epoch": epoch + 1 if full else epoch,
                                       "batch": 0 if full else done,
                                       "seed": loader.seed})})
                    print(f"preempted: saved {path} (epoch {epoch}, "
                          f"batch {done}/{len(loader)})")
                return 0
            dt = time.perf_counter() - t0
            if nsteps:   # a zero-step epoch has no meaningful loss to log
                mean_loss = epoch_loss / nsteps
                ips = nsteps * args.batch / max(dt, 1e-9)
                if is_main:
                    print(f"epoch {epoch}: loss={mean_loss:.4f} "
                          f"({ips:.1f} samples/s, {dt:.1f}s)")
                    if tb:
                        tb.scalars("epoch", {"loss": mean_loss,
                                             "samples_per_sec": ips}, epoch)
                history.append((epoch, mean_loss))

            if val_loader is not None:
                vals = []
                for vbatch in val_loader:
                    if args.regime == "epipolar":
                        vbatch = _attach_epipolar(model, state, vbatch, args,
                                                  epi_keys)
                    n = vbatch["images"].shape[0]
                    if n % mesh.devices.size == 0:
                        vbatch = meshlib.shard_batch(vbatch, mesh)
                        vm = eval_fn(state.params, vbatch)
                    else:
                        # ragged final batch (drop_last=False keeps every val
                        # sample): the sharded eval program would fail to
                        # split it across devices — run it single-device
                        if eval_fn_single is None:
                            eval_fn_single = make_eval_metrics_step(model, cfg)
                        vm = eval_fn_single(state.params, vbatch)
                    vals.append(({k: float(v) for k, v in vm.items()}, n))
                if not vals:
                    continue
                total = sum(n for _, n in vals)   # sample-weighted, not
                agg = {k: sum(v[k] * n for v, n in vals) / total   # batch-mean
                       for k in vals[0][0]}
                key_metric = agg.get("epe", agg["loss"])
                print("val: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
                if tb:
                    tb.scalars("val", agg, epoch)
                with open(log_path, "a") as f:
                    f.write(json.dumps({"epoch": epoch, "val": agg}) + "\n")
                state = plateau.step(state, key_metric)
                if key_metric < best_metric:
                    best_metric = key_metric
                    path = ckpt.save_train_state(
                        os.path.join(args.out_dir, "best"), int(state.step),
                        state.params, state.opt_state,
                        metadata={"epoch": epoch, "metric": key_metric,
                                  "regime": args.regime})
                    print(f"best model saved ({key_metric:.4f}) -> {path}")

            if ((epoch + 1) % args.save_every == 0 or epoch == args.epochs - 1) \
                    and is_main:
                # params/opt state are fully replicated, so rank 0's host copy
                # is the global state — a host-side save needs no collective
                path = ckpt.save_train_state(
                    args.out_dir, int(state.step), state.params, state.opt_state,
                    metadata={"epoch": epoch, "regime": args.regime,
                              "loader": json.dumps(loader.state())})
                print(f"saved {path}")
        if is_main:
            _plot_history(history, os.path.join(args.out_dir, "loss_curve.png"))
    finally:
        if tb:
            tb.close()
    return 0


class _TBWriter:
    """Thin tensorboardX scalar writer (main process only)."""

    def __init__(self, logdir):
        from tensorboardX import SummaryWriter  # optional dependency
        self._w = SummaryWriter(logdir)

    def scalars(self, prefix, metrics, step):
        for k, v in metrics.items():
            self._w.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        self._w.flush()
        self._w.close()


def _open_tensorboard(args, is_main):
    if not (args.tensorboard and is_main):
        return None
    try:
        return _TBWriter(os.path.join(args.out_dir, "tb"))
    except ImportError as e:  # optional: JSONL metrics are always written
        print(f"--tensorboard disabled (tensorboardX unavailable: {e})")
        return None


def _attach_epipolar(model, state, batch, args, keys):
    """Per-batch epipolar mask from the model's current prediction
    (train_fundamental.py:435-500), computed on device."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from opticalflow_tpu.geometry.epipolar import epipolar_mask_and_f
    from opticalflow_tpu.train.losses import _flow_to_image_res

    images = jnp.asarray(batch["images"])
    h, w = images.shape[1:3]
    # jit the forward (cached per model instance): eager flax dispatch on a
    # relay-attached TPU costs minutes of per-op round trips (CLAUDE.md)
    cached = getattr(_attach_epipolar, "_fwd", None)
    if cached is None or cached[0] is not model:
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        _attach_epipolar._fwd = cached = (model, fn)
    flow2 = cached[1](state.params, images) * args.flow_scale
    full = _flow_to_image_res(flow2, h, w)
    # a fresh key window per step (step-derived so a preemption resume
    # replays the same masks); never slices past the end of the table
    b = full.shape[0]
    kidx = (int(state.step) * b) % max(1, len(keys) - b)
    masks, fs = jax.vmap(lambda f, k: epipolar_mask_and_f(
        f, k, tau=args.epi_tau, stride=args.epi_stride))(
            full, keys[kidx:kidx + b])
    batch = dict(batch)
    batch["photo_mask"] = np.asarray(masks.astype(jnp.float32))
    batch["fundamental"] = np.asarray(fs.astype(jnp.float32))
    return batch


def _plot_history(history, path):
    if not history:
        return
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        ep, losses = zip(*history)
        plt.figure(figsize=(6, 4))
        plt.plot(ep, losses, marker="o")
        plt.xlabel("epoch")
        plt.ylabel("loss")
        plt.grid(True, alpha=0.3)
        plt.tight_layout()
        plt.savefig(path)
        plt.close()
    except Exception as e:  # viz must never kill a training run
        print(f"loss-curve plot skipped: {e}")


if __name__ == "__main__":
    sys.exit(main())
