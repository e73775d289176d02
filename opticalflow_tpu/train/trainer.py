"""Data-parallel training: optimizers, train state, and the jitted step.

Covers the reference's four training regimes (SURVEY.md §2.5) behind one
``TrainConfig``:

  * ``loss="charbonnier_full"`` — supervised fine-tune: upsample flow2 to the
    full-res GT and apply masked Charbonnier (``train.py:54-87``);
  * ``loss="multiscale"`` — per-level supervised loss, weights
    [0.32, 0.08, 0.02, 0.01, 0.005] (+optional photometric/smoothness
    regularizers) (``train2.py:124-200``);
  * ``loss="proxy"`` — self-supervised SSIM+L1 photometric + smoothness
    (``train_pseudo.py:65-164``);
  * ``loss="proxy_epipolar"`` — proxy loss masked by a per-sample epipolar
    inlier mask, + optional soft Sampson penalty
    (``train_fundamental.py:435-500``).

TPU-first design: one jitted step with batch sharded over the mesh's
``data`` axis and params replicated — XLA emits the gradient ``psum`` over
ICI (the reference is single-GPU with no distributed layer).  The step
donates the train state, keeps optimizer math in float32, and optionally
runs the network in bfloat16 (the reference's AMP analogue,
``train.py:66-79``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from opticalflow_tpu.ops.resize import upsample_flow_to
from opticalflow_tpu.parallel import mesh as meshlib
from opticalflow_tpu.train import losses as L

__all__ = ["TrainConfig", "TrainState", "make_optimizer", "make_train_step",
           "create_train_state", "make_eval_metrics_step",
           "PlateauController"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Single config tree replacing the reference's per-script argparse +
    hard-coded dicts (SURVEY.md §5 'Config / flag system')."""
    loss: str = "multiscale"           # charbonnier_full | multiscale | proxy | proxy_epipolar
    optimizer: str = "adamw"           # adam | adamw
    lr: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip: float = 1.0             # 0 disables (train2.py grad-clip 1.0)
    # ReduceLROnPlateau (train2.py's scheduler): scale lr by plateau_factor
    # after plateau_patience epochs without val-metric improvement; 0 = off
    plateau_factor: float = 0.0
    plateau_patience: int = 3
    multiscale_weights: Tuple[float, ...] = L.MULTISCALE_WEIGHTS
    lambda_photo: float = 0.0
    lambda_smooth: float = 0.0
    alpha_photo: float = 1.0           # proxy loss weights (train_pseudo)
    alpha_smooth: float = 0.1
    epi_soft_weight: float = 0.0       # soft Sampson penalty weight
    # flow2 is in /20 units for the canonical weights; GT-space checkpoints
    # (the reference's own fine-tunes) use 1.0.
    flow_scale: float = 1.0
    # rematerialize the forward during backprop (jax.checkpoint): trades
    # step FLOPs for activation memory — the knob for large crops / batches
    # that otherwise exhaust HBM.  True recomputes the whole forward;
    # "l2" recomputes only the named L2-resolution groups (the piece-conv
    # partials and context chain, the largest activations by far) from
    # their saved inputs — much cheaper than a full re-forward.
    remat: Any = False          # False | True | "l2"
    # gradient accumulation: split each batch into this many micro-batches
    # (lax.scan inside ONE jitted step), average the grads, apply one
    # optimizer update.  Large effective batches at the memory footprint of
    # B/grad_accum — the other large-batch knob besides remat.  Reported
    # metrics are micro-batch means (standard accumulation semantics: for
    # valid-mask-normalized losses this weights micro-batches equally, not
    # by valid-pixel count).
    grad_accum: int = 1


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        base = optax.adam
        kw = {}
    elif cfg.optimizer == "adamw":
        base = optax.adamw
        kw = {"weight_decay": cfg.weight_decay}
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.plateau_factor:
        # expose learning_rate as mutable optimizer-state so the host-side
        # plateau controller can rescale it between epochs
        tx = optax.inject_hyperparams(base)(learning_rate=cfg.lr, **kw)
    else:
        tx = base(cfg.lr, **kw)
    if cfg.grad_clip and cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


class PlateauController:
    """Host-side ReduceLROnPlateau (the ``train2.py`` scheduler): call
    :meth:`step` with the epoch's validation metric; when it fails to improve
    for ``patience`` epochs, the injected learning_rate in the optimizer
    state is scaled by ``factor``.  Returns the (possibly updated) state."""

    def __init__(self, cfg: TrainConfig):
        self.factor = cfg.plateau_factor
        self.patience = cfg.plateau_patience
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, state: "TrainState", metric: float) -> "TrainState":
        if not self.factor:
            return state
        if metric < self.best - 1e-6:
            self.best = metric
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs < self.patience:
            return state
        self.bad_epochs = 0
        # locate the injected learning_rate by NAME wherever it sits in the
        # optax chain (grad-clip on/off, future chain changes) instead of
        # assuming a tuple position
        import optax.tree_utils as otu
        lr = otu.tree_get(state.opt_state, "learning_rate")
        if lr is None:
            raise ValueError(
                "PlateauController: no injected 'learning_rate' in the "
                "optimizer state — build the optimizer with "
                "plateau_factor > 0 (optax.inject_hyperparams)")
        new_lr = lr * self.factor
        opt_state = otu.tree_set(state.opt_state, learning_rate=new_lr)
        print(f"plateau: learning_rate -> {float(new_lr):.3e}")
        return state.replace(opt_state=opt_state)


def create_train_state(model, rng, cfg: TrainConfig,
                       sample_shape=(1, 64, 64, 6),
                       params=None) -> Tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        # jitted: eager flax init dispatches per-op (minutes over a relay)
        params = jax.jit(lambda r, x: model.init(r, x, train=True))(
            rng, jnp.zeros(sample_shape, jnp.float32))["params"]
    tx = make_optimizer(cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    return state, tx


def _compute_loss(model, params, batch: Dict[str, jax.Array],
                  cfg: TrainConfig):
    """Dispatch to the configured loss; returns (loss, metrics dict)."""
    x = batch["images"]

    def fwd(p, xx):
        return model.apply({"params": p}, xx, train=True)

    if cfg.remat == "l2":
        fwd = jax.checkpoint(
            fwd, policy=jax.checkpoint_policies
            .save_anything_except_these_names("l2_piece_out", "l2_ctx"))
    elif cfg.remat:
        fwd = jax.checkpoint(fwd)
    preds = fwd(params, x)
    flow2 = preds[0] * cfg.flow_scale
    metrics = {}

    if cfg.loss == "charbonnier_full":
        gt, valid = batch["flow"], batch["valid"]
        h, w = gt.shape[-3], gt.shape[-2]
        pred_full = upsample_flow_to(flow2, h, w)
        loss = L.charbonnier_epe(pred_full, gt, valid)
        metrics["epe"] = L.epe_loss(pred_full, gt, valid)
    elif cfg.loss == "multiscale":
        gt, valid = batch["flow"], batch["valid"]
        scaled = tuple(p * cfg.flow_scale for p in preds)
        loss = L.multiscale_supervised_loss(
            scaled, gt, valid, weights=cfg.multiscale_weights,
            images=x, lambda_photo=cfg.lambda_photo,
            lambda_smooth=cfg.lambda_smooth)
        h, w = gt.shape[-3], gt.shape[-2]
        metrics["epe"] = L.epe_loss(upsample_flow_to(scaled[0], h, w),
                                    gt, valid)
    elif cfg.loss in ("proxy", "proxy_epipolar"):
        im1, im2 = x[..., :3], x[..., 3:]
        mask = batch.get("photo_mask") if cfg.loss == "proxy_epipolar" else None
        loss, photo, smooth = L.proxy_label_loss(
            flow2, im1, im2, alpha_photo=cfg.alpha_photo,
            alpha_smooth=cfg.alpha_smooth, photo_mask=mask)
        metrics["photo"] = photo
        metrics["smooth"] = smooth
        if cfg.loss == "proxy_epipolar" and cfg.epi_soft_weight > 0:
            from opticalflow_tpu.geometry.epipolar import sampson_penalty
            pen = sampson_penalty(flow2, batch["fundamental"])
            loss = loss + cfg.epi_soft_weight * pen
            metrics["sampson"] = pen
    else:
        raise ValueError(f"unknown loss {cfg.loss!r}")

    metrics["loss"] = loss
    return loss, metrics


def make_train_step(model, tx: optax.GradientTransformation,
                    cfg: TrainConfig,
                    mesh: Optional[jax.sharding.Mesh] = None) -> Callable:
    """Build the jitted train step.

    With a mesh, the batch is sharded over the ``data`` axis and the state
    replicated; XLA inserts the ICI gradient all-reduce.  The state argument
    is donated (in-place update, no HBM copy).
    """

    accum = max(1, int(cfg.grad_accum))

    def grads_of(params, b):
        (_, metrics), grads = jax.value_and_grad(
            lambda p: _compute_loss(model, p, b, cfg), has_aux=True)(params)
        return grads, metrics

    def grads_and_metrics(params, batch):
        if accum == 1:
            return grads_of(params, batch)
        b0 = jax.tree.leaves(batch)[0].shape[0]
        if b0 % accum:
            raise ValueError(
                f"batch size {b0} not divisible by grad_accum={accum}")
        micro = jax.tree.map(
            lambda a: a.reshape(accum, b0 // accum, *a.shape[1:]), batch)
        if mesh is not None:
            # keep micro-batches sharded over the data axis (now axis 1)
            from jax.sharding import NamedSharding, PartitionSpec
            micro = jax.lax.with_sharding_constraint(
                micro, NamedSharding(mesh, PartitionSpec(None, "data")))
        g_shp, m_shp = jax.eval_shape(
            grads_of, params, jax.tree.map(lambda a: a[0], micro))
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             (g_shp, m_shp))

        def body(carry, mb):
            g, m = grads_of(params, mb)
            gacc, macc = carry
            return (jax.tree.map(jnp.add, gacc, g),
                    jax.tree.map(jnp.add, macc, m)), None

        (gacc, macc), _ = jax.lax.scan(body, zeros, micro)
        inv = 1.0 / accum
        return (jax.tree.map(lambda g: g * inv, gacc),
                jax.tree.map(lambda m: m * inv, macc))

    def step(state: TrainState, batch: Dict[str, jax.Array]):
        grads, metrics = grads_and_metrics(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = meshlib.replicated(mesh)
    data = meshlib.batch_sharding(mesh)
    batch_shardings = data
    return jax.jit(
        step,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_metrics_step(model, cfg: TrainConfig,
                           mesh: Optional[jax.sharding.Mesh] = None):
    """Jitted validation step returning the loss metrics without updating."""

    def step(params, batch):
        _, metrics = _compute_loss(model, params, batch, cfg)
        return metrics

    if mesh is None:
        return jax.jit(step)
    repl = meshlib.replicated(mesh)
    return jax.jit(step, in_shardings=(repl, meshlib.batch_sharding(mesh)),
                   out_shardings=repl)
