"""Train state: optimizer with per-module LR groups, LR schedule, EMA.

Reference semantics being reproduced:

- Optimizer: Adam(amsgrad=True, betas=(0.9, 0.98), eps=1e-9, wd=0) with
  THREE parameter groups — vis_enc at lr/10, lan_enc at lr, rest at lr
  (tools/train.py:78-94; configs .../refcoco_onestage.py:113-123).  Here:
  optax.amsgrad under optax.multi_transform keyed on the parameter path
  prefix (``beit3`` == vis_enc).
- Scheduler: MultiStepLRWarmUp — per-epoch multiplicative factor,
  linear warmup (epoch+1)/(warmup+1) then step decay at decay_steps
  (simvg/core/scheduler.py:13-44).  Expressed as an optax schedule over
  *steps* given steps_per_epoch.
- Grad clipping: global-norm 0.15 before the update
  (apis/train.py:79-81; cfg grad_norm_clip).
- EMA: shadow = d*shadow + (1-d)*param with warmup decay
  d = min(alpha, (step+1)/(step+10)) (simvg/models/utils.py:148-173).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_step: Optional[jnp.ndarray] = None


def cosine_annealing_lr(
    base_lr: float,
    steps_per_epoch: int,
    t_max: int,
    eta_min: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CosineAnnealingLR over epochs (simvg/core/scheduler.py:47-60)."""

    def schedule(step):
        # no clamp at t_max: torch CosineAnnealingLR is PERIODIC — for
        # epochs beyond T_max the cosine keeps going and the LR climbs
        # back up (reference core/scheduler.py uses the torch class)
        epoch = step // steps_per_epoch
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch / t_max)
        )

    return schedule


def cosine_annealing_warm_restarts(
    base_lr: float,
    steps_per_epoch: int,
    t_0: int,
    t_mult: int = 1,
    eta_min: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """CosineAnnealingWarmRestarts (simvg/core/scheduler.py:63-78);
    t_mult=1 keeps the restart period fixed (the general case needs
    log-time math that optax's own schedule provides if ever needed)."""
    assert t_mult == 1, "only t_mult=1 supported"

    def schedule(step):
        epoch = (step // steps_per_epoch) % t_0
        return eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * epoch / t_0)
        )

    return schedule


def multistep_lr_warmup(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int = 3,
    decay_steps: Sequence[int] = (25,),
    decay_ratio: float = 0.1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Per-step schedule matching the reference's per-epoch factor
    (scheduler.py:24-38): epochs 0..warmup-1 ramp (e+1)/(warmup+1); after
    that multiply decay_ratio per decay step passed.

    Note the reference steps its scheduler at the END of each epoch
    (tools/train.py:181), so epoch e trains with factor(e).
    """

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = (epoch + 1.0) / (warmup_epochs + 1.0)
        decay = jnp.asarray(1.0, jnp.float32)
        for s in decay_steps:
            decay = decay * jnp.where(epoch + 1 >= s, decay_ratio, 1.0)
        factor = jnp.where(epoch <= warmup_epochs - 1, warm, decay)
        return base_lr * factor

    return schedule


def _group_label(path_parts) -> str:
    top = str(getattr(path_parts[0], "key", path_parts[0]))
    # flax wraps params under 'params'
    if top == "params" and len(path_parts) > 1:
        top = str(getattr(path_parts[1], "key", path_parts[1]))
    if top in ("beit3", "vis_enc"):
        return "vis_enc"
    if top in ("lan_enc",):
        return "lan_enc"
    return "rest"


def _freeze_label(path_parts, freeze_layer: int) -> bool:
    """True if the parameter belongs to a frozen encoder layer.

    Mirrors BEIT3._freeze_stages (simvg/models/vis_encs/beit/
    beit3.py:78-90): encoder layers [0, freeze_layer) stop training.
    """
    keys = [str(getattr(p, "key", p)) for p in path_parts]
    for k in keys:
        if k.startswith("layers_"):
            try:
                return int(k.split("_")[1]) < freeze_layer
            except ValueError:
                return False
    return False


def _scan_freeze_mask(freeze_layer: int) -> optax.GradientTransformation:
    """Freeze stacked (nn.scan) encoder layers [0, freeze_layer).

    The unrolled layout freezes whole ``layers_N`` leaves via the
    "frozen" label + set_to_zero; the scanned layout stacks every layer
    in ONE leaf under a ``layers`` node with a leading [num_layers]
    axis, so freezing must zero update ROWS along that axis instead
    (reference: requires_grad=False on encoder.layers[:freeze_layer],
    simvg/models/vis_encs/beit/beit3.py:78-90)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params

        def mask(kp, u):
            keys = [str(getattr(p, "key", p)) for p in kp]
            if "layers" in keys and _group_label(kp) == "vis_enc":
                keep = jnp.arange(u.shape[0]) >= freeze_layer
                return u * keep.reshape(
                    (-1,) + (1,) * (u.ndim - 1)
                ).astype(u.dtype)
            return u

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(init, update)


def make_lr_schedule(
    base: float,
    steps_per_epoch: int,
    *,
    scheduler_type: str = "MultiStepLRWarmUp",
    warmup_epochs: int = 3,
    decay_steps: Sequence[int] = (25,),
    decay_ratio: float = 0.1,
    scheduler_kw: Optional[Dict] = None,
):
    """The scheduler registry (reference core/scheduler.py:13-78).
    Single source of truth: both the optimizer (create_optimizer) and
    the CLI's lr logging use this, so the logged lr always matches the
    applied one."""
    scheduler_kw = scheduler_kw or {}
    if scheduler_type == "MultiStepLRWarmUp":
        return multistep_lr_warmup(base, steps_per_epoch,
                                   warmup_epochs, decay_steps,
                                   decay_ratio)
    if scheduler_type == "CosineAnnealingLR":
        return cosine_annealing_lr(
            base, steps_per_epoch, scheduler_kw.get("T_max", 30),
            scheduler_kw.get("eta_min", 0.0))
    if scheduler_type == "CosineAnnealingLRWarmRestarts":
        return cosine_annealing_warm_restarts(
            base, steps_per_epoch, scheduler_kw.get("T_0", 10),
            scheduler_kw.get("T_mult", 1),
            scheduler_kw.get("eta_min", 0.0))
    raise ValueError(f"unknown scheduler {scheduler_type!r}")


def create_optimizer(
    lr: float,
    steps_per_epoch: int,
    *,
    lr_vis_enc: Optional[float] = None,
    lr_lan_enc: Optional[float] = None,
    betas=(0.9, 0.98),
    eps: float = 1e-9,
    grad_norm_clip: float = 0.15,
    warmup_epochs: int = 3,
    decay_steps: Sequence[int] = (25,),
    decay_ratio: float = 0.1,
    freeze_layer: int = -1,
    optimizer_type: str = "Adam",
    scheduler_type: str = "MultiStepLRWarmUp",
    scheduler_kw: Optional[Dict] = None,
    amsgrad: bool = True,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    lr_vis_enc = lr / 10.0 if lr_vis_enc is None else lr_vis_enc
    lr_lan_enc = lr if lr_lan_enc is None else lr_lan_enc
    scheduler_kw = scheduler_kw or {}

    def mk_schedule(base):
        return make_lr_schedule(
            base, steps_per_epoch, scheduler_type=scheduler_type,
            warmup_epochs=warmup_epochs, decay_steps=decay_steps,
            decay_ratio=decay_ratio, scheduler_kw=scheduler_kw,
        )

    # mu_dtype: store the Adam-family FIRST moment in a narrower dtype
    # (HBM-bandwidth lever: the optimizer stream is at the HBM floor,
    # ROADMAP "Training floor").  Params and nu/nu_max stay f32 — nu
    # spans a much wider dynamic range (squared grads) and drives the
    # effective step size, so it is not narrowed.
    mu_dt = jnp.dtype(mu_dtype) if mu_dtype else None

    def mk(base):
        sched = mk_schedule(base)
        # optimizer registry parity (simvg/core/optimizer.py:1-87)
        if optimizer_type == "Adam" and amsgrad:
            return optax.amsgrad(learning_rate=sched, b1=betas[0],
                                 b2=betas[1], eps=eps, mu_dtype=mu_dt)
        if optimizer_type == "Adam":
            return optax.adam(learning_rate=sched, b1=betas[0],
                              b2=betas[1], eps=eps, mu_dtype=mu_dt)
        if optimizer_type == "AdamW":
            return optax.adamw(learning_rate=sched, b1=betas[0],
                               b2=betas[1], eps=eps,
                               weight_decay=weight_decay,
                               mu_dtype=mu_dt)
        if optimizer_type == "SGD":
            return optax.sgd(learning_rate=sched, momentum=momentum)
        if optimizer_type == "RMSProp":
            return optax.rmsprop(learning_rate=sched, momentum=momentum)
        raise ValueError(f"unknown optimizer {optimizer_type!r}")

    transforms = {
        "vis_enc": mk(lr_vis_enc),
        "lan_enc": mk(lr_lan_enc),
        "rest": mk(lr),
    }

    def label_fn(params):
        def lab(kp, _):
            if freeze_layer >= 0 and _group_label(kp) == "vis_enc" \
                    and _freeze_label(kp, freeze_layer):
                return "frozen"
            return _group_label(kp)

        return jax.tree_util.tree_map_with_path(lab, params)

    if freeze_layer >= 0:
        transforms = dict(transforms, frozen=optax.set_to_zero())

    tx = optax.multi_transform(transforms, label_fn)
    pre = []
    if freeze_layer >= 0:
        # Zero frozen gradients BEFORE the global-norm clip: the
        # reference's clip_grad_norm_ only sees trainable params
        # (frozen ones have requires_grad=False, so no grad at all) —
        # letting frozen grads inflate the norm would systematically
        # shrink the trainable updates whenever clipping is active.
        def _zero_frozen_grads():
            def init(params):
                return optax.EmptyState()

            def update(updates, state, params=None):
                labels = label_fn(updates)
                updates = jax.tree_util.tree_map(
                    lambda u, lab: jnp.zeros_like(u)
                    if lab == "frozen" else u,
                    updates, labels,
                )
                return updates, state

            return optax.GradientTransformation(init, update)

        pre.append(_zero_frozen_grads())
        # scan (stacked) layout: zero the frozen layers' update rows
        pre.append(_scan_freeze_mask(freeze_layer))
    if grad_norm_clip and grad_norm_clip > 0:
        pre.append(optax.clip_by_global_norm(grad_norm_clip))
    return optax.chain(*pre, tx) if pre else tx


def create_train_state(
    params, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        ema_step=jnp.zeros((), jnp.int32) if ema else None,
    )


def ema_update(ema_params, params, ema_step, alpha: float = 0.999):
    """models/utils.py:148-158 shadow update."""
    decay = jnp.minimum(alpha, (ema_step + 1.0) / (ema_step + 10.0))
    new = jax.tree.map(
        lambda s, p: decay * s + (1.0 - decay) * p, ema_params, params
    )
    return new, ema_step + 1
