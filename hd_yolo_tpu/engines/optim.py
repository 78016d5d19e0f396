"""Optimizer, LR schedules, warmup and EMA — optax-native.

Behavioral reference:
  * 3 param groups (``/root/reference/train.py:213-233``): BN scales & biases
    without weight decay, conv/dense kernels with decay — SGD + nesterov
    momentum.
  * linear / one-cycle cosine epoch schedules (``train.py:242-246``,
    ``engines/general.py:391-393``).
  * per-iteration warmup of lr (bias group ramps down from warmup_bias_lr,
    others up from 0) and momentum (``train.py:436-444``).
  * ``ModelEMA`` decay ramp ``decay·(1−exp(−updates/tau))``
    (``metayolo/common.py:128-159``).

TPU-first: everything is a pure optax transform / pytree fn — AMP GradScaler
has no equivalent because bf16 training needs no loss scaling.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray

DEFAULT_HYP = {
    "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
    # global grad-norm clip; 0 disables (the flagship recipe never needed
    # it, but multi-loss hnet training can explode through finite grads —
    # measured in tools/hnet_train_check.py)
    "clip_grad_norm": 0.0,
}


def one_cycle(y1: float = 1.0, y2: float = 1.0, steps: int = 100) -> Callable[[float], float]:
    """Cosine ramp from y1 to y2 over steps (engines/general.py:391-393)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def linear_lf(lrf: float, epochs: int) -> Callable[[float], float]:
    """Linear decay factor (train.py:242-243)."""
    return lambda x: (1 - x / max(epochs - 1, 1)) * (1.0 - lrf) + lrf


def _group_label(path, leaf) -> str:
    """Classify a param leaf: 'bias' (incl. BN bias), 'bn_scale', 'kernel'."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    last = names[-1]
    if last in ("scale",):
        return "bn_scale"
    if last in ("bias",):
        return "bias"
    return "kernel"


def label_params(params, freeze: Optional[list] = None) -> Any:
    """Group labels; leaves whose path contains any ``freeze`` substring get
    'frozen' (the reference --freeze flag: e.g. ['blocks_', 'header_det'] —
    train.py freeze_params/freeze_bn semantics, utils_torch.py:163-203)."""

    def lab(path, leaf):
        if freeze:
            key = jax.tree_util.keystr(path)
            if any(f in key for f in freeze):
                return "frozen"
        return _group_label(path, leaf)

    return jax.tree_util.tree_map_with_path(lab, params)


def make_lr_schedules(hyp: Dict[str, float], epochs: int, steps_per_epoch: int,
                      schedule: str = "linear"):
    """Per-group lr(step) schedules with warmup (train.py:436-444 semantics).

    Warmup spans ``nw = max(warmup_epochs·steps_per_epoch, 100)`` steps; the
    epoch factor ``lf`` is stepped per epoch like the reference's LambdaLR.
    """
    hyp = {**DEFAULT_HYP, **{k: v for k, v in hyp.items() if k in DEFAULT_HYP}}
    lr0, lrf = hyp["lr0"], hyp["lrf"]
    lf = one_cycle(1, lrf, epochs) if schedule == "cosine" else linear_lf(lrf, epochs)
    nw = max(round(hyp["warmup_epochs"] * steps_per_epoch), 100)
    lf_table = jnp.asarray([lf(e) for e in range(max(epochs, 1))], jnp.float32)

    def base_lr(step):
        # optax may pass the count as float; indexers must be integer
        epoch = jnp.minimum(step // steps_per_epoch, epochs - 1).astype(jnp.int32)
        return lr0 * lf_table[epoch]

    def lr_main(step):
        w = jnp.clip(step / nw, 0.0, 1.0)
        return base_lr(step) * w

    def lr_bias(step):
        w = jnp.clip(step / nw, 0.0, 1.0)
        warm = hyp["warmup_bias_lr"] * (1 - w) + base_lr(step) * w
        return jnp.where(step < nw, warm, base_lr(step))

    def momentum(step):
        w = jnp.clip(step / nw, 0.0, 1.0)
        return hyp["warmup_momentum"] * (1 - w) + hyp["momentum"] * w

    return lr_main, lr_bias, momentum


def build_optimizer(params, hyp: Dict[str, float], epochs: int, steps_per_epoch: int,
                    schedule: str = "linear", accumulate: int = 1,
                    freeze: Optional[list] = None,
                    skip_nonfinite: bool = True,
                    optimizer: str = "sgd") -> optax.GradientTransformation:
    """Optimizer with 3 param groups (+ frozen) and warmup schedules.

    ``optimizer`` ∈ {sgd, adam, adamw} mirrors the reference's
    ``--optimizer`` choice (ref train.py:612 → smart-optimizer grouping):
    SGD(momentum, nesterov) with a warmup momentum ramp, or Adam/AdamW with
    b1=hyp momentum.  Weight decay touches only the kernel group in every
    case (decoupled for adamw, L2-into-grad for sgd/adam — the torch
    semantics of each).

    ``skip_nonfinite`` wraps the whole chain in ``optax.apply_if_finite``:
    a step whose gradients contain inf/NaN is SKIPPED (params, momentum and
    accumulation state untouched) instead of poisoning the weights — the
    same recovery semantics the reference gets from AMP's GradScaler
    (ref train.py autocast/scaler path).  100 consecutive bad steps raise.
    """
    hyp = {**DEFAULT_HYP, **{k: v for k, v in hyp.items() if k in DEFAULT_HYP}}
    lr_main, lr_bias, momentum = make_lr_schedules(hyp, epochs, steps_per_epoch, schedule)
    labels = label_params(params, freeze)
    optimizer = optimizer.lower()
    assert optimizer in ("sgd", "adam", "adamw"), optimizer

    def sgd(lr_fn):
        return optax.inject_hyperparams(
            lambda learning_rate, momentum: optax.sgd(
                learning_rate, momentum=momentum, nesterov=True
            )
        )(learning_rate=lr_fn, momentum=momentum)

    def adam(lr_fn, wd=0.0):
        # torch Adam's weight_decay is L2-into-grad; AdamW's is decoupled
        if optimizer == "adamw":
            return optax.inject_hyperparams(
                lambda learning_rate: optax.adamw(
                    learning_rate, b1=hyp["momentum"], b2=0.999,
                    weight_decay=wd)
            )(learning_rate=lr_fn)
        return optax.inject_hyperparams(
            lambda learning_rate: optax.chain(
                optax.add_decayed_weights(wd),
                optax.adam(learning_rate, b1=hyp["momentum"], b2=0.999))
        )(learning_rate=lr_fn)

    if optimizer == "sgd":
        group = {
            "kernel": optax.chain(
                optax.add_decayed_weights(hyp["weight_decay"]), sgd(lr_main)
            ),
            "bn_scale": sgd(lr_main),
            "bias": sgd(lr_bias),
        }
    else:
        group = {
            "kernel": adam(lr_main, hyp["weight_decay"]),
            "bn_scale": adam(lr_main),
            "bias": adam(lr_bias),
        }
    tx = optax.multi_transform({**group, "frozen": optax.set_to_zero()}, labels)
    if hyp.get("clip_grad_norm", 0.0) > 0:
        tx = optax.chain(
            optax.clip_by_global_norm(float(hyp["clip_grad_norm"])), tx)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


class EMAState(NamedTuple):
    params: Any
    updates: Array  # int32 counter


def ema_init(params) -> EMAState:
    # genuine copies, NOT jnp.asarray (a no-op on jax arrays): TrainState
    # donation flattens params and ema.params into one argument list, and
    # aliased leaves make XLA reject the execution ("attempt to donate the
    # same buffer twice")
    return EMAState(params=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
                    updates=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, params, decay: float = 0.9999, tau: float = 2000.0) -> EMAState:
    """ModelEMA decay-ramp update (common.py:128-159)."""
    updates = state.updates + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, params)
    return EMAState(params=new, updates=updates)
