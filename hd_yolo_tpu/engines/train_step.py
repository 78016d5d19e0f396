"""The pjit training step: forward, loss, grads, optimizer, EMA — one program.

Replaces the reference hot loop (``/root/reference/train.py:429-494``):
autocast/GradScaler → native bf16-safe f32 loss; DDP allreduce → XLA psum
inserted by jit over the sharded batch; EMA deepcopy → functional pytree
update; accumulate → optax.MultiSteps (configured in build_optimizer).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .optim import EMAState, ema_init, ema_update

Array = jnp.ndarray


def _donation_supported() -> bool:
    """HDYOLO_NO_DONATE=1 turns train-state donation off (debug knob).

    Donation requires every donated leaf to be a distinct buffer — see
    ema_init's forced copy; aliased leaves fail at execution with "attempt
    to donate the same buffer twice" (reported as a bare InvalidArgument
    through the tunneled backend)."""
    import os

    if os.environ.get("HDYOLO_NO_DONATE"):
        return False
    return True


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState

    @classmethod
    def create(cls, variables, tx) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            ema=ema_init(params),
        )


def make_train_step(model, tx, mask_weight: float = 1.0, ema_decay: float = 0.9999,
                    train_flag: bool = True, seed: int = 0, augment_fn=None,
                    resident_data: bool = False):
    """Build the jittable train step.

    batch = {'image': (B, H, W, 3), 'targets': {task: {boxes, labels, masks,
    valid[, active]}}}.  Under a mesh, shard batch leaves over 'data' and
    replicate state — jit partitions the rest.

    ``resident_data=True`` (``--cache-device``) changes the signature to
    ``step(state, data, idx)``: ``data`` is the WHOLE dataset resident in
    HBM (same tree as a batch, leading axis = n_images) and ``idx`` a (B,)
    int32 row sample; the batch is gathered on device.  This exists because
    host→device streaming can be the bottleneck (measured 16 MB/s effective
    on the tunneled chip ⇒ a 23 MB batch costs ~1.3 s, 13 img/s); the
    per-step transfer drops to the 64-byte index vector.

    ``train_flag=False`` runs the model's validation-mode forward inside the
    step (frozen batch stats, eval decode).  HNet does NOT need it: its
    forward reproduces the reference double pass (inference tiles + ROI
    losses, hnet/detection/mask_rcnn.py:419-455) in train mode, so the
    confliction loss gets detections while BN stats keep updating.
    """

    def loss_fn(params, batch_stats, batch, rng):
        (losses, _), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"],
            batch["targets"],
            train=train_flag,
            compute_masks=mask_weight > 0,
            mutable=["batch_stats"],
            rngs={"dropout": rng},  # drop-path/dropout (e.g. swin); unused rngs are free
        )
        total = model.total_loss(losses, mask_weight)
        items = {}
        for task, tl in losses.items():
            sub = tl.get("loss_items") if isinstance(tl, dict) else None
            if sub is None:  # headers reporting flat scalar losses (hnet)
                sub = {k: v for k, v in tl.items()} if isinstance(tl, dict) else {}
            for k, v in sub.items():
                if hasattr(v, "ndim") and v.ndim == 0:
                    items[f"{task}/{k}"] = jax.lax.stop_gradient(v)
        return total, (mutated.get("batch_stats", batch_stats), items)

    # donate the state: params/opt/EMA update in place instead of
    # double-buffering ~3× param bytes of HBM per step (callers rebind
    # ``state = step(state, batch)``).  HDYOLO_NO_DONATE=1 turns it off.
    _donate = () if not _donation_supported() else (0,)

    def _step_body(state: TrainState, batch) -> tuple:
        # fresh dropout key each step, reproducible from (seed, step) — no
        # state-structure change so existing checkpoints keep restoring
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        if augment_fn is not None:
            # --device-augment: the whole train-time recipe (mosaic/warp/
            # flips/HSV, data/device_augment.py) fused into this program —
            # the host only stacks cached raw tiles
            batch = augment_fn(jax.random.fold_in(rng, 0x5EED), batch)
        (loss, (new_stats, items)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(state.ema, new_params, decay=ema_decay)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema=new_ema,
        )
        metrics = dict(items)
        metrics["loss"] = loss
        return new_state, metrics

    if resident_data:
        @partial(jax.jit, donate_argnums=_donate)
        def train_step(state: TrainState, data, idx) -> tuple:
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
            return _step_body(state, batch)
    else:
        train_step = partial(jax.jit, donate_argnums=_donate)(_step_body)

    return train_step


def make_eval_step(model, compute_masks: bool = True, use_ema: bool = True):
    """Jittable eval forward returning (losses, outputs)."""

    @jax.jit
    def eval_step(state: TrainState, batch, targets=None):
        params = state.ema.params if use_ema else state.params
        return model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            targets,
            train=False,
            compute_masks=compute_masks,
        )

    return eval_step
