"""Checkpoint save/restore — orbax pytree checkpoints + JSON meta sidecar.

Replaces the reference's pickled-nn.Module checkpoints
(``/root/reference/train.py:530-547``: {epoch, best_fitness, model(half),
ema(half), updates, optimizer, date}) with pure pytrees: params, EMA params,
opt state, batch stats, step scalars.  Non-array metadata lives in a JSON
sidecar (tensorstore can't serialize strings).  ``strip_optimizer``
(engines/general.py:423-436) maps to ``save_inference`` — EMA params only.

Restore goes through a structure template built from the live TrainState so
optax's NamedTuple nests keep their leaf order (orbax round-trips dicts).
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def _payload(state) -> Dict[str, Any]:
    return {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
        "ema_params": _to_host(state.ema.params),
        "ema_updates": np.asarray(state.ema.updates),
        "step": np.asarray(state.step),
    }


def save_checkpoint(path: str, state, epoch: int, best_fitness: float = 0.0,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Save a full training checkpoint (last/best equivalent)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _payload(state), force=True)
    meta = {
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "date": datetime.datetime.now().isoformat(),
        **(extra or {}),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_meta(path: str) -> Dict[str, Any]:
    meta_path = os.path.join(os.path.abspath(path), "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def restore_train_state(path: str, state):
    """Restore a TrainState (resume semantics, train.py:252-272);
    returns (state, meta)."""
    import jax.numpy as jnp

    from .optim import EMAState

    template = _payload(state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore(os.path.abspath(path), item=template)
    state = state.replace(
        step=jnp.asarray(ckpt["step"], jnp.int32),
        params=ckpt["params"],
        batch_stats=ckpt["batch_stats"],
        opt_state=ckpt["opt_state"],
        ema=EMAState(params=ckpt["ema_params"],
                     updates=jnp.asarray(ckpt["ema_updates"], jnp.int32)),
    )
    return state, load_meta(path)


def save_inference(path: str, state, use_ema: bool = True) -> None:
    """Finalized inference checkpoint (strip_optimizer equivalent)."""
    payload = {
        "params": _to_host(state.ema.params if use_ema else state.params),
        "batch_stats": _to_host(state.batch_stats),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_inference(path: str) -> Dict[str, Any]:
    with ocp.PyTreeCheckpointer() as ckptr:
        ckpt = ckptr.restore(os.path.abspath(path))
    params = ckpt.get("ema_params") or ckpt.get("params")
    return {"params": params, "batch_stats": ckpt.get("batch_stats", {})}
