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


_ASYNC: Dict[str, Any] = {}  # path → (AsyncCheckpointer, meta) of in-flight save


def _write_meta(path: str, meta: Dict[str, Any]) -> None:
    # orbax saves are COLLECTIVE in a multi-process runtime (every process
    # must enter Checkpointer.save or its internal barrier mismatches) and
    # orbax already dedupes the tensorstore writes to the primary host; the
    # json sidecar is the only side effect left to rank-gate ourselves
    if jax.process_index() != 0:
        return
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def wait_for_saves() -> None:
    """Block until every in-flight async checkpoint finishes (then write its
    meta sidecar).  Called automatically before a new save to the same path
    and at the end of training."""
    for path, (ckptr, meta) in list(_ASYNC.items()):
        ckptr.wait_until_finished()
        _write_meta(path, meta)
        ckptr.close()
        del _ASYNC[path]


def save_checkpoint(path: str, state, epoch: int, best_fitness: float = 0.0,
                    extra: Optional[Dict[str, Any]] = None,
                    async_save: bool = False) -> None:
    """Save a full training checkpoint (last/best equivalent).

    ``async_save=True`` uses orbax's AsyncCheckpointer: the host copy of the
    state is snapshotted synchronously (cheap), the ~1 GB tensorstore write
    streams in a background thread, and the train loop keeps stepping — the
    production answer to the measured 60-90 s per-epoch write stall.  The
    meta sidecar is written when the save completes (so a crash mid-write
    leaves no meta and resume falls back to the previous epoch)."""
    path = os.path.abspath(path)
    meta = {
        "epoch": epoch,
        "best_fitness": float(best_fitness),
        "date": datetime.datetime.now().isoformat(),
        **(extra or {}),
    }
    if async_save:
        if path in _ASYNC:  # previous save to this path still in flight
            ckptr, prev_meta = _ASYNC.pop(path)
            ckptr.wait_until_finished()
            _write_meta(path, prev_meta)
            ckptr.close()
        ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        ckptr.save(path, _payload(state), force=True)
        _ASYNC[path] = (ckptr, meta)
        return
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _payload(state), force=True)
    _write_meta(path, meta)


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
