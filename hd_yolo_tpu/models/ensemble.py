"""Model ensembling: merge per-task outputs of several models with score
filtering + NMS.

Behavioral reference: ``Ensemble`` (``/root/reference/metayolo/models/
yolo.py:145-204``): run every member, concat per-task boxes/scores/labels/
masks, filter by conf_thres, class-agnostic NMS capped at max_det.

Static-shape version: members emit padded (B, D, ...) arrays; the merge
concatenates along the detection axis and runs the padded NMS kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp

from ..ops.nms import nms_padded

Array = jnp.ndarray

DEFAULT_NMS_PARAMS = {"conf_thres": 0.15, "iou_thres": 0.45, "max_det": 300}


def merge_outputs(
    outputs: Sequence[Dict[str, Array]],
    conf_thres: float = 0.15,
    iou_thres: float = 0.45,
    max_det: int = 300,
) -> Dict[str, Array]:
    """Merge one task's outputs from N models: (B, D_i, ...) dicts → (B, max_det, ...)."""
    cat = {k: jnp.concatenate([o[k] for o in outputs], axis=1)
           for k in ("boxes", "scores", "labels", "valid")}
    has_masks = all("masks" in o for o in outputs)
    if has_masks:
        cat["masks"] = jnp.concatenate([o["masks"] for o in outputs], axis=1)
        cat["mask_valid"] = jnp.concatenate(
            [o.get("mask_valid", o["valid"][:, : o["masks"].shape[1]]) for o in outputs], axis=1
        )

    def per_image(boxes, scores, labels, valid, *mask_args):
        ok = valid & (scores > conf_thres)
        idx, keep = nms_padded(boxes, scores, ok, iou_thres, max_det)
        out = {
            "boxes": jnp.take(boxes, idx, axis=0) * keep[:, None],
            "scores": jnp.take(scores, idx, axis=0) * keep,
            "labels": jnp.where(keep, jnp.take(labels, idx, axis=0), -100),
            "valid": keep,
        }
        if mask_args:
            masks, mvalid = mask_args
            out["masks"] = jnp.take(masks, idx, axis=0) * keep[:, None, None]
            out["mask_valid"] = jnp.take(mvalid, idx, axis=0) & keep
        return out

    args = [cat["boxes"], cat["scores"], cat["labels"], cat["valid"]]
    if has_masks:
        # pad mask arrays up to the detection axis of boxes if members capped masks
        D = cat["boxes"].shape[1]
        masks = cat["masks"]
        mvalid = cat["mask_valid"]
        if masks.shape[1] < D:
            pad = D - masks.shape[1]
            masks = jnp.pad(masks, ((0, 0), (0, pad), (0, 0), (0, 0)))
            mvalid = jnp.pad(mvalid, ((0, 0), (0, pad)))
        args += [masks, mvalid]
    return jax.vmap(per_image)(*args)


class Ensemble:
    """Callable ensemble over (apply_fn, variables) members sharing task ids."""

    def __init__(self, members: Sequence[Any], nms_params: Dict[str, float] = {}):
        self.members = list(members)  # items: (model, variables)
        self.nms_params = {**DEFAULT_NMS_PARAMS, **{k: float(v) for k, v in nms_params.items()}}

    def __call__(self, images: Array, compute_masks: bool = True) -> Dict[str, Dict[str, Array]]:
        per_member: List[Dict[str, Dict[str, Array]]] = []
        for model, variables in self.members:
            _, out = model.apply(variables, images, train=False, compute_masks=compute_masks)
            per_member.append(out)
        task_ids = set().union(*[set(o.keys()) for o in per_member])
        merged = {}
        for t in sorted(task_ids):
            outs = [o[t] for o in per_member if t in o and o[t]]
            if outs:
                merged[t] = merge_outputs(outs, **{
                    "conf_thres": self.nms_params["conf_thres"],
                    "iou_thres": self.nms_params["iou_thres"],
                    "max_det": int(self.nms_params["max_det"]),
                })
        return merged
