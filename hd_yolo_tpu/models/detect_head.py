"""Multi-task Detect header: anchor-based detection + per-ROI instance masks
+ hierarchical label scores.

Behavioral reference: ``Detect`` (``/root/reference/metayolo/models/yolo_head.py:25-511``):
  * per-level 1×1 det convs with focal-style bias init (:111-112, :431-438),
  * sigmoid xywh decode with grid + anchor (:185-213),
  * mask branch: per-level 3×3 convs to ``dim_reduced`` + shared MaskRCNN-style
    head (:114-130),
  * training: anchor/cell matcher + DetLoss + best-IoU-per-object mask loss
    (:216-277), eval: objectness NMS → multiscale ROI-align → mask logits →
    hierarchical scores → label/threshold logic (:301-355, :473-511).

TPU-first re-design highlights:
  * all paths are static-shape; NMS/matcher capacities are module knobs
    (``pre_nms_topk``, ``max_masks``, ``mask_rois``) instead of data-dependent
    filtering,
  * grids/anchors are computed with iota at trace time and constant-folded by
    XLA — no persistent grid buffers,
  * the train-time mask-ROI selection hoists the reference's
    roi_align→scatter_max order into select-then-align, which is equivalent
    (only scatter_max winners reach the loss) but pools ≤R instead of ~15R
    ROIs.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import xywh2xyxy, xywhn2xyxy, xyxy2xywh, paired_box_iou
from ..ops.nms import nms_per_image
from ..ops.roi_align import multiscale_roi_align, multiscale_roi_align_batched
from ..ops.scatter import segment_max_with_argmax
from .builder import HeaderSpec
from .layers import ConvBnAct
from .losses import det_loss, get_loss_hyp, seg_loss
from .matcher import match_targets

Array = jnp.ndarray

DEFAULT_NMS_PARAMS = {"conf_thres": 0.15, "iou_thres": 0.45, "max_det": 300}


def one_hot_labels(labels: Array, nc: int) -> Array:
    """Int labels (1..nc; 0 / −100 = unlabeled) → (…, nc+1) one-hot with col 0
    = unlabeled (utils_torch.py:232-238)."""
    return jax.nn.one_hot(jnp.clip(labels, 0, nc), nc + 1)


def _det_bias_init(stride: float, na: int, no: int, nc: int, input_size: float = 640.0):
    """Focal-style prior bias (yolo_head.py:431-438)."""

    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros((na, no), jnp.float32)
        b = b.at[:, 4].add(math.log(8.0 / (input_size / stride) ** 2))
        b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.999999)))
        return b.reshape(shape).astype(dtype)

    return init


class MaskHead(nn.Module):
    """MaskRCNNHeads(256×4) + MaskRCNNPredictor equivalent (yolo_head.py:123-128)."""

    nc_masks: int
    dim_reduced: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(4):
            x = nn.Conv(self.dim_reduced, (3, 3), padding="SAME", dtype=self.dtype, name=f"fcn{i}")(x)
            x = jax.nn.relu(x)
        x = nn.ConvTranspose(
            self.dim_reduced, (2, 2), strides=(2, 2), dtype=self.dtype, name="deconv"
        )(x)
        x = jax.nn.relu(x)
        return nn.Conv(self.nc_masks, (1, 1), dtype=self.dtype, name="logits")(x)


class Detect(nn.Module):
    spec: HeaderSpec
    dtype: Any = jnp.float32
    dim_reduced: int = 256
    mask_output_size: int = 28
    # TPU capacity knobs (static shapes)
    pre_nms_topk: int = 1024   # proposals entering NMS per image
    max_masks: int = 100       # inference mask-branch ROIs per image
    mask_rois: int = 64        # training mask-loss ROIs per image
    # inference mask-pool window (feature px), None = exact canvas einsum;
    # see ops.roi_align.multiscale_roi_align_batched
    mask_window: Any = None
    # occupancy packing: global cross-batch mask-ROI budget.  None = pay
    # pooling+head for all B×max_masks slots (legacy, exact at any
    # occupancy); an int K gathers the top-K valid detections of the WHOLE
    # batch into one flat ROI list before pooling+head, so mask-branch cost
    # scales with K instead of B×max_masks.  Outputs are identical whenever
    # the batch carries ≤ K mask-eligible detections (typical nuclei tiles:
    # ~30-50/img — see OCCUPANCY.json); beyond that, lowest-score detections
    # lose their masks (reference computes masks for all post-NMS keeps,
    # yolo_head.py:279-299, but caps keeps at max_det anyway).
    mask_budget: Any = None

    # ------------------------------------------------------------------ setup
    @property
    def nl(self) -> int:
        return len(self.spec.in_channels)

    @property
    def na(self) -> int:
        return len(self.spec.anchors[0]) // 2

    @property
    def nc(self) -> int:
        return self.spec.nc

    @property
    def no(self) -> int:
        return self.nc + 5

    @property
    def mask_indices_list(self) -> Tuple[int, ...]:
        m = dict(self.spec.masks)
        return tuple(m.get(i, 0) for i in range(self.nc + 1))

    @property
    def nc_masks(self) -> int:
        return (max(self.mask_indices_list) + 1) if self.mask_indices_list else 0

    @property
    def nms_params(self) -> Dict[str, float]:
        p = dict(DEFAULT_NMS_PARAMS)
        p.update(dict(self.spec.nms_params))
        return p

    @property
    def loss_hyp(self) -> dict:
        return get_loss_hyp(dict(self.spec.loss_hyp))

    def _anchors_cells(self) -> List[Array]:
        """Per-level (A, 2) anchors in feature-cell units (yolo_head.py:59)."""
        out = []
        for anchor_row, s in zip(self.spec.anchors, self.spec.strides):
            a = jnp.asarray(anchor_row, jnp.float32).reshape(-1, 2) / s
            out.append(a)
        return out

    def setup(self):
        input_size = float(self.spec.default_input_size or 640)
        self.det_convs = [
            nn.Conv(
                self.na * self.no,
                (1, 1),
                dtype=self.dtype,
                bias_init=_det_bias_init(s, self.na, self.no, self.nc, input_size),
                name=f"det{i}",
            )
            for i, s in enumerate(self.spec.strides)
        ]
        if self.nc_masks > 0:
            self.seg_convs = [
                ConvBnAct(self.dim_reduced, 3, act=True, dtype=self.dtype, name=f"seg{i}")
                for i in range(self.nl)
            ]
            self.mask_head = MaskHead(self.nc_masks, self.dim_reduced, dtype=self.dtype)

    # ---------------------------------------------------------------- forward
    def __call__(
        self,
        features: Sequence[Array],           # per level (B, ny, nx, C)
        targets: Optional[Dict[str, Array]] = None,
        train: bool = False,
        compute_masks: bool = True,
    ):
        """Returns (losses, outputs).

        train=True: losses only (outputs = {}).  targets given + train=False:
        both (validation).  No targets: inference outputs only.  Mirrors the
        3-mode forward of yolo_head.py:132-183.
        """
        compute_masks = compute_masks and self.nc_masks > 0
        dets: List[Array] = []
        for i, f in enumerate(features):
            d = self.det_convs[i](f)
            B, ny, nx, _ = d.shape
            dets.append(d.reshape(B, ny, nx, self.na, self.no))

        seg_feats: List[Array] = []
        if compute_masks:
            seg_feats = [conv(f, train=train) for conv, f in zip(self.seg_convs, features)]

        losses: Dict[str, Array] = {}
        if targets is not None:
            losses = self._compute_losses(dets, seg_feats, targets, compute_masks)

        outputs: Dict[str, Array] = {}
        if not train:
            outputs = self._compute_outputs(dets, seg_feats, compute_masks)
        return losses, outputs

    def _fused_mask_head_ok(self) -> bool:
        """Gate for the fused Pallas mask head (ops/pallas_mask_head.py).

        OPT-IN (HDYOLO_PALLAS_MASKHEAD=1): a Mosaic rejection surfaces at
        the caller's jit compile, so production entry points enable it
        behind a fallback (bench.py tries it in a sacrificial subprocess).
        Numerics: bit-comparable in f32; bf16 differs only by rounding of
        the un-materialized intermediates (tested)."""
        import os

        if os.environ.get("HDYOLO_PALLAS_MASKHEAD", "0") != "1":
            return False
        if self.is_initializing():
            return False
        from ..ops.pallas_stem import _device_ok

        return (
            _device_ok()
            and self.dim_reduced % 128 == 0
            and self.mask_output_size % 2 == 0
            and self.has_variable("params", "mask_head")
        )

    # ----------------------------------------------------------------- decode
    def decode_proposals(self, dets: Sequence[Array]) -> Array:
        """(B, ny, nx, A, no) logits per level → (B, ΣK, no+1) decoded rows
        [cx,cy,w,h,obj,cls...,level] in input pixels (yolo_head.py:185-213)."""
        rows = []
        for i, (det, s) in enumerate(zip(dets, self.spec.strides)):
            B, ny, nx, A, no = det.shape
            y = jax.nn.sigmoid(det.astype(jnp.float32))
            gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
            gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
            grid = jnp.stack([gx, gy], -1)[None, :, :, None, :]  # (1, ny, nx, 1, 2)
            anchor_px = (self._anchors_cells()[i] * s)[None, None, None, :, :]
            xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * s
            wh = (y[..., 2:4] * 2.0) ** 2 * anchor_px
            lvl = jnp.full(y.shape[:-1] + (1,), float(i), jnp.float32)
            rows.append(
                jnp.concatenate([xy, wh, y[..., 4:], lvl], -1).reshape(B, ny * nx * A, no + 1)
            )
        return jnp.concatenate(rows, axis=1)

    # ------------------------------------------------------------- inference
    def hierarchical_scores(self, scores: Array) -> Array:
        """Top-down children cascade: each node's direct children are scaled
        by the (already-cascaded) node score — the semantics of BOTH
        reference variants: ``hierarchical_scores_bfs`` (yolo_head.py:
        493-508) trivially, and the deployed descendants form (:473-479)
        because ``get_descendants`` inserts child entries before their
        parents (post-order), so its in-place multiplies compound bottom-up
        into exactly the cascade product — proven equal on depth-3 trees
        against the real reference code in
        tests/test_reference_golden.py::test_hierarchical_scores_deep_tree.
        Hierarchy rows here must list parents before children (BFS order).
        Default tree: root 0 (objectness) → classes 1..nc."""
        tree = self.hierarchy()
        for node, children in tree:
            idx = jnp.asarray(children)
            scores = scores.at[..., idx].multiply(scores[..., node : node + 1])
        return scores

    def hierarchy(self) -> Tuple[Tuple[int, Tuple[int, ...]], ...]:
        """Label tree: hyp[tag]['hierarchy'] rows [parent, [children...]] —
        e.g. the commented NuCLS tree in yolo_head.py:514-550; defaults to
        root objectness (col 0) → all classes (yolo_head.py:510-511)."""
        if self.spec.hierarchy:
            return self.spec.hierarchy
        return ((0, tuple(range(1, self.nc + 1))),)

    def _compute_outputs(
        self, dets: Sequence[Array], seg_feats: Sequence[Array], compute_masks: bool
    ) -> Dict[str, Array]:
        p = self.nms_params
        preds = self.decode_proposals(dets)
        det = jax.vmap(
            lambda x: nms_per_image(
                x,
                nc=self.nc,
                conf_thres=p["conf_thres"],
                iou_thres=p["iou_thres"],
                max_det=int(p["max_det"]),
                pre_nms_topk=self.pre_nms_topk,
            )
        )(preds)

        scores = self.hierarchical_scores(det["scores"])  # (B, D, 1+nc)
        obj = scores[..., 0]
        cls_scores = jnp.max(scores[..., 1:], axis=-1)
        cls_labels = jnp.argmax(scores[..., 1:], axis=-1)
        confident = cls_scores > p["conf_thres"]
        final_scores = jnp.where(confident, cls_scores, obj)
        labels = jnp.where(confident, cls_labels + 1, -100)  # unclassified → −100
        labels = jnp.where(det["valid"], labels, -100)

        out = {
            "boxes": det["boxes"],
            "scores": final_scores * det["valid"],
            "score_vector": scores,
            "labels": labels,
            "levels": det["extra"][..., 0].astype(jnp.int32),
            "valid": det["valid"],
        }
        if self.spec.multi_label:
            out["multi_labels"] = scores > p["conf_thres"]

        if compute_masks:
            R = min(self.max_masks, int(p["max_det"]))
            boxes_r = det["boxes"][:, :R]   # NMS output is score-ordered
            levels_r = out["levels"][:, :R]
            M = self.mask_output_size // 2
            B = boxes_r.shape[0]
            mask_idx = jnp.asarray(self.mask_indices_list)
            mask_labels = mask_idx[jnp.clip(labels[:, :R], 0, self.nc)]  # −100 → 0
            if self.mask_budget:
                out.update(self._packed_masks(
                    seg_feats, det, boxes_r, levels_r, mask_labels,
                    final_scores[:, :R], M))
                return out
            pooled = multiscale_roi_align_batched(
                list(seg_feats), boxes_r, levels_r, self.spec.strides, M,
                window=self.mask_window,
            )
            if self._fused_mask_head_ok():
                from ..ops.pallas_mask_head import fused_mask_probs

                sel = fused_mask_probs(
                    self.mask_head.variables["params"],
                    pooled.reshape(B * R, M, M, self.dim_reduced),
                    jnp.clip(mask_labels, 0).reshape(B * R),
                ).reshape(B, R, self.mask_output_size, self.mask_output_size)
            else:
                logits = self.mask_head(pooled.reshape(B * R, M, M, self.dim_reduced))
                probs = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(
                    B, R, self.mask_output_size, self.mask_output_size, self.nc_masks
                )
                sel = jnp.take_along_axis(
                    probs, jnp.clip(mask_labels, 0)[..., None, None, None], axis=-1
                )[..., 0]
            sel = sel * (mask_labels >= 0)[..., None, None] * det["valid"][:, :R, None, None]
            out["masks"] = sel          # (B, R, 28, 28) in-box probs
            out["mask_valid"] = det["valid"][:, :R] & (mask_labels >= 0)
        return out

    def _packed_masks(self, seg_feats, det, boxes_r, levels_r, mask_labels,
                      scores_r, M):
        """Occupancy-packed mask branch (see ``mask_budget``): gather the
        top-K mask-eligible detections of the whole batch into one flat ROI
        list, pool + run the head once at size K, scatter back to (B, R)."""
        from ..ops.roi_align import multiscale_roi_align_packed

        B, R = levels_r.shape
        eligible = det["valid"][:, :R] & (mask_labels >= 0)
        K = min(int(self.mask_budget), B * R)
        flat_score = jnp.where(eligible, scores_r, 0.0).reshape(B * R)
        top_s, top_i = jax.lax.top_k(flat_score, K)
        sel_ok = top_s > 0.0                 # padding / ineligible slots
        b_idx = top_i // R
        r_idx = top_i % R

        pooled = multiscale_roi_align_packed(
            list(seg_feats),
            boxes_r.reshape(B * R, 4)[top_i],
            levels_r.reshape(B * R)[top_i],
            b_idx, self.spec.strides, M,
            window=int(self.mask_window or 16),
        )                                    # (K, M, M, C)
        lab_k = jnp.clip(mask_labels.reshape(B * R)[top_i], 0)
        if self._fused_mask_head_ok():
            from ..ops.pallas_mask_head import fused_mask_probs

            sel = fused_mask_probs(
                self.mask_head.variables["params"], pooled, lab_k)
        else:
            logits = self.mask_head(pooled)
            probs = jax.nn.sigmoid(logits.astype(jnp.float32))
            sel = jnp.take_along_axis(
                probs, lab_k[:, None, None, None], axis=-1
            )[..., 0]
        sel = sel * sel_ok[:, None, None]    # (K, 28, 28)

        S = self.mask_output_size
        masks = jnp.zeros((B, R, S, S), sel.dtype).at[b_idx, r_idx].set(sel)
        mask_valid = jnp.zeros((B, R), bool).at[b_idx, r_idx].set(sel_ok)
        return {"masks": masks, "mask_valid": mask_valid & eligible}

    # --------------------------------------------------------------- training
    def _compute_losses(
        self,
        dets: Sequence[Array],
        seg_feats: Sequence[Array],
        targets: Dict[str, Array],
        compute_masks: bool,
    ) -> Dict[str, Array]:
        hyp = self.loss_hyp
        boxes_xyxy_n = targets["boxes"]              # (B, T, 4) normalized xyxy
        tvalid = targets["valid"]                    # (B, T)
        active = targets.get("active", jnp.any(tvalid, axis=-1))
        labels = targets["labels"]
        labels_oh = one_hot_labels(labels, self.nc) if labels.ndim == 2 else labels

        # clip + convert like the reference (yolo_head.py:219: xyxy2xywh(clip))
        boxes_n = xyxy2xywh(jnp.clip(boxes_xyxy_n, 0.0, 1.0))
        B, T = tvalid.shape

        level_shapes = [(d.shape[1], d.shape[2]) for d in dets]
        anchors = self._anchors_cells()
        matches = match_targets(boxes_n, tvalid, anchors, level_shapes, hyp["anchor_t"])

        dloss, items, cand_ious = det_loss(dets, matches, labels_oh, active, hyp, self.nc)

        if compute_masks:
            mloss = self._mask_loss(dets, seg_feats, matches, cand_ious, targets, labels_oh, active)
        else:
            mloss = jnp.zeros_like(dloss)
        items = dict(items)
        items["mask"] = jax.lax.stop_gradient(mloss)
        return {"det_loss": dloss, "mask_loss": mloss, "loss_items": items}

    def _mask_loss(self, dets, seg_feats, matches, cand_ious, targets, labels_oh, active):
        """Best-IoU-proposal-per-object mask loss (yolo_head.py:233-273).

        The proposal quality score is the *pixel-space* IoU between each
        matched candidate's decoded box and its GT box, exactly like the
        reference's paired_box_iou(pred, gt); winners need IoU ≥ 0.8.
        """
        hyp = self.loss_hyp
        B, T = targets["valid"].shape
        input_w = dets[0].shape[2] * self.spec.strides[0]
        input_h = dets[0].shape[1] * self.spec.strides[0]
        gt_boxes_px = targets["boxes"] * jnp.asarray(
            [input_w, input_h, input_w, input_h], jnp.float32
        )  # (B, T, 4) xyxy pixels

        # candidate pred boxes in pixels, per level, from matched rows
        all_iou, all_obj, all_lvl, all_valid = [], [], [], []
        for i, (pi, m) in enumerate(zip(dets, matches)):
            s = self.spec.strides[i]
            pr = pi[m.b, m.gj, m.gi, m.a].astype(jnp.float32)
            pxy = (jax.nn.sigmoid(pr[:, 0:2]) * 2.0 - 0.5 + jnp.stack(
                [m.gi.astype(jnp.float32), m.gj.astype(jnp.float32)], -1
            )) * s
            pwh = (jax.nn.sigmoid(pr[:, 2:4]) * 2.0) ** 2 * m.anchor_wh * s
            pbox = xywh2xyxy(jnp.concatenate([pxy, pwh], -1))
            gt_px = gt_boxes_px.reshape(B * T, 4)[m.obj_idx]
            iou = paired_box_iou(pbox, gt_px)
            mvalid = m.valid & active[m.b]
            all_iou.append(jnp.where(mvalid, iou, -1.0))
            all_obj.append(m.obj_idx)
            all_lvl.append(jnp.full_like(m.obj_idx, i))
            all_valid.append(mvalid)

        iou_cat = jax.lax.stop_gradient(jnp.concatenate(all_iou))
        obj_cat = jnp.concatenate(all_obj)
        lvl_cat = jnp.concatenate(all_lvl)
        valid_cat = jnp.concatenate(all_valid)
        obj_for_seg = jnp.where(valid_cat, obj_cat, B * T)  # dropped

        mask_iou_t = float(hyp.get("mask_iou_t", 0.8))
        best_iou, best_arg = segment_max_with_argmax(iou_cat, obj_for_seg, B * T)
        n_cand = iou_cat.shape[0]
        has_winner = (best_arg < n_cand) & (best_iou >= mask_iou_t)
        win_level = jnp.where(
            has_winner, lvl_cat[jnp.clip(best_arg, 0, n_cand - 1)], 0
        ).reshape(B, T)
        win_ok = has_winner.reshape(B, T) & targets["valid"]

        # top-R winners per image by IoU (capacity cap; reference keeps all)
        R = min(self.mask_rois, T)
        rank_score = jnp.where(win_ok, best_iou.reshape(B, T), -jnp.inf)
        top_iou, top_t = jax.lax.top_k(rank_score, R)  # (B, R)
        roi_valid = jnp.isfinite(top_iou) & (top_iou >= mask_iou_t)

        take = lambda x: jnp.take_along_axis(x, top_t, axis=1)
        roi_boxes = jnp.take_along_axis(gt_boxes_px, top_t[..., None], axis=1)  # (B, R, 4)
        roi_levels = take(win_level)
        roi_masks = jnp.take_along_axis(
            targets["masks"], top_t[..., None, None], axis=1
        )  # (B, R, 28, 28)
        roi_labels_oh = jnp.take_along_axis(labels_oh, top_t[..., None], axis=1)  # (B, R, nc+1)

        M = self.mask_output_size // 2
        pooled = multiscale_roi_align_batched(
            list(seg_feats), roi_boxes, roi_levels, self.spec.strides, M,
            window=self.mask_window,
        )
        logits = self.mask_head(pooled.reshape(B * R, M, M, self.dim_reduced))

        # lowest-level label → mask channel (yolo_head.py:269-272)
        hier_label = jnp.argmax(
            roi_labels_oh * jnp.arange(self.nc + 1, dtype=roi_labels_oh.dtype), axis=-1
        )
        mask_idx = jnp.asarray(self.mask_indices_list)
        mask_labels = mask_idx[hier_label].reshape(B * R)

        return seg_loss(
            logits,
            roi_masks.reshape(B * R, self.mask_output_size, self.mask_output_size),
            mask_labels,
            roi_valid.reshape(B * R),
            hyp,
        )

    # ------------------------------------------------------------- stitching
    @staticmethod
    def merge_outputs(results: Sequence[Dict[str, Array]], rois: Sequence[Sequence[float]]):
        """Offset per-ROI outputs into slide coordinates and concat
        (yolo_head.py:450-463). Host-side helper (variable shapes)."""
        import numpy as np

        boxes = np.concatenate(
            [
                np.asarray(r["boxes"]) + np.array([roi[0], roi[1], roi[0], roi[1]])
                for r, roi in zip(results, rois)
            ]
        )
        out = {"boxes": boxes}
        for k in ("labels", "scores", "valid"):
            if k in results[0]:
                out[k] = np.concatenate([np.asarray(r[k]) for r in results])
        if "masks" in results[0]:
            out["masks"] = np.concatenate([np.asarray(r["masks"]) for r in results])
        return out

    @staticmethod
    def rescale_outputs(r: Dict[str, Array], scale: float = 1.0):
        """Rescale to another amplification (yolo_head.py:465-471)."""
        if scale != 1.0:
            r = dict(r)
            r["boxes"] = r["boxes"] * scale
        return r
