"""Multi-task detection dataset: CSV index → padded, TPU-ready batches.

Behavioral reference: ``/root/reference/metayolo/datasets.py:542-870``:
  * CSV rows ``image_path,image_id,ann_id,ann_path,task_id,mask_mode`` with an
    image↔annotation map and an in-memory annotation cache (:562-579),
  * training ``__getitem__``: k×k mosaic of random partner images, per-tile
    color/projective/flip augs, assembly, random crop to ``img_size``,
    small-object filter (:646-724),
  * validation: deterministic resize (center pad/crop under keep_res),
  * ``target_to_tensors``: per-object 28×28 in-box mask crops, normalized
    boxes (:462-519).

TPU-first divergence: instead of ragged per-image target lists + tuple-zip
collate, every sample is padded to ``max_targets`` with a validity mask and
batches are plain stacked arrays — the exact schema the jitted train step
consumes.  Annotation files may be ``.npz`` (native) or ``.pt`` (imported
from the reference's converters).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from collections import defaultdict
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from .. import LOGGER
from .augment import train_proc
from .mask import Mask

Ann = Dict[str, object]


def load_annotation_file(path: str) -> Dict[str, np.ndarray]:
    """Load {boxes, labels, masks, size} from .npz (native) or .pt (torch)."""
    if path.endswith(".npz"):
        z = np.load(path, allow_pickle=True)
        return {k: z[k] for k in z.files}
    if path.endswith((".pt", ".pth")):
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return {
            k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in d.items()
        }
    raise ValueError(f"unsupported annotation format: {path}")


class DetectionDataset:
    """CSV-indexed multi-task dataset producing padded samples."""

    def __init__(
        self,
        data,
        hyp: Dict,
        train: bool = True,
        max_targets: int = 256,
        mask_size: int = 28,
        in_memory: bool = True,
        cache_images: bool = False,
        root: Optional[str] = None,
        host_augment: bool = True,
    ):
        self.hyp = dict(hyp)
        self.train = train
        self.max_targets = max_targets
        self.mask_size = mask_size
        self.img_size = int(self.hyp.get("img_size", 640))
        self.patch_size = int(self.hyp.get("patch_size", self.img_size))
        self.k_mosaic = int(self.hyp.get("k_mosaic", 2)) if train else 1
        self.keep_res = float(self.hyp.get("keep_res", -1))
        self.border = int(self.hyp.get("border", 10))

        self.root = root or "./"
        if isinstance(data, str):
            import pandas as pd

            self.root = root or os.path.dirname(data)
            data = pd.read_csv(data).to_dict("records")
        self.images: List[dict] = []
        self.annotations: List[dict] = []
        self.ann_cache: List[Optional[dict]] = []
        id_map: Dict[object, int] = {}
        for ann_idx, info in enumerate(data):
            image_id = info["image_id"]
            if image_id not in id_map:
                id_map[image_id] = len(self.images)
                self.images.append(
                    {"image_id": image_id, "image_path": info["image_path"], "anns": []}
                )
            img_pos = id_map[image_id]
            self.annotations.append({**info, "image_idx": img_pos})
            self.images[img_pos]["anns"].append(ann_idx)
            self.ann_cache.append(self._load_annotation(ann_idx) if in_memory else None)

        self.task_ids = sorted({a["task_id"] for a in self.annotations})

        # decoded-image RAM cache (ref train.py --cache-images): PNG decode is
        # ~40% of per-sample host time; after the first epoch every read hits
        # RAM.  uint8 RGB ≈ 1.2 MB per 640² tile.
        self.cache_images = bool(cache_images)
        self._img_cache: List[Optional[np.ndarray]] = [None] * len(self.images)

        # raw mode (``--device-augment``): the train __getitem__ skips every
        # host augmentation (mosaic/warp/flips/HSV) and serves a DETERMINISTIC
        # resized tile + padded targets — data/device_augment.py applies the
        # full recipe inside the jitted train step.  Deterministic samples are
        # fully cacheable: with cache_images the steady-state per-sample host
        # cost is a dict of array refs (the 1-core-host fix).
        self.host_augment = bool(host_augment)
        self._sample_cache: List[Optional[dict]] = [None] * len(self.images)

    # ------------------------------------------------------------------ loading
    def __len__(self) -> int:
        return len(self.images)

    def _load_annotation(self, ann_idx: int) -> dict:
        info = self.annotations[ann_idx]
        raw = load_annotation_file(os.path.join(self.root, info["ann_path"]))
        size = tuple(int(s) for s in np.asarray(raw["size"]).reshape(-1)[:2])
        mode = info.get("mask_mode", "poly")
        masks_raw = raw.get("masks", None)
        masks: List[Optional[Mask]] = []
        n = len(np.asarray(raw["boxes"]).reshape(-1, 4))
        if masks_raw is None:
            masks = [None] * n
        else:
            for m in list(masks_raw)[:n]:
                masks.append(Mask(m, size, mode) if m is not None and len(np.atleast_1d(m)) else None)
            masks += [None] * (n - len(masks))
        return {
            "boxes": np.asarray(raw["boxes"], np.float32).reshape(-1, 4),
            "labels": np.asarray(raw["labels"], np.int64).reshape(-1),
            "masks": masks,
            "size": size,
        }

    def get_annotation(self, ann_idx: int) -> dict:
        cached = self.ann_cache[ann_idx]
        return cached if cached is not None else self._load_annotation(ann_idx)

    def load_image_and_target(self, idx: int) -> Tuple[np.ndarray, Dict[str, Ann]]:
        info = self.images[idx]
        img = self._img_cache[idx] if self.cache_images else None
        if img is None:
            img = cv2.imread(os.path.join(self.root, info["image_path"]))
            if img is None:
                raise FileNotFoundError(info["image_path"])
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if self.cache_images:
                img.setflags(write=False)  # shared across threads — keep immutable
                self._img_cache[idx] = img
        if self.cache_images:
            # hand callers a private writable view so in-place ops can't trip
            # on the shared read-only buffer (memcpy ≪ the PNG decode skipped)
            img = img.copy()
        anns: Dict[str, Ann] = {}
        for ann_idx in info["anns"]:
            task = self.annotations[ann_idx]["task_id"]
            a = self.get_annotation(ann_idx)
            if task in anns:  # merge multiple annotation groups (datasets.py:444-459)
                anns[task] = _merge_anns(anns[task], a)
            else:
                anns[task] = {k: (list(v) if k == "masks" else np.copy(v) if isinstance(v, np.ndarray) else v)
                              for k, v in a.items()}
        return img, anns

    # ----------------------------------------------------------------- geometry
    @staticmethod
    def _resize(img: np.ndarray, anns: Dict[str, Ann], size: int):
        h, w = img.shape[:2]
        if (h, w) == (size, size):
            return img, anns
        sy, sx = size / h, size / w
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        out = {}
        for task, a in anns.items():
            boxes = np.asarray(a["boxes"], np.float32) * [sx, sy, sx, sy]
            masks = [m.rescale(sy, sx, (size, size)) if m is not None else None
                     for m in a.get("masks", [None] * len(boxes))]
            out[task] = {"boxes": boxes, "labels": np.asarray(a["labels"]), "masks": masks}
        return img, out

    @staticmethod
    def _rescale(img: np.ndarray, anns: Dict[str, Ann], scale: float):
        """Scale by a fixed factor (keep_res µm/px semantics, datasets.py:668-676)."""
        h, w = img.shape[:2]
        nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
        if (nh, nw) == (h, w):
            return img, anns
        sy, sx = nh / h, nw / w
        img = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out = {}
        for task, a in anns.items():
            boxes = np.asarray(a["boxes"], np.float32) * [sx, sy, sx, sy]
            masks = [m.rescale(sy, sx, (nh, nw)) if m is not None else None
                     for m in a.get("masks", [None] * len(boxes))]
            out[task] = {"boxes": boxes, "labels": np.asarray(a["labels"]), "masks": masks}
        return img, out

    def _pad_or_crop(self, img: np.ndarray, anns: Dict[str, Ann], size: int,
                     pos: str = "center", cval: int = 114):
        """Pad and/or crop to a square ``size`` keeping annotations consistent
        (pad/crop_image_target_if_needed, datasets.py:117-220 semantics)."""
        h, w = img.shape[:2]
        # pad if needed
        ph, pw = max(size - h, 0), max(size - w, 0)
        if ph or pw:
            if pos == "random":
                top = random.randint(0, ph)
                left = random.randint(0, pw)
            else:
                top, left = ph // 2, pw // 2
            canvas = np.full((max(h + ph, size), max(w + pw, size), 3), cval, img.dtype)
            canvas[top : top + h, left : left + w] = img
            img = canvas
            anns = self._shift(anns, top, left, img.shape[:2])
            h, w = img.shape[:2]
        # crop if needed
        ch, cw = max(h - size, 0), max(w - size, 0)
        if ch or cw:
            if pos == "random":
                y0 = random.randint(0, ch)
                x0 = random.randint(0, cw)
            else:
                y0, x0 = ch // 2, cw // 2
            img = img[y0 : y0 + size, x0 : x0 + size]
            anns = self._shift(anns, -y0, -x0, (size, size))
            for a in anns.values():
                a["boxes"] = np.clip(a["boxes"], 0, [size, size, size, size])
        return np.ascontiguousarray(img), anns

    @staticmethod
    def _shift(anns: Dict[str, Ann], dy: int, dx: int, size) -> Dict[str, Ann]:
        out = {}
        for task, a in anns.items():
            boxes = np.asarray(a["boxes"], np.float32) + [dx, dy, dx, dy]
            masks = [m.pad(dy, dx, size) if m is not None else None
                     for m in a.get("masks", [None] * len(boxes))]
            out[task] = {"boxes": boxes, "labels": np.asarray(a["labels"]), "masks": masks}
        return out

    # ---------------------------------------------------------------- get item
    def __getitem__(self, idx: int) -> Dict[str, object]:
        if self.train and not self.host_augment:
            return self._raw_sample(idx)
        if self.train:
            img, anns = self._train_sample(idx)
            # mixup of two mosaics behind hyp['mixup'] (the reference recipe,
            # datasets_masks.py mosaic+mixup path / augmentations.py:271-276)
            if random.random() < float(self.hyp.get("mixup", 0.0)):
                from .augment import mixup

                img2, anns2 = self._train_sample(random.randrange(len(self)))
                img, anns = mixup(img, anns, img2, anns2)
        else:
            img, anns = self.load_image_and_target(idx)
            if self.keep_res > 0:  # fixed µm/px: rescale + center pad/crop
                img, anns = self._rescale(img, anns, self.keep_res)
                img, anns = self._pad_or_crop(img, anns, self.img_size, pos="center")
            else:
                img, anns = self._resize(img, anns, self.img_size)
        return self._to_padded(img, anns)

    def _raw_sample(self, idx: int) -> Dict[str, object]:
        """Device-augment feed: resize-only tile + padded targets, cacheable.

        The small-object filter is left to the device recipe (it must apply
        AFTER the geometric warp, as the host chain does in _to_padded)."""
        cached = self._sample_cache[idx] if self.cache_images else None
        if cached is not None:
            return cached
        img, anns = self.load_image_and_target(idx)
        if self.keep_res > 0:
            img, anns = self._rescale(img, anns, self.keep_res)
            img, anns = self._pad_or_crop(img, anns, self.img_size, pos="center")
        else:
            img, anns = self._resize(img, anns, self.img_size)
        sample = self._to_padded(img, anns, small_filter=False)
        if self.cache_images:
            self._sample_cache[idx] = sample
        return sample

    def _train_sample(self, idx: int):
        k = self.k_mosaic
        size = self.patch_size
        indices = [idx] + random.choices(range(len(self)), k=k * k - 1)
        random.shuffle(indices)
        rows = []
        merged: Dict[str, dict] = defaultdict(lambda: {"boxes": [], "labels": [], "masks": []})
        canvas = np.full((k * size, k * size, 3), 114, np.uint8)
        for rc, img_idx in enumerate(indices):
            r, c = rc // k, rc % k
            img, anns = self.load_image_and_target(img_idx)
            if self.keep_res > 0:  # resolution-preserving tile prep
                img, anns = self._rescale(img, anns, self.keep_res)
                img, anns = self._pad_or_crop(img, anns, size, pos="random")
            else:
                img, anns = self._resize(img, anns, size)
            img, anns = _apply_train_proc(img, anns, self.hyp)
            canvas[r * size : (r + 1) * size, c * size : (c + 1) * size] = img
            shifted = self._shift(anns, r * size, c * size, (k * size, k * size))
            for task, a in shifted.items():
                merged[task]["boxes"].append(a["boxes"])
                merged[task]["labels"].append(a["labels"])
                merged[task]["masks"].extend(a["masks"])
        anns = {
            t: {
                "boxes": np.concatenate(v["boxes"]) if v["boxes"] else np.zeros((0, 4), np.float32),
                "labels": np.concatenate(v["labels"]) if v["labels"] else np.zeros((0,), np.int64),
                "masks": v["masks"],
            }
            for t, v in merged.items()
        }
        # random crop to img_size (datasets.py:697-712)
        H = canvas.shape[0]
        if H > self.img_size:
            y0 = random.randint(0, H - self.img_size)
            x0 = random.randint(0, H - self.img_size)
            canvas = canvas[y0 : y0 + self.img_size, x0 : x0 + self.img_size]
            anns = self._shift(anns, -y0, -x0, (self.img_size, self.img_size))
            for a in anns.values():
                a["boxes"] = np.clip(
                    a["boxes"], 0, [self.img_size, self.img_size, self.img_size, self.img_size]
                )
        return canvas, anns

    def _to_padded(self, img: np.ndarray, anns: Dict[str, Ann],
                   small_filter: bool = True) -> Dict[str, object]:
        """Pad every task's annotations to max_targets; 28×28 in-box masks."""
        H, W = img.shape[:2]
        T, M = self.max_targets, self.mask_size
        targets = {}
        for task in self.task_ids:
            boxes = np.zeros((T, 4), np.float32)
            labels = np.zeros((T,), np.int64)
            masks = np.zeros((T, M, M), np.float32)
            valid = np.zeros((T,), bool)
            a = anns.get(task)
            if a is not None and len(a["boxes"]):
                b = np.asarray(a["boxes"], np.float32)
                l = np.asarray(a["labels"], np.int64)
                keep = ((b[:, 2] - b[:, 0] > 10) & (b[:, 3] - b[:, 1] > 10)
                        if small_filter else np.ones(len(b), bool))  # small-object filter
                b, l = b[keep], l[keep]
                mlist = [m for m, k2 in zip(a["masks"], keep) if k2]
                n = min(len(b), T)
                if len(b) > T:
                    LOGGER.debug(f"truncating {len(b)} targets to {T}")
                boxes[:n] = b[:n] / [W, H, W, H]  # normalized xyxy
                labels[:n] = l[:n]
                valid[:n] = True
                for i in range(n):
                    if mlist[i] is not None:
                        # keep the bilinear-resized float values as soft BCE
                        # targets (ref datasets.py target_to_tensors semantics)
                        masks[i] = mlist[i].box_crop(b[i], M).astype(np.float32)
            targets[task] = {
                "boxes": boxes, "labels": labels, "masks": masks,
                "valid": valid, "active": np.asarray(a is not None),
            }
        # ship raw uint8 (4× less host→device traffic); the model normalizes
        # on device (Model.trunk / HNet.__call__).  Float augmentation
        # outputs keep the legacy /255 host path.
        image = (np.ascontiguousarray(img) if img.dtype == np.uint8
                 else img.astype(np.float32) / 255.0)
        return {"image": image, "targets": targets}


def _merge_anns(a: Ann, b: Ann) -> Ann:
    return {
        "boxes": np.concatenate([np.asarray(a["boxes"]).reshape(-1, 4),
                                 np.asarray(b["boxes"]).reshape(-1, 4)]),
        "labels": np.concatenate([np.asarray(a["labels"]), np.asarray(b["labels"])]),
        "masks": list(a.get("masks", [])) + list(b.get("masks", [])),
        "size": a.get("size"),
    }


def _apply_train_proc(img, anns, hyp):
    from .augment import train_proc_multi

    return train_proc_multi(img, anns, hyp)


def collate_padded(samples: Sequence[Dict[str, object]]) -> Dict[str, object]:
    """Stack padded samples into the train-step batch schema."""
    batch = {"image": np.stack([s["image"] for s in samples])}
    tasks = samples[0]["targets"].keys()
    batch["targets"] = {
        t: {
            k: np.stack([s["targets"][t][k] for s in samples])
            for k in samples[0]["targets"][t]
        }
        for t in tasks
    }
    return batch


class DataLoader:
    """Minimal prefetching loader (InfiniteDataLoader analog, datasets.py:816-846).

    Background threads run ``dataset[i]`` (cv2 releases the GIL for the heavy
    ops); batches come out in order.  ``infinite=True`` reshuffles each epoch.
    """

    def __init__(self, dataset: DetectionDataset, batch_size: int = 8, shuffle: bool = True,
                 workers: int = 4, infinite: bool = False, seed: int = 0,
                 drop_last: bool = True, shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.workers = max(workers, 1)
        self.infinite = infinite
        self.seed = seed
        self.drop_last = drop_last
        # (rank, world): per-process index slice — the DistributedSampler
        # analog (ref datasets.py:859).  All ranks shuffle with the same seed
        # so slices are disjoint and exhaustive.
        self.shard = shard if shard and shard[1] > 1 else None

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard:
            rank, world = self.shard
            n = (n - rank + world - 1) // world
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, epoch: int) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(idx)
        if self.shard:
            rank, world = self.shard
            idx = idx[rank::world]
        if self.drop_last:
            idx = idx[: len(self) * self.batch_size]
        return idx

    def __iter__(self) -> Iterator[Dict[str, object]]:
        epoch = 0
        while True:
            indices = self._epoch_indices(epoch)
            batches = [
                indices[i : i + self.batch_size]
                for i in range(0, len(indices), self.batch_size)
            ]
            q: "queue.Queue" = queue.Queue(maxsize=self.workers * 2)

            def producer(batches=batches):
                with_threads = self.workers > 1
                if with_threads:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(self.workers) as ex:
                        for bidx in batches:
                            samples = list(ex.map(self.dataset.__getitem__, bidx))
                            q.put(collate_padded(samples))
                else:
                    for bidx in batches:
                        q.put(collate_padded([self.dataset[i] for i in bidx]))
                q.put(None)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
            if not self.infinite:
                return
            epoch += 1
