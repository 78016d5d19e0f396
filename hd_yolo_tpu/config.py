"""Config plane: YAML model/hyp/data configs.

Reproduces the reference's four config planes (SURVEY.md §5.6;
``/root/reference/metayolo/__init__.py:135-144`` ``load_cfg``,
``/root/reference/metayolo/datasets.py:873-889`` ``load_dataset_info``):
  1. model YAML  — depth/width multiples, anchors, backbone/fpn/headers rows
  2. hyp YAML    — lr/momentum/aug params + per-task loss/nms sections
  3. data YAML   — dataset csv paths + tasks + meta_info (labels_text/colors)
  4. CLI argparse — lives in engines/train.py

Model YAML rows follow the reference schema
(``/root/reference/metayolo/models/yolov5.py:85-121``):
``[from, number, module, args, tag?, header_args?]``.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Union

import yaml

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
CONFIG_DIR = os.path.join(_PKG_DIR, "configs")


def load_cfg(cfg: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Load a YAML config by path / bare name (searched in configs/), or pass a dict through."""
    if isinstance(cfg, dict):
        return copy.deepcopy(cfg)
    path = cfg
    if not os.path.isfile(path):
        cand = os.path.join(CONFIG_DIR, path if path.endswith((".yaml", ".yml")) else path + ".yaml")
        if os.path.isfile(cand):
            path = cand
    with open(path, "r", errors="ignore") as f:
        return yaml.safe_load(f)


def load_dataset_info(data_cfg: Union[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Load data YAML; resolve the nested per-task ``meta_info`` yaml if given as a path."""
    cfg = load_cfg(data_cfg)
    meta = cfg.get("meta_info")
    if isinstance(meta, str):
        cfg["meta_info"] = load_cfg(meta)
    return cfg


def save_cfg(cfg: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
