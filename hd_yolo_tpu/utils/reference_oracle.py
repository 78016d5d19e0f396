"""Run the ACTUAL reference (`/root/reference`, impromptuRong/hd_yolo) on CPU
as a golden oracle and measured baseline.

The reference only fails to import because torchvision / torch_scatter (and a
few aux libs) are absent from this image; ``refshim/`` re-implements exactly
that public surface (SURVEY.md §2.3).  ``enable_reference()`` puts the shims
and the reference root on ``sys.path`` so ``import metayolo`` etc. work
unmodified.  Used by ``tests/test_reference_golden.py`` and
``tools/reference_baseline.py`` (VERDICT r2 item 1)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[2]
SHIM_DIR = REPO_ROOT / "refshim"
REFERENCE_ROOT = Path(os.environ.get("HD_YOLO_REFERENCE", "/root/reference"))

_enabled = False


def reference_available() -> bool:
    return (REFERENCE_ROOT / "metayolo" / "__init__.py").exists()


def enable_reference() -> bool:
    """Idempotently wire shims + reference onto sys.path.  Returns False when
    the read-only reference checkout is not mounted (e.g. CI elsewhere)."""
    global _enabled
    if _enabled:
        return True
    if not reference_available():
        return False
    # never write .pyc into the read-only reference tree
    sys.dont_write_bytecode = True
    shim = str(SHIM_DIR)
    ref = str(REFERENCE_ROOT)
    if shim not in sys.path:
        # shims first: nothing else provides these modules, but keep them
        # ahead of any site dir that might grow partial installs later
        sys.path.insert(0, shim)
    if ref not in sys.path:
        # appended last so generically-named reference modules (data, train,
        # evaluation) can never shadow repo/stdlib imports
        sys.path.append(ref)
    _apply_torch_compat()
    _enabled = True
    return True


def _apply_torch_compat():
    """The reference was written against an older torch where
    ``long_tensor.clamp(min=0.)`` kept the integer dtype; torch>=2 promotes
    to float, which breaks ``yolo_head.py:348``'s buffer indexing.  Restore
    the historical semantics (dtype-preserving clamp for integer tensors)."""
    import torch

    if getattr(torch.Tensor.clamp, "_hdyolo_compat", False):
        return
    orig = torch.Tensor.clamp

    def clamp_compat(self, min=None, max=None):
        out = orig(self, min=min, max=max)
        if not self.is_floating_point() and out.is_floating_point():
            out = out.to(self.dtype)
        return out

    clamp_compat._hdyolo_compat = True
    torch.Tensor.clamp = clamp_compat

    # torch<2.6 defaulted torch.load(weights_only=False); the reference's
    # build_model (evaluation.py:29) pickles whole Model objects.  Checkpoints
    # here are always produced by this harness itself (trusted).
    orig_load = torch.load

    def load_compat(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return orig_load(*args, **kwargs)

    load_compat._hdyolo_compat = True
    torch.load = load_compat


def import_reference(module: str):
    """enable_reference() + import a reference module by name."""
    if not enable_reference():
        raise ImportError(f"reference checkout not available at {REFERENCE_ROOT}")
    import importlib

    return importlib.import_module(module)


def load_reference_model(cfg="/root/reference/metayolo/hub/yolov5l6-mask.yaml",
                         hyp=str(REPO_ROOT / "hd_yolo_tpu/configs/hyp-nuclei.yaml"),
                         is_scripting: bool = False):
    """Build the reference ``Model`` from a yaml pair.

    YAML parses the hub files' ``[None, 2, 'nearest']`` Upsample rows to the
    STRING 'None' and build_network (yolov5.py:89-96) no longer evals args —
    upstream ran with ultralytics' per-arg eval, so we restore exactly that:
    literal-eval each string arg that isn't a cfg key, leaving everything
    else byte-identical."""
    import ast

    import yaml as _yaml

    yolo = import_reference("metayolo.models.yolo")
    if isinstance(cfg, dict):
        cfg_dict = cfg
    else:
        with open(cfg, encoding="ascii", errors="ignore") as f:
            cfg_dict = _yaml.safe_load(f)
    for section in ("backbone", "fpn", "headers"):
        for row in cfg_dict.get(section, []):
            args = row[3]
            for j, a in enumerate(args):
                if isinstance(a, str) and a not in cfg_dict:
                    try:
                        args[j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass
    return yolo.Model(cfg_dict, hyp, is_scripting=is_scripting)
