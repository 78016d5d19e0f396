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

    # Old torch let ``t.new([scalar_tensor, scalar_tensor])`` build a tensor
    # from 0-d tensor elements; torch>=2 rejects the list (the reference's
    # hnet/transform.py:119,124 relies on the old behavior).  Unwrap 0-d
    # tensors to python scalars before delegating.
    if not getattr(torch.Tensor.new, "_hdyolo_compat", False):
        orig_new = torch.Tensor.new

        def new_compat(self, *args, **kwargs):
            if (len(args) == 1 and isinstance(args[0], (list, tuple))
                    and any(isinstance(v, torch.Tensor) for v in args[0])):
                args = ([v.item() if isinstance(v, torch.Tensor) else v
                         for v in args[0]],)
            return orig_new(self, *args, **kwargs)

        new_compat._hdyolo_compat = True
        torch.Tensor.new = new_compat

    # The reference pins its model-parallel placement with unconditional
    # ``.cuda(k)`` calls on modules (hnet/hnet.py:176-178) AND on tensors
    # mid-forward (hnet.py:221,226); make both no-ops on a CUDA-less host so
    # the reference runs on CPU as the oracle (its cross-GPU hops collapse
    # to same-device copies, numerically identical).
    if not torch.cuda.is_available():
        if not getattr(torch.nn.Module.cuda, "_hdyolo_compat", False):
            def cuda_compat(self, device=None):
                return self

            cuda_compat._hdyolo_compat = True
            torch.nn.Module.cuda = cuda_compat
        if not getattr(torch.Tensor.cuda, "_hdyolo_compat", False):
            def tcuda_compat(self, device=None, **kwargs):
                return self

            tcuda_compat._hdyolo_compat = True
            torch.Tensor.cuda = tcuda_compat

    # Upstream bug accommodation: hnet/detection/utils_det.py uses ``tmdet``
    # (line 220) and ``nn`` (line 240) without importing them anywhere in its
    # wildcard-import chain (hnet/utils.py binds neither) — the module cannot
    # import under ANY torchvision.  The reference tree is read-only, so seed
    # the names into builtins (module-global name resolution falls back
    # there), the minimal patch that lets the reference's own code run
    # verbatim.  A proper ``import`` in any module always shadows these.
    import builtins

    if not hasattr(builtins, "tmdet"):
        import torchvision.models.detection as _tmdet

        builtins.tmdet = _tmdet
    if not hasattr(builtins, "nn"):
        builtins.nn = torch.nn
    # ``deep_update`` (utils_det.py:81,92,95; hnet.py:161) is likewise never
    # defined anywhere in the reference tree; its call sites imply the
    # standard recursive in-place dict merge.
    if not hasattr(builtins, "deep_update"):
        def _deep_update(base, override):
            for k, v in (override or {}).items():
                if isinstance(v, dict) and isinstance(base.get(k), dict):
                    _deep_update(base[k], v)
                else:
                    base[k] = v
            return base

        builtins.deep_update = _deep_update


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
