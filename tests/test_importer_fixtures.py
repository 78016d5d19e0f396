"""Serialized-importer fixtures (VERDICT r2 item 7): the torch→flax import
path is exercised against BYTES ON DISK in the exact upstream key layouts
(reference metayolo, official-ultralytics ``model.{i}``, microsoft/mmdet
swin), with the producing model's own outputs bundled in the fixture — so
this runs without the reference checkout mounted.

Regenerate with ``python tools/make_importer_fixtures.py``.
"""

from pathlib import Path

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

FIXDIR = Path(__file__).parent / "fixtures"
CFG = str(FIXDIR / "tiny2l.yaml")
HYP = "hd_yolo_tpu/configs/hyp-nuclei.yaml"


def _forward_ours(sd):
    from hd_yolo_tpu.config import load_cfg
    from hd_yolo_tpu.models import Model
    from hd_yolo_tpu.models.builder import parse_model_cfg
    from hd_yolo_tpu.utils.import_torch import import_state_dict

    hyp = load_cfg(HYP)
    spec = parse_model_cfg(CFG, hyp)
    variables = import_state_dict(sd, spec)
    model = Model.from_cfg(CFG, hyp, dtype=jnp.float32)
    return model, {"params": variables["params"],
                   "batch_stats": variables["batch_stats"]}


def _check_against_expected(fix):
    sd = {k: v for k, v in fix["state_dict"].items()}
    model, variables = _forward_ours(sd)
    x = jnp.asarray(fix["input_nhwc"].numpy())
    _, out = jax.jit(lambda v, xx: model.apply(
        v, xx, train=False, compute_masks=True))(variables, x)
    o = {k: np.asarray(v) for k, v in out["det"].items()}
    v = o["valid"][0].astype(bool)
    exp = {k: np.asarray(t) for k, t in fix["expected"].items()}
    n_exp = len(exp["boxes"])
    assert abs(int(v.sum()) - n_exp) <= max(1, n_exp // 10), (v.sum(), n_exp)
    n = min(int(v.sum()), n_exp)
    order = np.argsort(-o["scores"][0][v])
    eorder = np.argsort(-exp["scores"])
    np.testing.assert_allclose(o["scores"][0][v][order][:n],
                               exp["scores"][eorder][:n], rtol=1e-3, atol=1e-4)
    # every expected box has an imported twin
    ob = o["boxes"][0][v]
    for j in eorder[:n]:
        d = np.abs(ob - exp["boxes"][j]).max(-1).min()
        assert d < 1.0, (exp["boxes"][j], d)


def test_metayolo_fixture_bytes_to_flax():
    fix = torch.load(FIXDIR / "metayolo_tiny.pt", map_location="cpu",
                     weights_only=False)
    assert any(k.startswith("backbone.0.conv") for k in fix["state_dict"])
    _check_against_expected(fix)


def test_ultralytics_fixture_bytes_to_flax():
    fix = torch.load(FIXDIR / "ultralytics_tiny.pt", map_location="cpu",
                     weights_only=False)
    assert any(k.startswith("model.0.") for k in fix["state_dict"])
    assert any(k.startswith("model.9.") for k in fix["state_dict"])  # Detect row
    _check_against_expected(fix)


def test_swin_fixture_bytes_to_flax(rng):
    from hd_yolo_tpu.hnet.swin import SwinTransformer
    from hd_yolo_tpu.utils.import_swin import import_swin_state_dict

    fix = torch.load(FIXDIR / "swin_tiny.pt", map_location="cpu",
                     weights_only=False)
    sd = fix["state_dict"]
    assert "patch_embed.proj.weight" in sd
    assert "layers.0.blocks.0.attn.relative_position_bias_table" in sd
    params = import_swin_state_dict(sd, depths=(1, 1))
    m = SwinTransformer(embed_dim=32, depths=(1, 1), num_heads=(2, 4),
                        window_size=4, out_indices=(0, 1))
    x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    ref_tree = m.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(ref_tree)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ref_tree)[0]):
        assert np.asarray(a).shape == np.asarray(b).shape, jax.tree_util.keystr(ka)
    outs = m.apply({"params": params}, x)
    assert [tuple(o.shape) for o in outs] == [(1, 8, 8, 32), (1, 4, 4, 64)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
