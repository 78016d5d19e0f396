"""Weight importer parity: a torch trunk (reference layout/naming) and the
flax model must produce numerically identical features after import."""

import numpy as np
import pytest
import torch

from hd_yolo_tpu.models.builder import parse_model_cfg
from hd_yolo_tpu.utils.import_torch import import_state_dict
from hd_yolo_tpu.utils.torch_baseline import TorchTrunk


def reference_state_dict(trunk: TorchTrunk):
    """Rename TorchTrunk keys ('blocks.{i}', 'det.{l}') into the reference
    layout ('backbone.{i}' / 'neck.{j}' / 'headers.{tag}.m.{l}')."""
    spec = trunk.spec
    sd = {}
    for k, v in trunk.state_dict().items():
        if k.startswith("blocks."):
            i = int(k.split(".")[1])
            rest = k.split(".", 2)[2]
            if i < spec.n_backbone:
                sd[f"backbone.{i}.{rest}"] = v
            else:
                sd[f"neck.{i - spec.n_backbone}.{rest}"] = v
        elif k.startswith("det."):
            l = int(k.split(".")[1])
            rest = k.split(".", 2)[2]
            sd[f"headers.{spec.headers[0].tag}.m.{l}.{rest}"] = v
        else:
            sd[k] = v
    return sd


@pytest.mark.slow
def test_trunk_parity_after_import(rng):
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.models import Model

    spec = parse_model_cfg("yolov5s-test", "hyp-nuclei")
    trunk = TorchTrunk(spec).eval()
    # randomize BN running stats so the test exercises them
    for m in trunk.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
            m.eps = 1e-3  # match reference production constant

    sd = reference_state_dict(trunk)
    imported = import_state_dict(sd, spec)

    model = Model(spec=spec)
    x_np = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    # flax: trunk features + raw det conv outputs
    def det_outputs(mdl, x):
        feats = mdl.trunk(x, train=False)
        h = mdl.spec.headers[0]
        header = mdl.headers[h.tag]
        return [header.det_convs[l](feats[j]) for l, j in enumerate(h.from_idx)]

    variables = {"params": imported["params"], "batch_stats": imported["batch_stats"]}
    flax_outs = model.apply(variables, jnp.asarray(x_np), method=det_outputs)

    with torch.inference_mode():
        torch_outs = trunk(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))

    assert len(flax_outs) == len(torch_outs)
    for fo, to in zip(flax_outs, torch_outs):
        got = np.asarray(fo)  # NHWC
        want = to.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_deconv_import_parity(rng):
    """flax ConvTranspose vs torch ConvTranspose2d after layout conversion."""
    import jax.numpy as jnp
    from flax import linen as nn

    from hd_yolo_tpu.utils.import_torch import _deconv

    t = torch.nn.ConvTranspose2d(8, 8, 2, 2)
    x = rng.uniform(0, 1, (1, 6, 6, 8)).astype(np.float32)
    with torch.inference_mode():
        want = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    m = nn.ConvTranspose(8, (2, 2), strides=(2, 2))
    params = {"kernel": _deconv({"x.weight": t.weight, "x.bias": t.bias}, "x")["kernel"],
              "bias": t.bias.detach().numpy()}
    got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_renumber_ultralytics_layout():
    from hd_yolo_tpu.utils.import_torch import renumber_ultralytics

    sd = {
        "model.0.conv.weight": 1, "model.9.cv1.conv.weight": 2,
        "model.24.m.0.weight": 3, "model.24.m.0.bias": 4,
    }
    out = renumber_ultralytics(sd)
    assert out["model_layer.0.conv.weight"] == 1
    assert out["model_layer.9.cv1.conv.weight"] == 2
    assert out["headers.det.m.0.weight"] == 3  # last index = Detect row


def test_top_level_lazy_api():
    import hd_yolo_tpu

    assert hd_yolo_tpu.Model.__name__ == "Model"
    assert hd_yolo_tpu.Detector.__name__ == "Detector"
