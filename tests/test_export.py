"""AOT export (jax.export) roundtrip — the Deploy/TorchScript analog."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_export_aot_roundtrip(tmp_path):
    from jax import export as jexport

    from hd_yolo_tpu.engines.evaluate import export_aot
    from hd_yolo_tpu.models import Model

    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64)
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False, compute_masks=True)

    path = str(tmp_path / "model.jaxexport")
    export_aot(m, variables, (1, 128, 128, 3), path)

    with open(path, "rb") as f:
        restored = jexport.deserialize(f.read())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
    out = restored.call(variables, img)
    want = m.apply(variables, img, train=False, compute_masks=True)[1]
    np.testing.assert_allclose(
        np.asarray(out["det"]["boxes"]), np.asarray(want["det"]["boxes"]), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["det"]["valid"]), np.asarray(want["det"]["valid"])
    )
