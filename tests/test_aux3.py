"""Sharded WSI inference, hnet classification header, watchdog scanning."""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_slide_inference_sharded_mesh():
    from hd_yolo_tpu.parallel import create_mesh
    from hd_yolo_tpu.wsi import slide_inference_sharded

    mesh = create_mesh()
    assert mesh.devices.size == 8

    @jax.jit
    def forward(tiles):
        B = tiles.shape[0]
        # per-tile mean brightness as a fake score; one det per tile
        score = jnp.mean(tiles, axis=(1, 2, 3))
        return {
            "boxes": jnp.tile(jnp.asarray([[10.0, 10.0, 40.0, 40.0]]), (B, 1, 1)),
            "scores": score[:, None],
            "labels": jnp.ones((B, 1), jnp.int32),
            "valid": jnp.ones((B, 1), bool),
        }

    rng = np.random.default_rng(0)
    slide = jnp.asarray(rng.uniform(0, 1, (256, 512, 3)).astype(np.float32))
    out = slide_inference_sharded(
        forward, slide, mesh, tile=128, overlap=0, batch_per_device=1, max_total=64
    )
    # grid: 2 rows x 4 cols = 8 tiles; all 8 boxes distinct in slide coords
    assert out["valid"].sum() == 8
    ys = sorted({int(b[1]) for b in out["boxes"][out["valid"]]})
    assert ys == [10, 138]


def test_hnet_classification_header(rng):
    from hd_yolo_tpu.hnet import HNet

    cfg = {
        "backbone": {"type": "swin", "embed_dim": 16, "depths": [1, 1], "num_heads": [1, 2],
                     "window_size": 4},
        "fpn": {"out_channels": 16},
        "headers": {"cl5x": {"type": "cl", "num_classes": 3, "hidden": 32}},
    }
    m = HNet.from_cfg(cfg)
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    targets = {"cl5x": {"label": jnp.asarray([0, 1, 2, -100])}}
    v = m.init(jax.random.PRNGKey(0), x, targets, train=False)
    losses, out = m.apply(v, x, targets, train=False)
    assert np.isfinite(float(losses["cl5x"]["cl_loss"]))
    assert out["cl5x"]["probs"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(out["cl5x"]["probs"]).sum(-1), 1.0, atol=1e-5)


def test_watchdog_find_resumable(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import watchdog

    # run A: unfinished (epoch 3 of 10); run B: finished
    for name, epoch in (("expA", 3), ("expB", 9)):
        d = tmp_path / name / "last"
        d.mkdir(parents=True)
        (d / "meta.json").write_text(json.dumps({"epoch": epoch, "best_fitness": 0.1}))
    out = watchdog.find_resumable(str(tmp_path), target_epochs=10)
    assert [os.path.basename(p) for p, _ in out] == ["expA"]
    # raising the target makes B resumable too
    out = watchdog.find_resumable(str(tmp_path), target_epochs=20)
    assert len(out) == 2
