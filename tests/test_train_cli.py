"""End-to-end training CLI: synthetic dataset → 2 epochs → checkpoints,
logs, resume."""

import json
import os

import cv2
import numpy as np
import pytest
import yaml


def make_dataset(tmp_path, n_images=4, task="det"):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_images):
        img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / f"img{i}.png"), img)
        boxes = np.array([[10, 10, 45, 45], [50, 50, 90, 88]], np.float32)
        polys = np.empty(2, object)
        for j, b in enumerate(boxes):
            polys[j] = [np.array([[b[0], b[1]], [b[2], b[1]], [b[2], b[3]], [b[0], b[3]]])]
        np.savez(tmp_path / f"ann{i}.npz", boxes=boxes, labels=np.array([1, 2]),
                 masks=polys, size=np.array([96, 96]))
        rows.append(f"img{i}.png,im{i},a{i},ann{i}.npz,{task},poly")
    csv = tmp_path / "index.csv"
    csv.write_text("image_path,image_id,ann_id,ann_path,task_id,mask_mode\n" + "\n".join(rows) + "\n")
    data_yaml = tmp_path / "data.yaml"
    meta = {task: {"labels_text": {1: "tumor", 2: "stromal", 3: "sTILs", 4: "other"}}}
    data_yaml.write_text(yaml.safe_dump({"train": str(csv), "val": str(csv), "tasks": [task],
                                         "meta_info": meta}))
    return str(data_yaml)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    from hd_yolo_tpu.engines.train import argument_parser, train

    data = make_dataset(tmp_path)
    save_dir = str(tmp_path / "run")
    opt = argument_parser().parse_args(
        [
            "--data", data, "--cfg", "yolov5s-test", "--hyp", "hyp-nuclei",
            "--epochs", "2", "--batch-size", "2", "--img-size", "128",
            "--patch-size", "96", "--masks", "--no-bf16", "--workers", "2",
            "--max-targets", "16", "--mask-rois", "4", "--max-masks", "8",
            "--save-dir", save_dir, "--plots",
        ]
    )
    result = train(opt)
    assert "best_fitness" in result
    assert os.path.isdir(os.path.join(save_dir, "last"))
    assert os.path.isdir(os.path.join(save_dir, "final"))
    # --plots observability artifacts (ref train.py:303-308 + plots.py)
    assert os.path.isfile(os.path.join(save_dir, "labels.jpg"))
    assert os.path.isfile(os.path.join(save_dir, "results.png"))
    assert os.listdir(os.path.join(save_dir, "display_dataset"))
    lines = open(os.path.join(save_dir, "results.json")).read().strip().splitlines()
    assert len(lines) == 2
    row = json.loads(lines[-1])
    assert row["epoch"] == 1 and np.isfinite(row["loss"])

    # resume: third epoch continues from checkpoint
    opt.epochs = 3
    opt.resume = True
    train(opt)
    lines = open(os.path.join(save_dir, "results.json")).read().strip().splitlines()
    assert json.loads(lines[-1])["epoch"] == 2


@pytest.mark.slow
def test_inference_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.engines.checkpoint import load_inference, save_inference
    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState
    from hd_yolo_tpu.models import Model

    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=4, max_masks=8, pre_nms_topk=64)
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False, compute_masks=True)
    tx = build_optimizer(variables["params"], {}, 1, 1)
    state = TrainState.create(variables, tx)
    path = str(tmp_path / "ckpt")
    save_inference(path, state, use_ema=True)
    restored = load_inference(path)
    _, out = m.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        x, train=False, compute_masks=True,
    )
    assert out["det"]["boxes"].shape == (1, 300, 4)


@pytest.mark.slow
def test_train_cli_multiscale_pretrain_val(tmp_path):
    """--multi-scale (bucketized size jitter) + --pretrain-val flags
    (ref train.py:72-80,368-375,447-452) run end-to-end."""
    from hd_yolo_tpu.engines.train import argument_parser, train

    data = make_dataset(tmp_path)
    save_dir = str(tmp_path / "run_ms")
    opt = argument_parser().parse_args(
        [
            "--data", data, "--cfg", "yolov5s-test", "--hyp", "hyp-nuclei",
            "--epochs", "1", "--batch-size", "2", "--img-size", "128",
            "--patch-size", "96", "--no-bf16", "--workers", "2",
            "--max-targets", "16", "--mask-rois", "4", "--max-masks", "8",
            "--save-dir", save_dir, "--multi-scale", "--pretrain-val",
        ]
    )
    result = train(opt)
    assert "best_fitness" in result
    assert os.path.isdir(os.path.join(save_dir, "final"))


def test_async_checkpoint_roundtrip(tmp_path):
    """AsyncCheckpointer path: save → wait → restore matches the sync path."""
    import jax
    import jax.numpy as jnp

    from hd_yolo_tpu.engines.checkpoint import (
        load_meta,
        restore_train_state,
        save_checkpoint,
        wait_for_saves,
    )
    from hd_yolo_tpu.engines.optim import build_optimizer
    from hd_yolo_tpu.engines.train_step import TrainState

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = build_optimizer(params, {"lr0": 0.01}, 10, 10)
    state = TrainState.create({"params": params, "batch_stats": {}}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    p = str(tmp_path / "ck")
    save_checkpoint(p, state, epoch=3, best_fitness=0.5, async_save=True)
    # a second async save to the same path must first drain the in-flight one
    state2 = state.replace(step=jnp.asarray(8, jnp.int32))
    save_checkpoint(p, state2, epoch=4, best_fitness=0.6, async_save=True)
    wait_for_saves()

    meta = load_meta(p)
    assert meta["epoch"] == 4 and meta["best_fitness"] == 0.6
    fresh = TrainState.create({"params": jax.tree.map(jnp.zeros_like, params),
                               "batch_stats": {}}, tx)
    restored, meta2 = restore_train_state(p, fresh)
    assert int(restored.step) == 8
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    assert meta2["epoch"] == 4
