"""Model builder + Detect header tests: spec parsing, golden param counts
(vs ultralytics yolov5l6 per-layer values), jit forward, loss/grad density."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hd_yolo_tpu.models import Model, parse_model_cfg
from hd_yolo_tpu.models.detect_head import one_hot_labels


def make_targets(rng, B, T, nc, task="det"):
    xy = rng.uniform(0.1, 0.6, (B, T, 2)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (B, T, 2)).astype(np.float32)
    return {
        task: {
            "boxes": jnp.asarray(np.concatenate([xy, np.minimum(xy + wh, 1.0)], -1)),
            "labels": jnp.asarray(rng.integers(1, nc + 1, (B, T))),
            "masks": jnp.asarray((rng.uniform(0, 1, (B, T, 28, 28)) > 0.5).astype(np.float32)),
            "valid": jnp.asarray(rng.uniform(0, 1, (B, T)) > 0.2),
        }
    }


@pytest.fixture(scope="module")
def small_model():
    m = Model.from_cfg("yolov5s-test", "hyp-nuclei", mask_rois=8, max_masks=16, pre_nms_topk=256)
    x = jnp.zeros((2, 128, 128, 3))
    rng = np.random.default_rng(0)
    targets = make_targets(rng, 2, 16, 4)
    vars_ = m.init(jax.random.PRNGKey(0), x, targets, train=True, compute_masks=True)
    return m, vars_


def test_spec_parsing():
    spec = parse_model_cfg("yolov5s-test", "hyp-nuclei")
    assert spec.n_backbone == 10
    assert len(spec.headers) == 1
    h = spec.headers[0]
    assert h.tag == "det" and h.nc == 4
    assert h.from_idx == (17, 20, 23)
    assert h.strides == (8.0, 16.0, 32.0)
    assert h.in_channels == (128, 256, 512)  # width 0.5
    assert dict(h.nms_params)["conf_thres"] == 0.15
    # every header from-index must be in the save list
    assert all(j in spec.save for j in h.from_idx)


def test_one_hot_labels():
    lab = jnp.asarray([-100, 0, 1, 4])
    oh = np.asarray(one_hot_labels(lab, 4))
    assert oh.shape == (4, 5)
    np.testing.assert_array_equal(oh.argmax(-1), [0, 0, 1, 4])


def test_forward_losses_finite(small_model):
    m, vars_ = small_model
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    targets = make_targets(rng, 2, 16, 4)
    (losses, _), _ = m.apply(
        vars_, x, targets, train=True, compute_masks=True, mutable=["batch_stats"]
    )
    l = losses["det"]
    assert np.isfinite(float(l["det_loss"])) and float(l["det_loss"]) > 0
    assert np.isfinite(float(l["mask_loss"]))
    for k in ("box", "obj", "cls", "mask"):
        assert np.isfinite(float(l["loss_items"][k])), k


def test_inference_outputs(small_model):
    m, vars_ = small_model
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    _, out = m.apply(vars_, x, train=False, compute_masks=True)
    o = out["det"]
    assert o["boxes"].shape == (2, 300, 4)
    assert o["scores"].shape == (2, 300)
    assert o["score_vector"].shape == (2, 300, 5)
    assert o["masks"].shape == (2, 16, 28, 28)
    # labels: valid slots are 1..nc or −100
    lab = np.asarray(o["labels"])
    v = np.asarray(o["valid"])
    assert set(np.unique(lab[v])) <= set([-100, 1, 2, 3, 4])
    assert np.all(lab[~v] == -100)
    # boxes inside a sane range
    assert np.isfinite(np.asarray(o["boxes"])).all()


def test_packed_mask_branch_matches_unpacked(small_model):
    """mask_budget (occupancy packing) must reproduce the per-image-capacity
    path exactly while the batch's eligible detections fit the budget; under
    a too-small budget only the lowest-scored detections lose masks."""
    m, vars_ = small_model
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    mk = lambda **kw: Model.from_cfg(
        "yolov5s-test", "hyp-nuclei", mask_rois=8, max_masks=16,
        pre_nms_topk=256, mask_window=8, **kw)
    _, ref = mk().apply(vars_, x, train=False, compute_masks=True)
    _, packed = mk(mask_budget=32).apply(vars_, x, train=False,
                                         compute_masks=True)
    r, p = ref["det"], packed["det"]
    np.testing.assert_array_equal(np.asarray(r["mask_valid"]),
                                  np.asarray(p["mask_valid"]))
    mv = np.asarray(r["mask_valid"])
    np.testing.assert_allclose(np.asarray(r["masks"])[mv],
                               np.asarray(p["masks"])[mv], atol=1e-6)
    assert np.all(np.asarray(p["masks"])[~mv] == 0)

    # adversarial: budget below the eligible count keeps only the top-scored
    n_elig = int(mv.sum())
    if n_elig >= 2:
        _, tight = mk(mask_budget=n_elig - 1).apply(vars_, x, train=False,
                                                    compute_masks=True)
        tv = np.asarray(tight["det"]["mask_valid"])
        assert tv.sum() == n_elig - 1
        sc = np.asarray(r["scores"])[:, :16]
        dropped = mv & ~tv
        assert sc[dropped].max() <= sc[tv].min() + 1e-6


def test_jit_forward(small_model):
    m, vars_ = small_model
    fwd = jax.jit(lambda v, x: m.apply(v, x, train=False, compute_masks=True))
    x = jnp.zeros((1, 128, 128, 3))
    _, out = fwd(vars_, x)
    assert out["det"]["boxes"].shape == (1, 300, 4)


def test_grad_tree_dense(small_model):
    """Every task header must contribute to every step's grad tree
    (the JAX answer to DDP find_unused_parameters — SURVEY.md §5.2)."""
    m, vars_ = small_model
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    targets = make_targets(rng, 2, 16, 4)

    def loss_fn(params):
        (losses, _), _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, targets, train=True, compute_masks=True, mutable=["batch_stats"],
        )
        return m.total_loss(losses)

    grads = jax.grad(loss_fn)(vars_["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    bad = [jax.tree_util.keystr(k) for k, g in flat if not np.isfinite(np.asarray(g)).all()]
    assert not bad, f"non-finite grads: {bad[:5]}"
    # det path: every non-mask-branch leaf gets gradient.  The mask branch may
    # legitimately be all-zero at random init (no proposal reaches the
    # mask_iou_t winner threshold — reference behavior, yolo_head.py:258).
    zero_det = [
        jax.tree_util.keystr(k)
        for k, g in flat
        if np.abs(np.asarray(g)).sum() == 0
        and not any(s in jax.tree_util.keystr(k) for s in ("mask_head", "seg"))
    ]
    assert not zero_det, f"zero grads on det path: {zero_det[:8]}"


def test_mask_branch_grads_when_winners_exist():
    """Lowering mask_iou_t must light up the whole mask branch."""
    from hd_yolo_tpu.config import load_cfg

    hyp = load_cfg("hyp-nuclei")
    hyp["det"]["mask_iou_t"] = -1.0  # every object gets a winner
    m = Model.from_cfg("yolov5s-test", hyp, mask_rois=8, max_masks=16, pre_nms_topk=256)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    targets = make_targets(rng, 2, 16, 4)
    vars_ = m.init(jax.random.PRNGKey(0), x, targets, train=True, compute_masks=True)

    def loss_fn(params):
        (losses, _), _ = m.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, targets, train=True, compute_masks=True, mutable=["batch_stats"],
        )
        return m.total_loss(losses)

    grads = jax.grad(loss_fn)(vars_["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    mask_zero = [
        jax.tree_util.keystr(k)
        for k, g in flat
        if "mask_head" in jax.tree_util.keystr(k) and np.abs(np.asarray(g)).sum() == 0
    ]
    assert not mask_zero, f"mask head leaves without grad: {mask_zero}"


def test_no_targets_for_one_image(small_model):
    """Images with zero valid targets must not poison losses (active mask)."""
    m, vars_ = small_model
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32))
    targets = make_targets(rng, 2, 16, 4)
    v = np.asarray(targets["det"]["valid"]).copy()
    v[1] = False
    targets["det"]["valids"] = None
    targets["det"]["valid"] = jnp.asarray(v)
    del targets["det"]["valids"]
    (losses, _), _ = m.apply(
        vars_, x, targets, train=True, compute_masks=True, mutable=["batch_stats"]
    )
    assert np.isfinite(float(losses["det"]["det_loss"]))

    # all targets invalid → zero-ish loss, still finite
    targets["det"]["valid"] = jnp.zeros((2, 16), bool)
    (losses, _), _ = m.apply(
        vars_, x, targets, train=True, compute_masks=True, mutable=["batch_stats"]
    )
    assert np.isfinite(float(losses["det"]["det_loss"]))
    assert np.isfinite(float(losses["det"]["mask_loss"]))


@pytest.mark.slow
def test_flagship_param_golden():
    """Trunk layer param counts must match ultralytics yolov5l6 exactly
    (verified values; reference builds the same trunk, yolov5.py:80-161)."""
    m = Model.from_cfg("yolov5l6-mask", "hyp-nuclei")
    x = jnp.zeros((1, 256, 256, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False, compute_masks=False)
    p = vars_["params"]
    golden = {
        "blocks_0": 7040, "blocks_1": 73984, "blocks_2": 156928, "blocks_3": 295424,
        "blocks_4": 1118208, "blocks_5": 1180672, "blocks_6": 6433792, "blocks_7": 3540480,
        "blocks_8": 5611008, "blocks_9": 7079936, "blocks_10": 9971712, "blocks_11": 2624512,
        "blocks_12": 787968, "blocks_15": 6200832, "blocks_16": 394240, "blocks_19": 2757632,
        "blocks_20": 131584, "blocks_23": 690688, "blocks_24": 590336, "blocks_26": 2495488,
        "blocks_27": 2360320, "blocks_29": 5807616, "blocks_30": 5309952, "blocks_32": 10496000,
    }
    for k, want in golden.items():
        got = sum(q.size for q in jax.tree.leaves(p[k]))
        assert got == want, f"{k}: {got} != {want}"
    trunk = sum(v for v in golden.values())
    assert trunk == 76_116_352


def test_c3_merged12_matches_two_conv_path(monkeypatch):
    """The inference-only merged cv1+cv2 formulation (layers.C3._merged12,
    measured 3.55->3.18 ms on the 160px C3(128,n=3) block, tools/c3_lab.py)
    must be numerically identical to the standard per-branch path in both
    f32 and bf16 — and training must keep the two-conv path so batch-stat
    updates stay per-branch."""
    from hd_yolo_tpu.models.layers import C3

    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 128)),
                    jnp.float32)
    m = C3(128, n=2, dtype=jnp.float32)
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, x, train=True)

    monkeypatch.setenv("HDYOLO_NO_MERGED_CSP", "1")
    want = np.asarray(m.apply(vars_, x, train=False))
    monkeypatch.delenv("HDYOLO_NO_MERGED_CSP")
    got = np.asarray(m.apply(vars_, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    m16 = C3(128, n=2, dtype=jnp.bfloat16)
    want16 = np.asarray(m16.apply(vars_, x, train=False), np.float32)
    monkeypatch.setenv("HDYOLO_NO_MERGED_CSP", "1")
    got16 = np.asarray(m16.apply(vars_, x, train=False), np.float32)
    np.testing.assert_allclose(got16, want16, rtol=1e-6, atol=1e-6)

    # train mode: batch_stats must still update independently per branch
    monkeypatch.delenv("HDYOLO_NO_MERGED_CSP")
    _, mut = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    for name in ("cv1", "cv2"):
        assert not np.allclose(
            np.asarray(mut["batch_stats"][name]["bn"]["mean"]),
            np.asarray(vars_["batch_stats"][name]["bn"]["mean"]))
