"""GOLDEN parity of the hnet stack vs the ACTUAL reference hnet code.

Round 3 pinned the metayolo half against the real reference
(test_reference_golden.py); this file does the same for the hnet half:
``refshim/`` grew timm/mmcv/mmdet shims so ``/root/reference/hnet`` —
``swin_transformer.py``, ``detection/mask_rcnn.py`` — imports and executes
unmodified on CPU, and these tests share weights bit-for-bit between the
reference torch modules and this repo's flax counterparts.

Reference anchors: swin_transformer.py:439-608 (SwinTransformer),
detection/mask_rcnn.py, detection/utils_det.py.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from hd_yolo_tpu.utils.reference_oracle import (enable_reference,
                                                reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module", autouse=True)
def _ref():
    enable_reference()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


def _ref_swin(**kw):
    from hnet.swin_transformer import SwinTransformer as RefSwin

    torch.manual_seed(0)
    m = RefSwin(**kw)
    m.init_weights()
    m.eval()
    return m


def _flax_from_ref(ref, depths, **kw):
    from hd_yolo_tpu.hnet.swin import SwinTransformer
    from hd_yolo_tpu.utils.import_swin import import_swin_state_dict

    params = import_swin_state_dict(dict(ref.state_dict()), depths=depths)
    return SwinTransformer(depths=depths, **kw), params


def test_swin_backbone_golden_vs_reference(rng):
    """flax Swin with weights imported from the REAL reference
    swin_transformer.SwinTransformer matches its pyramid features."""
    depths, heads = (2, 2), (2, 4)
    ref = _ref_swin(embed_dim=32, depths=list(depths), num_heads=list(heads),
                    window_size=4, drop_path_rate=0.0, out_indices=(0, 1))
    x = rng.uniform(-1.0, 1.0, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    m, params = _flax_from_ref(ref, depths, embed_dim=32, num_heads=heads,
                               window_size=4, out_indices=(0, 1))
    outs = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(outs) == len(want)
    for got, w in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), w.numpy(),
            rtol=2e-4, atol=2e-4)


def test_swin_backbone_golden_ragged_size(rng):
    """Same, at a spatial size NOT divisible by the window (pad + shifted-
    window mask path on both sides)."""
    depths, heads = (2, 2), (2, 4)
    ref = _ref_swin(embed_dim=32, depths=list(depths), num_heads=list(heads),
                    window_size=4, drop_path_rate=0.0, out_indices=(0, 1))
    # 56x72 -> patch4 -> 14x18: needs padding to 16x20 windows
    x = rng.uniform(-1.0, 1.0, (1, 3, 56, 72)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))

    m, params = _flax_from_ref(ref, depths, embed_dim=32, num_heads=heads,
                               window_size=4, out_indices=(0, 1))
    outs = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for got, w in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), w.numpy(),
            rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------- MaskRCNN
def _ref_maskrcnn(num_classes=5, in_channels=256):
    """Build the REAL reference MaskRCNN (box-only: its mask/keypoint
    construction references undefined MaskPredictor/KeypointPredictor —
    upstream dead code, see PARITY.md)."""
    from hnet.detection.mask_rcnn import MaskRCNN as RefMaskRCNN

    torch.manual_seed(0)
    config = {
        "roi_size": [256, 256],
        "target_size": [256, 256],
        "in_channels": in_channels,
        "num_classes": num_classes,
        "feature_maps": {"0": "0", "1": "1"},
        "rpn_params": {"anchor": {"sizes": [[32], [64]],
                                  "aspect_ratios": [[0.5, 1.0, 2.0]] * 2}},
    }
    m = RefMaskRCNN(config)
    m.eval()
    return m


def _feats(rng, in_channels=256):
    f0 = rng.standard_normal((1, in_channels, 64, 64)).astype(np.float32)
    f1 = rng.standard_normal((1, in_channels, 32, 32)).astype(np.float32)
    return f0, f1


def test_maskrcnn_anchor_generator_golden(rng):
    """flax generate_anchors == the REAL reference AnchorGenerator subclass
    (utils_det.py:220-240) on the same grids/strides."""
    from hd_yolo_tpu.hnet.mask_rcnn import generate_anchors

    ref = _ref_maskrcnn()
    f0, f1 = _feats(rng)
    want = ref.rpn.anchor_generator(
        (256, 256), [torch.from_numpy(f0), torch.from_numpy(f1)])[0].numpy()
    got = np.concatenate([
        np.asarray(a) for a in generate_anchors(
            [(64, 64), (32, 32)], (4.0, 8.0), (32.0, 64.0), (0.5, 1.0, 2.0))
    ])
    np.testing.assert_allclose(got, want, atol=1e-4)


def _flax_maskrcnn(num_classes=5):
    from hd_yolo_tpu.hnet.mask_rcnn import MaskRCNN

    return MaskRCNN(num_classes=num_classes - 1, strides=(4.0, 8.0),
                    anchor_sizes=(32.0, 64.0), with_masks=False,
                    pre_nms_topk=512, num_proposals=64, num_detections=32)


def _import_params(ref):
    from hd_yolo_tpu.utils.import_maskrcnn import import_maskrcnn_state_dict

    return import_maskrcnn_state_dict(dict(ref.state_dict()))


def test_maskrcnn_rpn_head_golden(rng):
    """flax RPNHead with transplanted reference weights reproduces the raw
    objectness/deltas of the REAL reference rpn.head bit-for-bit (incl. the
    concat_box_prediction_layers flattening order)."""
    from hd_yolo_tpu.hnet.mask_rcnn import RPNHead

    enable_reference()
    import torchvision.models.detection as tmdet

    ref = _ref_maskrcnn()
    f0, f1 = _feats(rng)
    with torch.no_grad():
        obj_levels, delta_levels = ref.rpn.head(
            [torch.from_numpy(f0), torch.from_numpy(f1)])
        want_obj, want_delta = tmdet.rpn.concat_box_prediction_layers(
            obj_levels, delta_levels)

    params = _import_params(ref)["rpn_head"]
    m = RPNHead(3)
    got_obj, got_delta = m.apply(
        {"params": params},
        [jnp.asarray(f0.transpose(0, 2, 3, 1)),
         jnp.asarray(f1.transpose(0, 2, 3, 1))])
    np.testing.assert_allclose(np.asarray(got_obj).reshape(-1),
                               want_obj.numpy().reshape(-1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_delta).reshape(-1, 4),
                               want_delta.numpy(), rtol=1e-4, atol=1e-5)


def test_maskrcnn_box_head_golden(rng):
    """flax BoxHead (fc6/fc7 + predictors) with transplanted weights matches
    the reference box_head+box_predictor on the same pooled ROIs (NCHW→NHWC
    column permutation covered by the importer)."""
    from hd_yolo_tpu.hnet.mask_rcnn import BoxHead

    ref = _ref_maskrcnn()
    rois = rng.standard_normal((12, 256, 7, 7)).astype(np.float32)
    with torch.no_grad():
        feats = ref.roi_heads.box_head(torch.from_numpy(rois))
        want_cls, want_reg = ref.roi_heads.box_predictor(feats)

    params = _import_params(ref)["box_head"]
    m = BoxHead(5)
    got_cls, got_reg = m.apply({"params": params},
                               jnp.asarray(rois.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_cls), want_cls.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_reg).reshape(12, -1),
                               want_reg.numpy(), rtol=1e-4, atol=1e-5)


def test_maskrcnn_box_pipeline_containment(rng):
    """End-to-end box branch on SHARED proposals + transplanted weights:
    every detection the flax RoI stage emits exists in the REAL reference
    RoIHeads' candidate set (same box to 1e-2 px, same label, same score) —
    pins pooling (level mapper + ROI-align), box decode, clipping and score
    math through the reference's own code path.  (The two NMS stages differ
    by design: argmax-class per proposal here vs all-classes flattened
    there, so containment rather than equality.)"""
    from hd_yolo_tpu.hnet.mask_rcnn import MaskRCNN

    ref = _ref_maskrcnn()
    # keep every reference candidate: no score/NMS/topk filtering
    ref.roi_heads.score_thresh = -1.0
    ref.roi_heads.nms_thresh = 1.0
    ref.roi_heads.detections_per_img = 100000

    f0, f1 = _feats(rng)
    R = 24
    xy = rng.uniform(0, 200, (R, 2)).astype(np.float32)
    wh = rng.uniform(8, 56, (R, 2)).astype(np.float32)
    proposals = np.concatenate([xy, xy + wh], 1)

    with torch.no_grad():
        feats_t = {"0": torch.from_numpy(f0), "1": torch.from_numpy(f1)}
        dets, _ = ref.roi_heads(feats_t, [torch.from_numpy(proposals)],
                                [(256, 256)], targets=None)
        cand = np.concatenate(
            [dets[0]["boxes"].numpy(),
             dets[0]["scores"].numpy()[:, None],
             dets[0]["labels"].numpy()[:, None].astype(np.float32)], 1)

    m = _flax_maskrcnn()
    params = _import_params(ref)
    variables = {"params": params}
    out = m.apply(
        variables,
        [jnp.asarray(f0.transpose(0, 2, 3, 1)),
         jnp.asarray(f1.transpose(0, 2, 3, 1))],
        jnp.asarray(proposals)[None],
        jnp.ones((1, R), bool),
        (256, 256),
        method=MaskRCNN._inference,
    )
    got_boxes = np.asarray(out["boxes"][0])
    got_scores = np.asarray(out["scores"][0])
    got_labels = np.asarray(out["labels"][0])
    got_valid = np.asarray(out["valid"][0])

    n_checked = 0
    for b, s, l, v in zip(got_boxes, got_scores, got_labels, got_valid):
        if not v:
            continue
        n_checked += 1
        same_label = cand[cand[:, 5] == l]
        assert len(same_label), f"label {l} absent from reference candidates"
        d_box = np.abs(same_label[:, :4] - b).max(1)
        d_score = np.abs(same_label[:, 4] - s)
        assert ((d_box < 1e-2) & (d_score < 1e-4)).any(), (
            f"no reference candidate matches box={b} score={s} label={l}; "
            f"closest box diff {d_box.min()}, score diff {d_score.min()}")
    assert n_checked >= 5, f"only {n_checked} valid detections to check"


def test_hnet_trunk_golden_vs_reference(rng):
    """Swin backbone + FPN(P6P7) trunk: flax with weights imported from the
    REAL reference HNet matches all 6 pyramid levels (incl. the
    LastLevelP6P7 use_P5 path, P6 = conv(P5))."""
    from hnet.hnet import HNet

    torch.manual_seed(0)
    configs = {
        "transform": {"min_size": 128, "max_size": 128,
                      "image_mean": [0.0] * 3, "image_std": [1.0] * 3},
        "backbone": {"type": "swin", "configs": {
            "embed_dim": 96, "depths": [2, 2, 6, 2],
            "num_heads": [3, 6, 12, 24], "window_size": 7,
            "drop_path_rate": 0.0, "out_indices": (0, 1, 2, 3)}},
        "neck": {"type": "fpn", "configs": {"out_channels": 256}},
        "headers": {"det": {"type": "MaskRCNN", "configs": {
            "roi_size": (128, 128), "target_size": (128, 128),
            "num_classes": 3,
            "rpn_params": {"anchor": {
                "sizes": [[16], [32], [64], [128], [256], [512]],
                "aspect_ratios": [[0.5, 1.0, 2.0]] * 6}}}}},
        "constrains": None,
    }
    ref = HNet(configs)
    ref.eval()

    x = rng.uniform(0.0, 1.0, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        feats = ref.backbone(torch.from_numpy(x))
        want = ref.fpn(feats)  # BasicFPN wraps the tuple itself

    from hd_yolo_tpu.hnet.fpn import FeaturePyramidNetwork
    from hd_yolo_tpu.hnet.swin import SwinTransformer
    from hd_yolo_tpu.utils.import_maskrcnn import import_fpn_state_dict
    from hd_yolo_tpu.utils.import_swin import import_swin_state_dict

    sd = dict(ref.state_dict())
    swin_params = import_swin_state_dict(
        {k[len("backbone."):]: v for k, v in sd.items()
         if k.startswith("backbone.")}, depths=(2, 2, 6, 2))
    fpn_params = import_fpn_state_dict(sd, prefix="fpn.")

    swin = SwinTransformer()
    fpn = FeaturePyramidNetwork(out_channels=256, extra_blocks=2)
    levels = swin.apply({"params": swin_params},
                        jnp.asarray(x.transpose(0, 2, 3, 1)))
    outs = fpn.apply({"params": fpn_params}, levels)

    assert len(outs) == len(want) == 6
    # 2e-3 abs on unit-scale features: f32 accumulation noise through the
    # full 28-block Swin-T + FPN (oneDNN vs XLA reduction orders); the
    # 4-block Swin golden above holds 2e-4
    for got, (name, w) in zip(outs, want.items()):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), w.numpy(),
            rtol=1e-3, atol=2e-3, err_msg=f"level {name}")


@pytest.mark.slow
def test_reference_hnet_full_stack_executes(rng):
    """The ACTUAL reference HNet (GeneralizedTransform → Swin-T → FPN(P6P7)
    → MaskRCNN header, hnet/hnet.py:105-265) constructs and runs a full
    train-branch forward on CPU through refshim — losses finite, detection
    outputs schema-correct.  Guards the shim surface (timm/mmcv/tmdet.rpn/
    roi_heads/poolers + the builtins accommodations for the upstream
    tmdet/nn/deep_update bugs) against regressions."""
    from hnet.hnet import HNet

    torch.manual_seed(0)
    configs = {
        "transform": {"min_size": 256, "max_size": 256,
                      "image_mean": [0.0] * 3, "image_std": [1.0] * 3},
        "backbone": {"type": "swin", "configs": {
            "embed_dim": 96, "depths": [2, 2, 6, 2],
            "num_heads": [3, 6, 12, 24], "window_size": 7,
            "drop_path_rate": 0.0, "out_indices": (0, 1, 2, 3)}},
        "neck": {"type": "fpn", "configs": {"out_channels": 256}},
        # tuple roi_size: the reference treats a LIST [256,256] as per-image
        # sizes in extract_roi_feature_maps (utils.py:101-105)
        "headers": {"det": {"type": "MaskRCNN", "configs": {
            "roi_size": (256, 256), "target_size": (256, 256),
            "num_classes": 5,
            "rpn_params": {"anchor": {
                "sizes": [[16], [32], [64], [128], [256], [512]],
                "aspect_ratios": [[0.5, 1.0, 2.0]] * 6}}}}},
        "constrains": None,
    }
    m = HNet(configs)
    m.eval()

    img = torch.from_numpy(rng.uniform(0, 1, (3, 256, 256)).astype(np.float32))
    targets = [{
        "size": torch.tensor([256.0, 256.0]),
        "anns": {"det": [{
            "roi": torch.tensor([0.0, 0.0, 256.0, 256.0]),
            "size": torch.tensor([256.0, 256.0]),
            "boxes": torch.tensor([[50.0, 50.0, 120.0, 120.0],
                                   [140.0, 30.0, 200.0, 90.0]]),
            "labels": torch.tensor([1, 3]),
        }]},
    }]
    with torch.no_grad():
        losses, outputs = m([img], targets=targets)

    assert {"det_loss_classifier", "det_loss_box_reg"} <= set(losses)
    assert all(torch.isfinite(v) for v in losses.values())
    det = outputs["det"]
    assert isinstance(det, list) and len(det) == 1
    assert {"boxes", "scores", "labels"} <= set(det[0])
    assert det[0]["boxes"].shape[1] == 4
