"""Color-augmentation parity vs the ACTUAL reference image_utils (VERDICT r3
item 7): random_hsv replay-exact, ColorJitter vs the runnable reference ops,
and a pin on the upstream NameError that breaks its contrast/saturation."""

import random

import numpy as np
import pytest

from hd_yolo_tpu.data import augment
from hd_yolo_tpu.utils.reference_oracle import (enable_reference,
                                                reference_available)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module", autouse=True)
def _ref():
    enable_reference()
    # the reference targets the pre-0.16 skimage API where dtype_limits was
    # re-exported at top level; alias it so adjust_* can run at all
    import skimage
    import skimage.util

    if not hasattr(skimage, "dtype_limits"):
        skimage.dtype_limits = skimage.util.dtype_limits


@pytest.fixture()
def img():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)


def test_random_hsv_replays_reference_exactly(img):
    """Same RNG stream → bit-identical output to image_utils.random_hsv
    (including its hardcoded 50% coin that ignores p, :600)."""
    from metayolo.engines import image_utils as iu

    for seed in range(6):
        random.seed(seed)
        np.random.seed(seed)
        ref = iu.random_hsv(img.copy(), hgain=0.2, sgain=0.7, vgain=0.4, p=1.0)
        random.seed(seed)
        np.random.seed(seed)
        ours = augment.random_hsv(img.copy(), hgain=0.2, sgain=0.7,
                                  vgain=0.4, p=0.5)
        np.testing.assert_array_equal(ref, ours, err_msg=f"seed {seed}")


def test_adjust_brightness_matches_reference(img):
    from metayolo.engines import image_utils as iu

    for f in (0.4, 1.0, 1.6):
        np.testing.assert_array_equal(iu.adjust_brightness(img, f),
                                      augment.adjust_brightness(img, f))


def test_adjust_hue_matches_reference(img):
    """cv2-float vs skimage hsv round-trips agree to 1 uint8 step."""
    from metayolo.engines import image_utils as iu

    for f in (-0.15, 0.0, 0.1):
        ref = iu.adjust_hue(img, f).astype(np.int16)
        ours = augment.adjust_hue(img, f).astype(np.int16)
        assert np.abs(ref - ours).max() <= 1
        assert np.abs(ref - ours).mean() < 0.05


def test_reference_contrast_saturation_are_broken_upstream(img):
    """image_utils.adjust_contrast/saturation reference an rgb2gray that is
    never defined/imported (:16 imports only gray2rgb) — the reference's
    'jitter' color mode NameErrors on any contrast/saturation draw.  Pinned
    here so the intended-semantics divergence below is auditable."""
    from metayolo.engines import image_utils as iu

    with pytest.raises(NameError):
        iu.adjust_contrast(img, 1.2)
    with pytest.raises(NameError):
        iu.adjust_saturation(img, 1.2)


def test_adjust_contrast_saturation_intended_semantics(img):
    """Our versions implement the formula the reference wrote, with
    skimage's rgb2gray (ITU-R 601 luma) supplying the missing name."""
    from skimage.color import rgb2gray

    gray = rgb2gray(img) * 255.0
    for f in (0.5, 1.4):
        want = np.clip(gray.mean() * (1 - f) + img * f, 0, 255).astype(np.uint8)
        np.testing.assert_allclose(augment.adjust_contrast(img, f).astype(int),
                                   want.astype(int), atol=1)
        want = np.clip(gray[..., None] * (1 - f) + img * f, 0, 255).astype(np.uint8)
        np.testing.assert_allclose(
            augment.adjust_saturation(img, f).astype(int),
            want.astype(int), atol=1)


def test_color_jitter_matches_reference_op_chain(img):
    """Apply the same sampled (op, factor) list through the reference's
    random_color_jitter and our adjust functions — restricted to the ops the
    reference can actually run (brightness/hue)."""
    from metayolo.engines import image_utils as iu

    pars = [("brightness", 1.25), ("hue", -0.12), ("brightness", 0.8)]
    ref = iu.random_color_jitter(img.copy(), pars).astype(np.int16)
    ours = img.copy()
    fns = {"brightness": augment.adjust_brightness, "hue": augment.adjust_hue}
    for k, v in pars:
        ours = fns[k](ours, v)
    assert np.abs(ref - ours.astype(np.int16)).max() <= 1


def test_train_proc_color_modes_dispatch(img):
    """hyp['color_aug'] ∈ {hsv, jitter, dodge} all run through the train
    chain (datasets.py:522-539 3-way switch)."""
    ann = {"boxes": np.array([[4.0, 4.0, 30.0, 30.0]], np.float32),
           "labels": np.array([1]), "masks": [None]}
    sq = np.ascontiguousarray(img[:48, :48])
    for mode in ("hsv", "jitter", "dodge"):
        random.seed(0)
        np.random.seed(0)
        out_img, out_ann = augment.train_proc(
            sq, ann, {"color_aug": mode, "translate": 0.05, "scale": 0.1})
        assert out_img.shape == sq.shape and out_img.dtype == np.uint8
        assert out_ann["boxes"].shape[1] == 4
