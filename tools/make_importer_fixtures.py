#!/usr/bin/env python3
"""Regenerate the serialized importer fixtures under tests/fixtures/
(VERDICT r2 item 7: the import path must be tested against BYTES ON DISK in
the exact upstream key layouts, not in-process modules).

Each fixture bundles a torch ``state_dict`` with an input tile and the
producing model's outputs, so the test pins bytes → flax numerics end to end
WITHOUT needing /root/reference mounted at test time.

    python tools/make_importer_fixtures.py      # requires /root/reference
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

FIXDIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def main():
    import torch

    from hd_yolo_tpu.utils.reference_oracle import load_reference_model

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # ---- metayolo layout: the ACTUAL reference Model on the tiny yaml
    ref = load_reference_model(cfg=str(FIXDIR / "tiny2l.yaml"),
                               hyp="hd_yolo_tpu/configs/hyp-nuclei.yaml")
    ref.float().eval()
    # spread logits so the fixture has real detections to compare
    g = torch.Generator().manual_seed(11)
    for mi in ref.headers["det"].m:
        b = mi.bias.data.view(3, -1)
        b[:, 4] = torch.randn(b[:, 4].shape, generator=g) * 1.5 - 3.0
        b[:, 5:] = torch.randn(b[:, 5:].shape, generator=g) * 1.5
    with torch.no_grad():
        for p in ref.parameters():
            if p.dim() == 4 and p.shape[-1] > 1:  # keep signal alive (see
                torch.nn.init.kaiming_normal_(     # test_reference_golden)
                    p, mode="fan_in", nonlinearity="relu")
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        _, out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                     compute_masks=True)
    o = out[0]["det"]
    sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    torch.save({
        "state_dict": sd,
        "input_nhwc": torch.from_numpy(x),
        "expected": {k: v.detach().clone() for k, v in o.items()},
    }, FIXDIR / "metayolo_tiny.pt")
    print(f"metayolo_tiny.pt: {len(sd)} keys, "
          f"{len(o['boxes'])} expected detections")

    # ---- ultralytics layout: same weights renamed to model.{i}.* with the
    # Detect row last (official checkpoint convention)
    n_rows = 9  # tiny2l.yaml backbone(7) + fpn(2); Detect row index = 9
    usd = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            i = int(k.split(".")[1])
            usd[f"model.{i}." + k.split(".", 2)[2]] = v
        elif k.startswith("neck."):
            i = int(k.split(".")[1]) + 7
            usd[f"model.{i}." + k.split(".", 2)[2]] = v
        elif k.startswith("headers.det."):
            usd[f"model.{n_rows}." + k.split(".", 2)[2]] = v
    torch.save({"state_dict": usd, "input_nhwc": torch.from_numpy(x),
                "expected": {k: v.detach().clone() for k, v in o.items()}},
               FIXDIR / "ultralytics_tiny.pt")
    print(f"ultralytics_tiny.pt: {len(usd)} keys")

    # ---- swin microsoft/mmdet layout (synthetic weights, exact key schema)
    from test_import_swin import synthetic_torch_swin_sd

    ssd = synthetic_torch_swin_sd(rng=np.random.default_rng(3))
    torch.save({"state_dict": {k: torch.as_tensor(v) for k, v in ssd.items()}},
               FIXDIR / "swin_tiny.pt")
    print(f"swin_tiny.pt: {len(ssd)} keys")


if __name__ == "__main__":
    main()
