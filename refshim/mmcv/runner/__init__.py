"""mmcv.runner shim: minimal ``load_checkpoint`` (used only by the reference
Swin's ``init_weights(pretrained=...)`` path)."""

import torch


def load_checkpoint(model, filename, map_location="cpu", strict=False,
                    logger=None):
    ckpt = torch.load(filename, map_location=map_location)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    # strip a DataParallel/mm-style 'module.'/'backbone.' prefix if present
    for prefix in ("module.", "backbone."):
        if all(k.startswith(prefix) for k in state_dict):
            state_dict = {k[len(prefix):]: v for k, v in state_dict.items()}
    model.load_state_dict(state_dict, strict=strict)
    return ckpt
