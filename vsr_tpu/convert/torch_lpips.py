"""lpips-package checkpoint -> flax LPIPS params.

The lpips package serializes ``net.slice{k}.{i}.*`` (vgg16 trunk split into
five Sequential slices that KEEP torchvision's global ``features`` indices)
plus ``lin{k}.model.1.weight`` 1x1 heads (model.0 is Dropout) and
``scaling_layer.shift/scale`` buffers (constants in models/lpips.py).
Reference usage: lpips.LPIPS(net='vgg') in
backend/inpaint/video/core/loss.py:122.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

from vsr_tpu.convert.mapping import convert_state_dict
from vsr_tpu.models.vgg import VGG_NAMES


def convert_lpips_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    names = VGG_NAMES["vgg16"]
    rules = []
    for i, name in enumerate(names):
        if name.startswith("conv"):
            rules.append((rf"net\.slice\d\.{i}", f"net/{name}", "conv2d"))
    for k in range(5):
        rules.append((rf"lin{k}\.model\.1", f"lin{k}", "conv2d"))
    filtered = {
        k: v for k, v in state_dict.items()
        if not k.startswith("scaling_layer.")
    }
    return convert_state_dict(filtered, rules)


def load_lpips_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return convert_lpips_state_dict(torch.load(path, map_location="cpu"))
