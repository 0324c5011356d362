"""torchvision VGG checkpoint -> flax VGGFeatures params.

torchvision's ``vgg16``/``vgg19`` store the trunk as ``features.{i}`` where
``i`` enumerates conv/relu/pool modules in order — exactly the order of
models.vgg.VGG_NAMES (the reference zips the two in vgg_arch.py:108-119).
``classifier.*`` keys (absent from ``features``-only extractions) are
ignored: perceptual losses never use them.

Used for both the reference PerceptualLoss trunk (loss.py:42-46) and the
LPIPS vgg16 backbone (convert/torch_lpips.py).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

from vsr_tpu.convert.mapping import convert_state_dict
from vsr_tpu.models.vgg import VGG_NAMES


def convert_vgg_state_dict(
    state_dict: Mapping[str, Any],
    vgg_type: str = "vgg19",
    prefix: str = "features",
) -> Dict[str, Any]:
    import re

    names = VGG_NAMES[vgg_type]
    rules = [
        (re.escape(prefix) + rf"\.{i}", name, "conv2d")
        for i, name in enumerate(names)
        if name.startswith("conv")
    ]
    trunk_only = {
        k: v for k, v in state_dict.items() if k.startswith(f"{prefix}.")
    }
    return convert_state_dict(trunk_only, rules)


def load_vgg_checkpoint(path: str, vgg_type: str = "vgg19") -> Dict[str, Any]:
    import torch

    return convert_vgg_state_dict(torch.load(path, map_location="cpu"),
                                  vgg_type)
