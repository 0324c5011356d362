"""VGG feature extractor for perceptual losses (NHWC, flax).

Parity target: the reference's VGGFeatureExtractor
(backend/inpaint/video/model/vgg_arch.py:51-157) — a truncated torchvision
VGG ``features`` trunk that returns a dict of named intermediate
activations (conv1_1 ... pool5 naming), with optional [-1,1]->[0,1] range
normalization and ImageNet input normalization. Weights come from
torchvision's vgg16/vgg19 checkpoints via convert/torch_vgg.py.

TPU notes: NHWC convs, bf16-friendly (params stay fp32); the whole trunk is
a straight conv chain, fully fusable by XLA — no custom kernels needed.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# Layer-name sequences per VGG flavor (vgg_arch.py NAMES table).
VGG_NAMES = {
    "vgg16": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "pool5",
    ],
    "vgg19": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "conv3_4", "relu3_4", "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "conv4_4", "relu4_4", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "conv5_4", "relu5_4", "pool5",
    ],
}

_WIDTH = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGGFeatures(nn.Module):
    """Truncated VGG trunk returning the requested named activations.

    Input: [B, H, W, 3]. ``layers`` picks the activations to return (any
    names from VGG_NAMES[vgg_type]); the trunk stops at the deepest one.
    """

    layers: Tuple[str, ...]
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        names = VGG_NAMES[self.vgg_type]
        for req in self.layers:
            assert req in names, (req, self.vgg_type)
        last = max(names.index(l) for l in self.layers)

        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std
        x = x.astype(self.dtype)

        out: Dict[str, jnp.ndarray] = {}
        for name in names[: last + 1]:
            if name.startswith("conv"):
                x = nn.Conv(_WIDTH[name[4]], (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=name)(x)
            elif name.startswith("relu"):
                x = nn.relu(x)
            else:  # pool
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if name in self.layers:
                out[name] = x
        return out
