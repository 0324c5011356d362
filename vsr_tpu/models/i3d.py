"""Inflated 3D Inception (I3D) for VFID evaluation.

Parity with the reference's bundled InceptionI3d
(backend/inpaint/video/core/metrics.py:85-334 usage; full net in the same
module): Inception-v1 inflated to 3D, BN+ReLU conv units, nine Mixed blocks,
400-way logits head. Used as a video feature extractor for the VFID metric
(Frechet distance between real/fake activation Gaussians).

Input: [B, T, H, W, 3] in [-1, 1] (T >= 9 for the temporal poolings at
224x224; smaller eval crops work with proportionally shorter clips).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _same_pads(shape, kernel, stride):
    """TF-'SAME' padding, computed statically from the traced input shape.

    Matches the reference Unit3D/MaxPool3dSamePadding dynamic padding
    (metrics.py:196-218,258-279): total = k - s when the dim divides the
    stride, else k - dim%s; front gets total//2 (back gets the extra pixel,
    unlike the symmetric k//2 rule, which differs for even totals)."""
    pads = []
    for dim, k, s in zip(shape, kernel, stride):
        total = max(k - s, 0) if dim % s == 0 else max(k - dim % s, 0)
        pads.append((total // 2, total - total // 2))
    return tuple(pads)


class Unit3D(nn.Module):
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pads = _same_pads(x.shape[1:4], self.kernel, self.stride)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pads, use_bias=not self.use_bn,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x


def _max_pool_3d(x, kernel, stride):
    pads = _same_pads(x.shape[1:4], kernel, stride)
    # torch F.pad fills with 0 (not -inf) before MaxPool3d, so padded cells
    # can win the max when all inputs are negative — reproduce exactly by
    # padding explicitly first (ref MaxPool3dSamePadding, metrics.py:202-218)
    x = jnp.pad(x, ((0, 0), *pads, (0, 0)))
    return nn.max_pool(x, kernel, strides=stride, padding="VALID")


class InceptionBlock(nn.Module):
    """Four-branch inception module: 1x1 | 1x1->3x3 | 1x1->3x3 | pool->1x1."""

    widths: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b0, b1a, b1b, b2a, b2b, b3 = self.widths
        y0 = Unit3D(b0, dtype=self.dtype, name="b0")(x, train)
        y1 = Unit3D(b1a, dtype=self.dtype, name="b1a")(x, train)
        y1 = Unit3D(b1b, (3, 3, 3), dtype=self.dtype, name="b1b")(y1, train)
        y2 = Unit3D(b2a, dtype=self.dtype, name="b2a")(x, train)
        y2 = Unit3D(b2b, (3, 3, 3), dtype=self.dtype, name="b2b")(y2, train)
        y3 = _max_pool_3d(x, (3, 3, 3), (1, 1, 1))
        y3 = Unit3D(b3, dtype=self.dtype, name="b3")(y3, train)
        return jnp.concatenate([y0, y1, y2, y3], axis=-1)


_MIXED = {
    "mixed_3b": (64, 96, 128, 16, 32, 32),
    "mixed_3c": (128, 128, 192, 32, 96, 64),
    "mixed_4b": (192, 96, 208, 16, 48, 64),
    "mixed_4c": (160, 112, 224, 24, 64, 64),
    "mixed_4d": (128, 128, 256, 24, 64, 64),
    "mixed_4e": (112, 144, 288, 32, 64, 64),
    "mixed_4f": (256, 160, 320, 32, 128, 128),
    "mixed_5b": (256, 160, 320, 32, 128, 128),
    "mixed_5c": (384, 192, 384, 48, 128, 128),
}


class InceptionI3d(nn.Module):
    num_classes: int = 400
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, train: bool = False,
                 features_only: bool = True) -> jnp.ndarray:
        """video [B, T, H, W, 3] in [-1, 1] -> pooled features [B, 1024]
        (features_only) or logits [B, num_classes]."""
        x = video.astype(self.dtype)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=self.dtype,
                   name="conv1a")(x, train)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, dtype=self.dtype, name="conv2b")(x, train)
        x = Unit3D(192, (3, 3, 3), dtype=self.dtype, name="conv2c")(x, train)
        x = _max_pool_3d(x, (1, 3, 3), (1, 2, 2))
        for name in ("mixed_3b", "mixed_3c"):
            x = InceptionBlock(_MIXED[name], self.dtype, name=name)(x, train)
        x = _max_pool_3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("mixed_4b", "mixed_4c", "mixed_4d", "mixed_4e", "mixed_4f"):
            x = InceptionBlock(_MIXED[name], self.dtype, name=name)(x, train)
        x = _max_pool_3d(x, (2, 2, 2), (2, 2, 2))
        for name in ("mixed_5b", "mixed_5c"):
            x = InceptionBlock(_MIXED[name], self.dtype, name=name)(x, train)
        feats = x.mean(axis=(1, 2, 3))  # global avg pool -> [B, 1024]
        if features_only:
            return feats
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          param_dtype=jnp.float32, name="logits")(feats)
        return logits
