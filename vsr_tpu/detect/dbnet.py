"""DBNet text detector in flax — the TPU replacement for the reference's
Paddle-runtime PP-OCRv5 det models (backend/tools/subtitle_detect.py:41-54,
configs backend/models/V5/ch_det*/inference.yml).

Differentiable Binarization (Liao et al., AAAI 2020) structure:
  backbone (4 stages, strides 4/8/16/32) -> DB-FPN (lateral 1x1 to
  ``fpn_channels``, top-down upsample-add, per-level 3x3 to fpn/4 channels,
  upsample-concat) -> DB head (3x3 conv + two 2x transposed convs) producing a
  full-resolution probability map; an identical threshold branch + the
  differentiable binarization sigmoid(k(P-T)) exist for training.

Two presets mirror the reference's server/mobile pair:
  * "server" — ResNet-style residual backbone (2 blocks/stage, 64..512ch)
  * "mobile" — depthwise-separable backbone (LCNet-flavored, 32..256ch)

Weight-level parity with Paddle's PPHGNetV2-B4 / PPLCNetV3 backbones is a
conversion-time concern; this environment ships no .pdiparams blobs (LFS
stripped), so the architecture here is an idiomatic-JAX DBNet with the same
contract: BGR image, ImageNet normalization, resize_long=960 buckets, prob map
in [0,1] at input resolution, postprocess thresh/box_thresh/unclip identical.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

_PAD1 = ((1, 1), (1, 1))


class _ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class _ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = _ConvBN(self.features, 3, self.stride, dtype=self.dtype, name="c1")(x, train)
        y = _ConvBN(self.features, 3, 1, act=False, dtype=self.dtype, name="c2")(y, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ConvBN(self.features, 1, self.stride, act=False,
                               dtype=self.dtype, name="down")(x, train)
        return nn.relu(y + identity)


class _DWSepBlock(nn.Module):
    """Depthwise-separable block for the mobile preset."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(x.shape[-1], 3, self.stride, groups=x.shape[-1],
                    dtype=self.dtype, name="dw")(x, train)
        x = _ConvBN(self.features, 1, 1, dtype=self.dtype, name="pw")(x, train)
        return x


class DetBackbone(nn.Module):
    """4-stage backbone returning features at strides 4, 8, 16, 32."""

    preset: str = "server"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        if self.preset == "server":
            widths, blocks, block_cls = (64, 128, 256, 512), 2, _ResidualBlock
        else:
            widths, blocks, block_cls = (32, 64, 128, 256), 1, _DWSepBlock
        # stem: stride 4
        x = _ConvBN(widths[0] // 2, 3, 2, dtype=self.dtype, name="stem0")(x, train)
        x = _ConvBN(widths[0], 3, 2, dtype=self.dtype, name="stem1")(x, train)
        feats = []
        for stage, width in enumerate(widths):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = block_cls(width, stride, dtype=self.dtype,
                              name=f"s{stage}b{b}")(x, train)
            feats.append(x)
        return feats


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


class DBFPN(nn.Module):
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        lat = lambda name: nn.Conv(self.out_channels, (1, 1), use_bias=False,
                                   dtype=self.dtype, param_dtype=jnp.float32,
                                   name=name)
        in5 = lat("in5")(c5)
        in4 = lat("in4")(c4) + _upsample_nearest(in5, 2)
        in3 = lat("in3")(c3) + _upsample_nearest(in4, 2)
        in2 = lat("in2")(c2) + _upsample_nearest(in3, 2)
        quarter = self.out_channels // 4
        smooth = lambda name: nn.Conv(quarter, (3, 3), padding=_PAD1,
                                      use_bias=False, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        p5 = _upsample_nearest(smooth("p5")(in5), 8)
        p4 = _upsample_nearest(smooth("p4")(in4), 4)
        p3 = _upsample_nearest(smooth("p3")(in3), 2)
        p2 = smooth("p2")(in2)
        return jnp.concatenate([p5, p4, p3, p2], axis=-1)  # stride 4


class DBBranch(nn.Module):
    """conv3x3-BN-relu -> deconv2x-BN-relu -> deconv2x -> sigmoid (full res)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 4
        x = nn.Conv(c, (3, 3), padding=_PAD1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="up1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn2")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="up2")(x)
        return nn.sigmoid(x)


class DBNet(nn.Module):
    preset: str = "server"  # "server" | "mobile"
    fpn_channels: int = 256
    k: float = 50.0  # DB steepness (training)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.backbone = DetBackbone(self.preset, self.dtype)
        self.neck = DBFPN(self.fpn_channels, self.dtype)
        self.prob_head = DBBranch(self.dtype)
        self.thresh_head = DBBranch(self.dtype)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: [B, H, W, 3] normalized. Returns prob map [B, H, W, 1];
        in train mode also threshold and approximate-binary maps."""
        feats = self.backbone(images.astype(self.dtype), train)
        fused = self.neck(feats, train)
        prob = self.prob_head(fused, train)
        if not train:
            return prob
        thresh = self.thresh_head(fused, train)
        binary = nn.sigmoid(self.k * (prob - thresh))
        return prob, thresh, binary
