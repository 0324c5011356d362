"""PP-OCRv5 detection head in flax: PFHeadLocal.

Weight-level reconstruction of PaddleOCR's det_db_head.py head used by both
PP-OCRv5 det models (backend/models/V5/ch_det*/inference.yml):

  PFHeadLocal = DBHead's binarize Head (conv3x3+BN/relu -> deconv2x+BN/relu
  -> deconv2x -> sigmoid) + a LocalModule calibration branch over the
  upsampled pre-logit feature concatenated with the shrink map; inference
  output is 0.5 * (base_map + cbn_map).

  mode "large" (server): LocalModule(in/4 -> in/4)
  mode "small" (mobile): LocalModule(in/4 -> in/8)

The thresh branch (training-time differentiable binarization) mirrors
binarize; Paddle inference exports drop it, so the converter treats it as
optional (convert/paddle_dbnet.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class DBBranchHead(nn.Module):
    """det_db_head.Head: 3 stages from stride-4 features to a full-res map."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_f: bool = False):
        c = self.in_channels // 4
        x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv_bn1")(x)
        x = nn.relu(x)
        # k2 s2 deconvs: stride == kernel, every output pixel has exactly one
        # tap, so flax SAME == paddle p0 here; transpose_kernel matches the
        # paddle/torch (in, out, kh, kw) layout after conversion
        x = nn.ConvTranspose(c, (2, 2), strides=(2, 2), use_bias=True,
                             transpose_kernel=True, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="conv_bn2")(x)
        x = nn.relu(x)
        f = x
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), use_bias=True,
                             transpose_kernel=True, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv3")(x)
        x = nn.sigmoid(x)
        if return_f:
            return x, f
        return x


class LocalModule(nn.Module):
    """det_db_head.LocalModule: conv-BN-relu over [shrink_map, f] + 1x1."""

    mid_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, init_map):
        out = jnp.concatenate([init_map, x], axis=-1)
        out = nn.Conv(self.mid_channels, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="last_3_conv")(out)
        out = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="last_3_bn")(out)
        out = nn.relu(out)
        return nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="last_1")(out)


def _upsample_nearest2(x):
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


class PFHeadLocal(nn.Module):
    """PP-OCRv5 det head (det_db_head.PFHeadLocal).

    __call__(fuse [B, H/4, W/4, C]) -> prob map [B, H, W, 1] in [0,1]
    (inference: 0.5 * (base + cbn)). With train=True additionally returns
    (base, cbn, thresh, binary) for DB training.
    """

    in_channels: int
    mode: str = "small"  # "large" (server) | "small" (mobile)
    k: float = 50.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.binarize = DBBranchHead(self.in_channels, self.dtype)
        self.thresh = DBBranchHead(self.in_channels, self.dtype)
        mid = self.in_channels // (4 if self.mode == "large" else 8)
        self.cbn_layer = LocalModule(mid, self.dtype)

    def __call__(self, fuse, train: bool = False):
        base, f = self.binarize(fuse, return_f=True)
        cbn = nn.sigmoid(self.cbn_layer(_upsample_nearest2(f), base))
        maps = 0.5 * (base + cbn)
        if not train:
            return maps
        thresh = self.thresh(fuse)
        binary = nn.sigmoid(self.k * (base - thresh))
        return maps, base, cbn, thresh, binary
