"""PP-OCRv5 detection necks in flax: RSEFPN (mobile) and LKPAN (server).

Weight-level reconstructions of PaddleOCR's public neck graphs
(ppocr/modeling/necks/db_fpn.py RSEFPN/LKPAN and necks/intracl.py
IntraCLBlock) so converted reference checkpoints
(backend/models/V5/ch_det*/inference.yml) reproduce probability maps:

  * mobile — RSEFPN(out_channels=96, shortcut=True)
  * server — LKPAN(out_channels=256, mode="large", intracl=True)

Both consume the backbone's four stride-4/8/16/32 feature maps and emit the
stride-4 fused map of ``out_channels`` channels (4 x out/4 concat).

Layout notes:
  * all convs are NHWC; Paddle nearest-upsample with integer scale equals
    jnp.repeat along H and W (align_mode is a no-op for nearest);
  * RSE squeeze-excite uses det_mobilenet_v3.SEModule's hard-sigmoid
    (slope 0.2, offset 0.5);
  * module names mirror Paddle's parameter program (ins_conv_{i},
    inp_conv_{i}, pan_head_conv_{i}, pan_lat_conv_{i}, incl{1..4}) so the
    converter mapping is mechanical (convert/paddle_dbnet.py).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=-3)
    return jnp.repeat(x, factor, axis=-2)


def _conv(features: int, kernel, name: str, bias: bool = True,
          stride: int = 1, dtype=jnp.float32) -> nn.Conv:
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    return nn.Conv(
        features, (kh, kw), strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        use_bias=bias, dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class SEModule(nn.Module):
    """det_mobilenet_v3.SEModule: pool -> 1x1 relu -> 1x1 hardsigmoid(0.2)."""

    channels: int
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = _conv(self.channels // self.reduction, 1, "conv1",
                    dtype=self.dtype)(att)
        att = nn.relu(att)
        att = _conv(self.channels, 1, "conv2", dtype=self.dtype)(att)
        att = jnp.clip(att * 0.2 + 0.5, 0.0, 1.0)
        return x * att


class RSELayer(nn.Module):
    """conv (no bias) + residual squeeze-excite (db_fpn.RSELayer)."""

    features: int
    kernel: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _conv(self.features, self.kernel, "in_conv", bias=False,
                  dtype=self.dtype)(x)
        se = SEModule(self.features, dtype=self.dtype, name="se_block")(x)
        return x + se if self.shortcut else se


class IntraCLBlock(nn.Module):
    """Intra-class compactness block (ppocr/modeling/necks/intracl.py).

    Three cascaded multi-branch stages (kxk + kx1 + 1xk at k=7,5,3) on a
    reduce_factor-narrowed stream, then 1x1 back + BN + relu, residual.
    """

    channels: int
    reduce_factor: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rc = self.channels // self.reduce_factor
        h = _conv(rc, 1, "conv1x1_reduce_channel", dtype=self.dtype)(x)
        for k in (7, 5, 3):
            c = _conv(rc, k, f"c_layer_{k}x{k}", dtype=self.dtype)(h)
            v = _conv(rc, (k, 1), f"v_layer_{k}x1", dtype=self.dtype)(h)
            q = _conv(rc, (1, k), f"q_layer_1x{k}", dtype=self.dtype)(h)
            h = h + c + v + q
        rel = _conv(self.channels, 1, "conv1x1_return_channel",
                    dtype=self.dtype)(h)
        rel = nn.BatchNorm(use_running_average=True, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn")(rel)
        return x + nn.relu(rel)


class RSEFPN(nn.Module):
    """PP-OCRv5 mobile det neck (db_fpn.RSEFPN)."""

    out_channels: int = 96
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        ins = [
            RSELayer(self.out_channels, 1, self.shortcut, self.dtype,
                     name=f"ins_conv_{i}")(c)
            for i, c in enumerate((c2, c3, c4, c5))
        ]
        in2, in3, in4, in5 = ins
        out4 = in4 + _upsample_nearest(in5, 2)
        out3 = in3 + _upsample_nearest(out4, 2)
        out2 = in2 + _upsample_nearest(out3, 2)
        quarter = self.out_channels // 4
        p5 = RSELayer(quarter, 3, self.shortcut, self.dtype,
                      name="inp_conv_3")(in5)
        p4 = RSELayer(quarter, 3, self.shortcut, self.dtype,
                      name="inp_conv_2")(out4)
        p3 = RSELayer(quarter, 3, self.shortcut, self.dtype,
                      name="inp_conv_1")(out3)
        p2 = RSELayer(quarter, 3, self.shortcut, self.dtype,
                      name="inp_conv_0")(out2)
        p5 = _upsample_nearest(p5, 8)
        p4 = _upsample_nearest(p4, 4)
        p3 = _upsample_nearest(p3, 2)
        return jnp.concatenate([p5, p4, p3, p2], axis=-1)


class LKPAN(nn.Module):
    """PP-OCRv5 server det neck (db_fpn.LKPAN, mode='large', intracl)."""

    out_channels: int = 256
    intracl: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        quarter = self.out_channels // 4
        ins = [
            _conv(self.out_channels, 1, f"ins_conv_{i}", bias=False,
                  dtype=self.dtype)(c)
            for i, c in enumerate((c2, c3, c4, c5))
        ]
        in2, in3, in4, in5 = ins
        out4 = in4 + _upsample_nearest(in5, 2)
        out3 = in3 + _upsample_nearest(out4, 2)
        out2 = in2 + _upsample_nearest(out3, 2)
        # 9x9 large-kernel per-level convs (mode='large': plain Conv2D)
        f5 = _conv(quarter, 9, "inp_conv_3", bias=False, dtype=self.dtype)(in5)
        f4 = _conv(quarter, 9, "inp_conv_2", bias=False, dtype=self.dtype)(out4)
        f3 = _conv(quarter, 9, "inp_conv_1", bias=False, dtype=self.dtype)(out3)
        f2 = _conv(quarter, 9, "inp_conv_0", bias=False, dtype=self.dtype)(out2)
        # bottom-up PAN path: stride-2 3x3 heads + 9x9 laterals
        pan3 = f3 + _conv(quarter, 3, "pan_head_conv_0", bias=False, stride=2,
                          dtype=self.dtype)(f2)
        pan4 = f4 + _conv(quarter, 3, "pan_head_conv_1", bias=False, stride=2,
                          dtype=self.dtype)(pan3)
        pan5 = f5 + _conv(quarter, 3, "pan_head_conv_2", bias=False, stride=2,
                          dtype=self.dtype)(pan4)
        p2 = _conv(quarter, 9, "pan_lat_conv_0", bias=False,
                   dtype=self.dtype)(f2)
        p3 = _conv(quarter, 9, "pan_lat_conv_1", bias=False,
                   dtype=self.dtype)(pan3)
        p4 = _conv(quarter, 9, "pan_lat_conv_2", bias=False,
                   dtype=self.dtype)(pan4)
        p5 = _conv(quarter, 9, "pan_lat_conv_3", bias=False,
                   dtype=self.dtype)(pan5)
        if self.intracl:
            p2 = IntraCLBlock(quarter, 2, self.dtype, name="incl1")(p2)
            p3 = IntraCLBlock(quarter, 2, self.dtype, name="incl2")(p3)
            p4 = IntraCLBlock(quarter, 2, self.dtype, name="incl3")(p4)
            p5 = IntraCLBlock(quarter, 2, self.dtype, name="incl4")(p5)
        p5 = _upsample_nearest(p5, 8)
        p4 = _upsample_nearest(p4, 4)
        p3 = _upsample_nearest(p3, 2)
        return jnp.concatenate([p5, p4, p3, p2], axis=-1)
