"""PP-OCRv5 detection backbones in flax: PP-LCNetV3 and PP-HGNetV2-B4.

The reference runs its DBNet text detectors through the Paddle C++ runtime
(backend/tools/subtitle_detect.py:41-54) with two model flavors selected by
``SubtitleDetectMode`` (backend/tools/model_config.py:17-23):

  * server — PP-OCRv5_server_det: PP-HGNetV2-B4 backbone
    (backend/models/V5/ch_det/inference.yml)
  * mobile — PP-OCRv5_mobile_det: PP-LCNetV3 scale=0.75 backbone
    (backend/models/V5/ch_det_fast/inference.yml)

These are weight-level reconstructions of the public PaddleOCR graphs
(ppocr/modeling/backbones/rec_lcnetv3.py and rec_pphgnetv2.py, det=True
variants) so that converted ``.pdparams`` checkpoints reproduce reference
probability maps. Both return four feature maps at strides 4/8/16/32.

Layer-naming parity with Paddle (used by convert/paddle_dbnet.py) is pinned
by synthetic-checkpoint tests in tests/test_convert_dbnet.py; activation-level
verification against the real blobs awaits weights (LFS-stripped here).

Notes on inference-time semantics:
  * LCNetV3's LearnableRepLayer is kept in its multi-branch (un-reparameter-
    ized) form — training checkpoints store the branches; the converter also
    accepts fused ``reparam_conv`` exports by loading them as a single branch
    with zeroed others (numerically identical).
  * Hard-sigmoid in the LCNet SE layer is paddle nn.Hardsigmoid
    (clip(x/6 + 0.5, 0, 1)); the det_mobilenet_v3 SEModule used by RSEFPN
    uses slope 0.2 instead (see detect/necks.py).
  * All BatchNorms run in inference mode with converted running stats.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _hard_sigmoid(x, slope=0.2, offset=0.5):
    return jnp.clip(x * slope + offset, 0.0, 1.0)


class ConvBN(nn.Module):
    """Paddle ConvBNLayer: conv (no bias) + BN, optional activation."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Optional[str] = None  # None | "relu" | "hswish"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "hswish":
            x = nn.hard_swish(x)
        return x


class LearnableAffineBlock(nn.Module):
    """Scalar scale*x + bias (rec_lcnetv3.py LearnableAffineBlock)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda k: jnp.ones((1,), jnp.float32))
        bias = self.param("bias", lambda k: jnp.zeros((1,), jnp.float32))
        return scale.astype(self.dtype) * x + bias.astype(self.dtype)


class SELayer(nn.Module):
    """LCNet squeeze-excite: pool -> conv/relu -> conv/hardsigmoid -> scale.

    rec_lcnetv3.SELayer gates through paddle nn.Hardsigmoid, i.e. the
    MobileNetV3 relu6(x+3)/6 == clip(x/6 + 0.5, 0, 1) (slope 1/6 — unlike
    det_mobilenet_v3's SEModule which uses slope 0.2, see necks.SEModule).
    """

    channels: int
    reduction: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.channels // self.reduction, (1, 1),
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv1")(att)
        att = nn.relu(att)
        att = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv2")(att)
        return x * _hard_sigmoid(att, slope=1.0 / 6.0)


class LearnableRepLayer(nn.Module):
    """Multi-branch re-parameterizable conv (rec_lcnetv3.py).

    out = act(lab(identity_bn(x) + conv_1x1(x) + sum(conv_kxk_i(x))))
    with the activation (hswish+lab) skipped when stride == 2.
    """

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    num_branches: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        out = 0.0
        if in_c == self.features and self.stride == 1:
            out = out + nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name="identity")(x)
        if self.kernel > 1:
            out = out + ConvBN(self.features, 1, self.stride, self.groups,
                               dtype=self.dtype, name="conv_1x1")(x)
        for i in range(self.num_branches):
            out = out + ConvBN(self.features, self.kernel, self.stride,
                               self.groups, dtype=self.dtype,
                               name=f"conv_kxk_{i}")(x)
        out = LearnableAffineBlock(self.dtype, name="lab")(out)
        if self.stride != 2:
            out = nn.hard_swish(out)
            out = LearnableAffineBlock(self.dtype, name="act_lab")(out)
        return out


class LCNetV3Block(nn.Module):
    """Depthwise-separable block: rep dw conv (+SE) + rep pw conv."""

    features: int
    stride: int
    dw_size: int
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        x = LearnableRepLayer(in_c, self.dw_size, self.stride, groups=in_c,
                              dtype=self.dtype, name="dw_conv")(x)
        if self.use_se:
            x = SELayer(in_c, dtype=self.dtype, name="se")(x)
        x = LearnableRepLayer(self.features, 1, 1, dtype=self.dtype,
                              name="pw_conv")(x)
        return x


# k, in_c, out_c, stride, use_se — rec_lcnetv3.py NET_CONFIG_det
_LCNET_DET_CONFIG = {
    "blocks2": [(3, 16, 32, 1, False)],
    "blocks3": [(3, 32, 64, 2, False), (3, 64, 64, 1, False)],
    "blocks4": [(3, 64, 128, 2, False), (3, 128, 128, 1, False)],
    "blocks5": [(3, 128, 256, 2, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False), (5, 256, 256, 1, False),
                (5, 256, 256, 1, False)],
    "blocks6": [(5, 256, 512, 2, True), (5, 512, 512, 1, True),
                (5, 512, 512, 1, False), (5, 512, 512, 1, False)],
}
_LCNET_DET_MV_C = (16, 24, 56, 480)


def lcnetv3_det_out_channels(scale: float = 0.75) -> List[int]:
    return [int(c * scale) for c in _LCNET_DET_MV_C]


class PPLCNetV3(nn.Module):
    """PP-LCNetV3 det backbone (PP-OCRv5_mobile_det, scale 0.75)."""

    scale: float = 0.75
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        s = self.scale
        x = ConvBN(make_divisible(16 * s), 3, 2, act=None, dtype=self.dtype,
                   name="conv1")(x)
        # NOTE: paddle's ConvBNLayer in lcnetv3 has no act; the stem conv is
        # ConvBNLayer(3, 16*scale, 3, 2) followed directly by blocks2.
        outs = []
        for gi, group in enumerate(
                ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6")):
            for bi, (k, _, out_c, stride, se) in enumerate(
                    _LCNET_DET_CONFIG[group]):
                x = LCNetV3Block(make_divisible(out_c * s), stride, k, se,
                                 dtype=self.dtype, name=f"{group}_{bi}")(x)
            if gi >= 1:  # taps after blocks3..6: strides 4/8/16/32
                outs.append(x)
        # det=True: 1x1 projections to the mv_c channel plan
        for i, mv in enumerate(_LCNET_DET_MV_C):
            outs[i] = nn.Conv(int(mv * s), (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name=f"layer_list_{i}")(outs[i])
        return outs


# ---------------- PP-HGNetV2-B4 ----------------


class LightConvBNAct(nn.Module):
    """1x1 conv (no act) + depthwise kxk conv (relu)."""

    features: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.features, 1, act=None, dtype=self.dtype,
                   name="conv1")(x)
        x = ConvBN(self.features, self.kernel, groups=self.features,
                   act="relu", dtype=self.dtype, name="conv2")(x)
        return x


class HGV2Stem(nn.Module):
    """PPHGNetV2 stem: stride-4 with a pooled/conv two-path merge."""

    mid: int = 32
    out: int = 48
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.mid, 3, 2, act="relu", dtype=self.dtype,
                   name="stem1")(x)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.mid // 2, 2, 1, act="relu", dtype=self.dtype,
                    name="stem2a")(_valid_tail(xp))
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.mid, 2, 1, act="relu", dtype=self.dtype,
                    name="stem2b")(_valid_tail(x2))
        # max-pool k2 s1 ceil_mode over the same padded input
        x1 = nn.max_pool(xp, (2, 2), strides=(1, 1), padding="VALID")
        x = jnp.concatenate([x1, x2], axis=-1)
        x = ConvBN(self.mid, 3, 2, act="relu", dtype=self.dtype,
                   name="stem3")(x)
        x = ConvBN(self.out, 1, 1, act="relu", dtype=self.dtype,
                   name="stem4")(x)
        return x


def _valid_tail(x):
    """Helper marking that the k2/s1 convs consume the (0,1)-padded input
    with VALID padding (paddle F.pad([0,1,0,1]) + padding=0 conv)."""
    return x


class HGV2Block(nn.Module):
    features_mid: int
    features_out: int
    kernel: int
    layer_num: int = 6
    light: bool = True
    identity: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        outs = [x]
        h = x
        for i in range(self.layer_num):
            if self.light:
                h = LightConvBNAct(self.features_mid, self.kernel,
                                   dtype=self.dtype, name=f"layers_{i}")(h)
            else:
                h = ConvBN(self.features_mid, self.kernel, act="relu",
                           dtype=self.dtype, name=f"layers_{i}")(h)
            outs.append(h)
        x = jnp.concatenate(outs, axis=-1)
        x = ConvBN(self.features_out // 2, 1, act="relu", dtype=self.dtype,
                   name="aggregation_squeeze_conv")(x)
        x = ConvBN(self.features_out, 1, act="relu", dtype=self.dtype,
                   name="aggregation_excite_conv")(x)
        if self.identity:
            x = x + identity
        return x


# in_c, mid_c, out_c, num_blocks, downsample, light_block, kernel, layer_num
_HGNETV2_B4_STAGES = {
    "stage1": (48, 48, 128, 1, False, False, 3, 6),
    "stage2": (128, 96, 512, 1, True, False, 3, 6),
    "stage3": (512, 192, 1024, 3, True, True, 5, 6),
    "stage4": (1024, 384, 2048, 1, True, True, 5, 6),
}

HGNETV2_B4_OUT_CHANNELS = [128, 512, 1024, 2048]


class HGV2Stage(nn.Module):
    cfg: Tuple[int, int, int, int, bool, bool, int, int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        (in_c, mid_c, out_c, num_blocks, downsample, light, kernel,
         layer_num) = self.cfg
        if downsample:
            x = ConvBN(in_c, 3, 2, groups=in_c, act=None, dtype=self.dtype,
                       name="downsample")(x)
        for b in range(num_blocks):
            x = HGV2Block(mid_c, out_c, kernel, layer_num, light,
                          identity=b > 0, dtype=self.dtype,
                          name=f"blocks_{b}")(x)
        return x


class PPHGNetV2B4(nn.Module):
    """PP-HGNetV2-B4 det backbone (PP-OCRv5_server_det).

    ``stages_override`` substitutes tiny stage configs in unit tests; the
    default is the exact B4 det program (stem 3->32->48, stages above).
    """

    dtype: jnp.dtype = jnp.float32
    stem_mid: int = 32
    stem_out: int = 48
    stages_override: Optional[Tuple[Tuple, ...]] = None

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = HGV2Stem(self.stem_mid, self.stem_out, dtype=self.dtype,
                     name="stem")(x)
        stages = self.stages_override or tuple(
            _HGNETV2_B4_STAGES[k]
            for k in ("stage1", "stage2", "stage3", "stage4"))
        outs = []
        for i, cfg in enumerate(stages):
            x = HGV2Stage(cfg, dtype=self.dtype, name=f"stages_{i}")(x)
            outs.append(x)
        return outs
