"""DBNet activation parity against in-test torch replicas (VERDICT r4 #4).

Every other network family (STTN, RAFT, flow-completion, ProPainter, LaMa,
I3D, VGG/LPIPS) verifies its converter + flax graph against an *executed*
torch implementation; the detection models were the one exception (Paddle is
absent in this environment, and the reference weights are LFS-stripped).
This file closes that gap with the same approach tests/test_perceptual.py
uses for the absent torchvision/lpips packages: NCHW torch replicas of the
public PaddleOCR graphs —

  * PP-LCNetV3 (det, scale 0.75) -> RSEFPN(96) -> PFHeadLocal(small)
    (PP-OCRv5_mobile_det, backend/models/V5/ch_det_fast/inference.yml)
  * PP-HGNetV2-B4 (det) -> LKPAN(256, intracl) -> PFHeadLocal(large)
    (PP-OCRv5_server_det, backend/models/V5/ch_det/inference.yml)

— built so their torch state-dict key set is *identical* to the Paddle
parameter program (convert.paddle_dbnet.paddle_state_spec), asserted before
any numerics. The replica's weights feed convert_paddle_det_state_dict and
the flax DBNet must reproduce the torch forward to <=1e-3 (typ. <=1e-5) at
every tap: backbone features, neck fusion, final probability map.

Paddle conv weights share torch's OIHW layout and Conv2DTranspose shares
torch's (in, out, kh, kw), so the replica's state_dict is a faithful stand-in
for a real .pdparams tree (the converter itself normalizes the
_mean/_variance vs running_mean/running_var spelling). Reference usage under
test: backend/tools/subtitle_detect.py:41-54.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vsr_tpu.convert.paddle_dbnet import (  # noqa: E402
    convert_paddle_det_state_dict,
    paddle_state_spec,
)
from vsr_tpu.detect.backbones import (  # noqa: E402
    _HGNETV2_B4_STAGES,
    _LCNET_DET_CONFIG,
    _LCNET_DET_MV_C,
    make_divisible,
)
from vsr_tpu.detect.dbnet import DBNet  # noqa: E402


# ---------------------------------------------------------------------------
# torch building blocks (PaddleOCR ppocr/modeling layer semantics, NCHW)
# ---------------------------------------------------------------------------


class TAffine(tnn.Module):
    """rec_lcnetv3 LearnableAffineBlock: scalar scale * x + bias."""

    def __init__(self):
        super().__init__()
        self.scale = tnn.Parameter(torch.ones(1))
        self.bias = tnn.Parameter(torch.zeros(1))

    def forward(self, x):
        return self.scale * x + self.bias


class TConvBN(tnn.Module):
    """Paddle ConvBNLayer: conv (no bias, pad (k-1)//2) + BN + optional act."""

    def __init__(self, cin, cout, k, stride=1, groups=1, act=None):
        super().__init__()
        kh, kw = k if isinstance(k, tuple) else (k, k)
        self.conv = tnn.Conv2d(cin, cout, (kh, kw), stride=stride,
                               padding=((kh - 1) // 2, (kw - 1) // 2),
                               groups=groups, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-5)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        if self._act == "relu":
            x = F.relu(x)
        elif self._act == "hswish":
            x = F.hardswish(x)
        return x


class TSELayerLCNet(tnn.Module):
    """rec_lcnetv3 SELayer: hard-sigmoid slope 1/6 (paddle nn.Hardsigmoid)."""

    def __init__(self, c, reduction=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c // reduction, 1)
        self.conv2 = tnn.Conv2d(c // reduction, c, 1)

    def forward(self, x):
        att = F.adaptive_avg_pool2d(x, 1)
        att = F.relu(self.conv1(att))
        att = torch.clamp(self.conv2(att) / 6.0 + 0.5, 0.0, 1.0)
        return x * att


class TRepLayer(tnn.Module):
    """rec_lcnetv3 LearnableRepLayer (multi-branch, un-reparameterized)."""

    def __init__(self, cin, cout, k, stride=1, groups=1, branches=4):
        super().__init__()
        self._k, self._stride = k, stride
        if cin == cout and stride == 1:
            self.identity = tnn.BatchNorm2d(cin, eps=1e-5)
        else:
            self.identity = None
        if k > 1:
            self.conv_1x1 = TConvBN(cin, cout, 1, stride, groups)
        self.conv_kxk = tnn.ModuleList(
            TConvBN(cin, cout, k, stride, groups) for _ in range(branches))
        self.lab = TAffine()
        if stride != 2:
            self.act = tnn.Module()
            self.act.lab = TAffine()

    def forward(self, x):
        out = 0.0
        if self.identity is not None:
            out = out + self.identity(x)
        if self._k > 1:
            out = out + self.conv_1x1(x)
        for m in self.conv_kxk:
            out = out + m(x)
        out = self.lab(out)
        if self._stride != 2:
            out = self.act.lab(F.hardswish(out))
        return out


class TLCNetBlock(tnn.Module):
    def __init__(self, cin, cout, stride, dw_size, use_se):
        super().__init__()
        self.dw_conv = TRepLayer(cin, cin, dw_size, stride, groups=cin)
        if use_se:
            self.se = TSELayerLCNet(cin)
        else:
            self.se = None
        self.pw_conv = TRepLayer(cin, cout, 1, 1)

    def forward(self, x):
        x = self.dw_conv(x)
        if self.se is not None:
            x = self.se(x)
        return self.pw_conv(x)


class TLCNetV3Det(tnn.Module):
    """PP-LCNetV3 det backbone, scale 0.75 (rec_lcnetv3.py, det=True)."""

    def __init__(self, scale=0.75):
        super().__init__()
        md = make_divisible
        self.conv1 = TConvBN(3, md(16 * scale), 3, 2)
        for group in ("blocks2", "blocks3", "blocks4", "blocks5", "blocks6"):
            mods = [TLCNetBlock(md(in_c * scale), md(out_c * scale), stride,
                                k, se)
                    for (k, in_c, out_c, stride, se) in
                    _LCNET_DET_CONFIG[group]]
            setattr(self, group, tnn.Sequential(*mods))
        taps = [md(c * scale) for c in (64, 128, 256, 512)]
        self.layer_list = tnn.ModuleList(
            tnn.Conv2d(taps[i], int(mv * scale), 1)
            for i, mv in enumerate(_LCNET_DET_MV_C))

    def forward(self, x):
        x = self.blocks2(self.conv1(x))
        t3 = self.blocks3(x)
        t4 = self.blocks4(t3)
        t5 = self.blocks5(t4)
        t6 = self.blocks6(t5)
        return [m(t) for m, t in zip(self.layer_list, (t3, t4, t5, t6))]


class TSEModuleDet(tnn.Module):
    """det_mobilenet_v3 SEModule: hard-sigmoid slope 0.2, offset 0.5."""

    def __init__(self, c, reduction=4):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c // reduction, 1)
        self.conv2 = tnn.Conv2d(c // reduction, c, 1)

    def forward(self, x):
        att = F.adaptive_avg_pool2d(x, 1)
        att = F.relu(self.conv1(att))
        att = torch.clamp(self.conv2(att) * 0.2 + 0.5, 0.0, 1.0)
        return x * att


class TRSELayer(tnn.Module):
    def __init__(self, cin, cout, k, shortcut=True):
        super().__init__()
        self.in_conv = tnn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.se_block = TSEModuleDet(cout)
        self._shortcut = shortcut

    def forward(self, x):
        x = self.in_conv(x)
        se = self.se_block(x)
        return x + se if self._shortcut else se


def _up(x, factor):
    return F.interpolate(x, scale_factor=factor, mode="nearest")


class TRSEFPN(tnn.Module):
    """db_fpn.RSEFPN(out_channels=96, shortcut=True)."""

    def __init__(self, in_channels, out_channels=96):
        super().__init__()
        self.ins_conv = tnn.ModuleList(
            TRSELayer(c, out_channels, 1) for c in in_channels)
        self.inp_conv = tnn.ModuleList(
            TRSELayer(out_channels, out_channels // 4, 3) for _ in range(4))

    def forward(self, feats):
        in2, in3, in4, in5 = [m(c) for m, c in zip(self.ins_conv, feats)]
        out4 = in4 + _up(in5, 2)
        out3 = in3 + _up(out4, 2)
        out2 = in2 + _up(out3, 2)
        p5 = self.inp_conv[3](in5)
        p4 = self.inp_conv[2](out4)
        p3 = self.inp_conv[1](out3)
        p2 = self.inp_conv[0](out2)
        return torch.cat([_up(p5, 8), _up(p4, 4), _up(p3, 2), p2], dim=1)


class TIntraCL(tnn.Module):
    """necks/intracl.py IntraCLBlock (reduce_factor=2)."""

    def __init__(self, c, reduce_factor=2):
        super().__init__()
        rc = c // reduce_factor
        self.conv1x1_reduce_channel = tnn.Conv2d(c, rc, 1)
        for k in (7, 5, 3):
            setattr(self, f"c_layer_{k}x{k}",
                    tnn.Conv2d(rc, rc, k, padding=k // 2))
            setattr(self, f"v_layer_{k}x1",
                    tnn.Conv2d(rc, rc, (k, 1), padding=(k // 2, 0)))
            setattr(self, f"q_layer_1x{k}",
                    tnn.Conv2d(rc, rc, (1, k), padding=(0, k // 2)))
        self.conv1x1_return_channel = tnn.Conv2d(rc, c, 1)
        self.bn = tnn.BatchNorm2d(c, eps=1e-5)

    def forward(self, x):
        h = self.conv1x1_reduce_channel(x)
        for k in (7, 5, 3):
            h = (h + getattr(self, f"c_layer_{k}x{k}")(h)
                 + getattr(self, f"v_layer_{k}x1")(h)
                 + getattr(self, f"q_layer_1x{k}")(h))
        return x + F.relu(self.bn(self.conv1x1_return_channel(h)))


class TLKPAN(tnn.Module):
    """db_fpn.LKPAN(out_channels=256, mode='large') + IntraCL blocks."""

    def __init__(self, in_channels, out_channels=256):
        super().__init__()
        q = out_channels // 4
        self.ins_conv = tnn.ModuleList(
            tnn.Conv2d(c, out_channels, 1, bias=False) for c in in_channels)
        self.inp_conv = tnn.ModuleList(
            tnn.Conv2d(out_channels, q, 9, padding=4, bias=False)
            for _ in range(4))
        self.pan_head_conv = tnn.ModuleList(
            tnn.Conv2d(q, q, 3, stride=2, padding=1, bias=False)
            for _ in range(3))
        self.pan_lat_conv = tnn.ModuleList(
            tnn.Conv2d(q, q, 9, padding=4, bias=False) for _ in range(4))
        for n in range(1, 5):
            setattr(self, f"incl{n}", TIntraCL(q))

    def forward(self, feats):
        in2, in3, in4, in5 = [m(c) for m, c in zip(self.ins_conv, feats)]
        out4 = in4 + _up(in5, 2)
        out3 = in3 + _up(out4, 2)
        out2 = in2 + _up(out3, 2)
        f5 = self.inp_conv[3](in5)
        f4 = self.inp_conv[2](out4)
        f3 = self.inp_conv[1](out3)
        f2 = self.inp_conv[0](out2)
        pan3 = f3 + self.pan_head_conv[0](f2)
        pan4 = f4 + self.pan_head_conv[1](pan3)
        pan5 = f5 + self.pan_head_conv[2](pan4)
        p2 = self.incl1(self.pan_lat_conv[0](f2))
        p3 = self.incl2(self.pan_lat_conv[1](pan3))
        p4 = self.incl3(self.pan_lat_conv[2](pan4))
        p5 = self.incl4(self.pan_lat_conv[3](pan5))
        return torch.cat([_up(p5, 8), _up(p4, 4), _up(p3, 2), p2], dim=1)


class THGStem(tnn.Module):
    """pphgnetv2 StemBlock: two-path stride-4 stem with ceil-mode pooling."""

    def __init__(self, mid=32, out=48):
        super().__init__()
        self.stem1 = TConvBN(3, mid, 3, 2, act="relu")
        self.stem2a = TConvBN(mid, mid // 2, 2, 1, act="relu")
        self.stem2b = TConvBN(mid // 2, mid, 2, 1, act="relu")
        self.stem3 = TConvBN(mid * 2, mid, 3, 2, act="relu")
        self.stem4 = TConvBN(mid, out, 1, 1, act="relu")

    def forward(self, x):
        x = self.stem1(x)
        xp = F.pad(x, (0, 1, 0, 1))
        x2 = self.stem2a(xp)
        x2 = self.stem2b(F.pad(x2, (0, 1, 0, 1)))
        x1 = F.max_pool2d(xp, 2, stride=1)
        return self.stem4(self.stem3(torch.cat([x1, x2], dim=1)))


class TLightConv(tnn.Module):
    def __init__(self, cin, cout, k):
        super().__init__()
        self.conv1 = TConvBN(cin, cout, 1)
        self.conv2 = TConvBN(cout, cout, k, groups=cout, act="relu")

    def forward(self, x):
        return self.conv2(self.conv1(x))


class THGBlock(tnn.Module):
    def __init__(self, cin, mid, cout, k, layer_num, light, identity):
        super().__init__()
        self._identity = identity
        self.layers = tnn.ModuleList()
        h = cin
        for _ in range(layer_num):
            self.layers.append(TLightConv(h, mid, k) if light
                               else TConvBN(h, mid, k, act="relu"))
            h = mid
        total = cin + layer_num * mid
        self.aggregation_squeeze_conv = TConvBN(total, cout // 2, 1,
                                                act="relu")
        self.aggregation_excite_conv = TConvBN(cout // 2, cout, 1, act="relu")

    def forward(self, x):
        identity = x
        outs = [x]
        h = x
        for m in self.layers:
            h = m(h)
            outs.append(h)
        x = self.aggregation_squeeze_conv(torch.cat(outs, dim=1))
        x = self.aggregation_excite_conv(x)
        return x + identity if self._identity else x


class THGStage(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        (in_c, mid_c, out_c, num_blocks, downsample, light, k,
         layer_num) = cfg
        if downsample:
            self.downsample = TConvBN(in_c, in_c, 3, 2, groups=in_c)
        else:
            self.downsample = None
        self.blocks = tnn.ModuleList(
            THGBlock(in_c if b == 0 else out_c, mid_c, out_c, k, layer_num,
                     light, identity=b > 0)
            for b in range(num_blocks))

    def forward(self, x):
        if self.downsample is not None:
            x = self.downsample(x)
        for b in self.blocks:
            x = b(x)
        return x


class THGNetV2B4Det(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem = THGStem()
        self.stages = tnn.ModuleList(
            THGStage(_HGNETV2_B4_STAGES[k])
            for k in ("stage1", "stage2", "stage3", "stage4"))

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for s in self.stages:
            x = s(x)
            outs.append(x)
        return outs


class TDBBranch(tnn.Module):
    """det_db_head.Head: conv/bn/relu -> deconv2x/bn/relu -> deconv2x."""

    def __init__(self, c):
        super().__init__()
        q = c // 4
        self.conv1 = tnn.Conv2d(c, q, 3, padding=1, bias=False)
        self.conv_bn1 = tnn.BatchNorm2d(q, eps=1e-5)
        self.conv2 = tnn.ConvTranspose2d(q, q, 2, stride=2)
        self.conv_bn2 = tnn.BatchNorm2d(q, eps=1e-5)
        self.conv3 = tnn.ConvTranspose2d(q, 1, 2, stride=2)

    def forward(self, x, return_f=False):
        x = F.relu(self.conv_bn1(self.conv1(x)))
        x = F.relu(self.conv_bn2(self.conv2(x)))
        f = x
        x = torch.sigmoid(self.conv3(x))
        return (x, f) if return_f else x


class TPFHeadLocal(tnn.Module):
    def __init__(self, c, mode):
        super().__init__()
        self.binarize = TDBBranch(c)
        self.thresh = TDBBranch(c)
        mid = c // (4 if mode == "large" else 8)
        self.cbn_layer = tnn.Module()
        self.cbn_layer.last_3 = tnn.Module()
        self.cbn_layer.last_3.conv = tnn.Conv2d(c // 4 + 1, mid, 3, padding=1,
                                                bias=False)
        self.cbn_layer.last_3.bn = tnn.BatchNorm2d(mid, eps=1e-5)
        self.cbn_layer.last_1 = tnn.Conv2d(mid, 1, 1)

    def forward(self, fuse):
        base, f = self.binarize(fuse, return_f=True)
        out = torch.cat([base, _up(f, 2)], dim=1)
        out = F.relu(self.cbn_layer.last_3.bn(self.cbn_layer.last_3.conv(out)))
        cbn = torch.sigmoid(self.cbn_layer.last_1(out))
        return 0.5 * (base + cbn)


class TDBNet(tnn.Module):
    def __init__(self, preset):
        super().__init__()
        if preset == "mobile":
            self.backbone = TLCNetV3Det(0.75)
            bb_out = [int(c * 0.75) for c in _LCNET_DET_MV_C]
            self.neck = TRSEFPN(bb_out, 96)
            self.head = TPFHeadLocal(96, "small")
        else:
            self.backbone = THGNetV2B4Det()
            self.neck = TLKPAN([128, 512, 1024, 2048], 256)
            self.head = TPFHeadLocal(256, "large")

    def forward(self, x):
        feats = self.backbone(x)
        fused = self.neck(feats)
        return self.head(fused), feats, fused


# ---------------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------------


def _randomized_state_dict(model: tnn.Module, seed: int):
    """Exercise the BN folding: random running stats + affine, default
    (kaiming) conv init — keeps activations well-scaled through the deep
    graphs so parity is meaningful, not a comparison of constants."""
    rng = np.random.default_rng(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        shape = tuple(v.shape)
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = torch.from_numpy(
                rng.uniform(0.5, 1.5, shape).astype(np.float32))
        elif k.endswith("running_mean"):
            sd[k] = torch.from_numpy(
                rng.normal(0, 0.1, shape).astype(np.float32))
        elif ".bn." in k or "conv_bn" in k or k.endswith("identity.weight") \
                or k.endswith("identity.bias"):
            if k.endswith(".weight"):
                sd[k] = torch.from_numpy(
                    rng.uniform(0.5, 1.5, shape).astype(np.float32))
            else:
                sd[k] = torch.from_numpy(
                    rng.normal(0, 0.1, shape).astype(np.float32))
        elif k.endswith("lab.scale"):
            sd[k] = torch.from_numpy(
                rng.uniform(0.8, 1.2, shape).astype(np.float32))
    model.load_state_dict(sd)
    return model


def _paddle_style_sd(model: tnn.Module):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if not k.endswith("num_batches_tracked")}


@pytest.mark.parametrize("preset", ["mobile", "server"])
def test_torch_replica_matches_paddle_program(preset):
    """The replica's key set IS the Paddle parameter program — the same tree
    test_convert_dbnet pins the converter against, so the parity below runs
    through the exact production mapping."""
    sd = _paddle_style_sd(TDBNet(preset))
    spec = paddle_state_spec(preset)

    def norm(k):
        return (k.replace(".running_mean", "._mean")
                 .replace(".running_var", "._variance"))

    got = {norm(k) for k in sd}
    assert got == set(spec), (
        sorted(set(spec) - got)[:5], sorted(got - set(spec))[:5])
    for k, v in sd.items():
        assert tuple(v.shape) == tuple(spec[norm(k)]), (k, v.shape)


@pytest.mark.parametrize("preset", ["mobile", "server"])
def test_dbnet_activation_parity(preset):
    """Converted replica weights reproduce the executed torch forward at
    every tap: 4 backbone features, neck fusion, probability map."""
    torch.manual_seed(0 if preset == "mobile" else 1)
    ref = _randomized_state_dict(TDBNet(preset),
                                 seed=0 if preset == "mobile" else 1).eval()
    variables = convert_paddle_det_state_dict(_paddle_style_sd(ref), preset)

    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_map, want_feats, want_fused = ref(
            torch.from_numpy(x).permute(0, 3, 1, 2))

    model = DBNet(preset=preset)

    def taps(mdl, images):
        feats = mdl.backbone(images)
        fused = mdl.neck(feats)
        return mdl.head(fused), feats, fused

    got_map, got_feats, got_fused = model.apply(variables, jnp.asarray(x),
                                                method=taps)
    for i, (g, w) in enumerate(zip(got_feats, want_feats)):
        err = np.max(np.abs(np.asarray(g) - w.permute(0, 2, 3, 1).numpy()))
        assert err < 1e-3, (f"backbone tap {i}", err)
    err = np.max(np.abs(np.asarray(got_fused)
                        - want_fused.permute(0, 2, 3, 1).numpy()))
    assert err < 1e-3, ("neck", err)
    err = np.max(np.abs(np.asarray(got_map)
                        - want_map.permute(0, 2, 3, 1).numpy()))
    assert err < 1e-3, ("prob map", err)
    # the map must carry real signal, not saturated constants
    assert float(jnp.std(got_map)) > 1e-4
