"""LaMa (big-lama) fast-Fourier-convolution inpainting generator in flax.

The reference ships only a TorchScript blob (backend/inpaint/lama_inpaint.py:13,
backend/models/big-lama/) — the architecture is rebuilt here from the LaMa
paper (Suvorov et al., WACV 2022) with big-lama hyper-parameters: ngf=64,
3 downsamples to 512 channels, 18 FFC residual blocks with global ratio 0.75,
spectral transform with ortho-normalized rfft2, sigmoid output.

Contract (matches the blob's): inputs image [B, H, W, 3] in [0,1] and mask
[B, H, W, 1] in {0,1}, H/W divisible by 8; the net sees
concat(image * (1 - mask), mask) and returns the full inpainted image in
[0,1].

FFT convolutions are a natural TPU fit: XLA lowers jnp.fft over the padded
power-of-two-friendly buckets, and every pointwise stage around it fuses.
Layout is NHWC; the FourierUnit flattens (re, im) channel-major, mirroring
torch's stack+view so converted weights keep their meaning.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

_PAD1 = ((1, 1), (1, 1))


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
                        name=name)


class FourierUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ffted = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        # [B, H, W//2+1, C] complex -> [B, H, W//2+1, 2C] channel-major (re, im)
        z = jnp.stack([ffted.real, ffted.imag], axis=-1)
        z = z.reshape(B, H, W // 2 + 1, C * 2).astype(self.dtype)
        z = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(z)
        z = _bn(train, self.dtype, "bn")(z)
        z = nn.relu(z)
        z = z.astype(jnp.float32).reshape(B, H, W // 2 + 1, self.features, 2)
        comp = z[..., 0] + 1j * z[..., 1]
        out = jnp.fft.irfft2(comp, s=(H, W), axes=(1, 2), norm="ortho")
        return out.astype(self.dtype)


class SpectralTransform(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        x = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        fu = FourierUnit(half, self.dtype, name="fu")(x, train)
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv2")(x + fu)
        return out


class FFC(nn.Module):
    """Fast Fourier Convolution with local/global channel split."""

    features: int
    kernel: int = 3
    stride: int = 1
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l: jnp.ndarray, x_g, train: bool = False):
        out_g = int(self.features * self.ratio_gout)
        out_l = self.features - out_g
        pad = self.kernel // 2

        def conv(features, name):
            # big-lama's FFC convs use padding_mode='reflect'
            # (saicinpainting ffc.py FFC.__init__ padding_type default);
            # reflect-pad on the host graph then VALID conv matches torch.
            inner = nn.Conv(features, (self.kernel, self.kernel),
                            strides=(self.stride, self.stride),
                            padding="VALID", use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name=name)
            if pad == 0:
                return inner
            return lambda x: inner(_reflect_pad(x, pad))

        has_g_in = x_g is not None and x_g.shape[-1] > 0
        yl = conv(out_l, "l2l")(x_l) if out_l else None
        if has_g_in and out_l:
            yl = yl + conv(out_l, "g2l")(x_g)
        yg = None
        if out_g:
            yg = conv(out_g, "l2g")(x_l)
            if has_g_in:
                yg = yg + SpectralTransform(out_g, self.dtype, name="g2g")(x_g, train)
        return yl, yg


class FFCBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        yl, yg = FFC(self.features, self.kernel, self.stride, self.ratio_gin,
                     self.ratio_gout, self.dtype, name="ffc")(x_l, x_g, train)
        if yl is not None:
            yl = _bn(train, self.dtype, "bn_l")(yl)
            if self.act:
                yl = nn.relu(yl)
        if yg is not None:
            yg = _bn(train, self.dtype, "bn_g")(yg)
            if self.act:
                yg = nn.relu(yg)
        return yl, yg


class FFCResnetBlock(nn.Module):
    features: int
    ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        id_l, id_g = x_l, x_g
        x_l, x_g = FFCBnAct(self.features, 3, 1, self.ratio, self.ratio,
                            dtype=self.dtype, name="conv1")(x_l, x_g, train)
        x_l, x_g = FFCBnAct(self.features, 3, 1, self.ratio, self.ratio,
                            dtype=self.dtype, name="conv2")(x_l, x_g, train)
        return id_l + x_l, id_g + x_g


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class LamaGenerator(nn.Module):
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    global_ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """image [B,H,W,3] in [0,1]; mask [B,H,W,1] {0,1} -> [B,H,W,3] [0,1]."""
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
        x = x.astype(self.dtype)

        # stem: reflect-pad 3 + 7x7 (all-local FFC degenerates to a conv)
        x = _reflect_pad(x, 3)
        x = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = nn.relu(x)

        # downsampling; the final one splits channels local/global
        feats = self.ngf
        x_l, x_g = x, None
        for i in range(self.n_downsampling):
            feats = min(feats * 2, self.ngf * 8)
            last = i == self.n_downsampling - 1
            x_l, x_g = FFCBnAct(
                feats, 3, 2,
                ratio_gin=0.0,
                ratio_gout=self.global_ratio if last else 0.0,
                dtype=self.dtype, name=f"down{i}",
            )(x_l, x_g, train)

        for b in range(self.n_blocks):
            x_l, x_g = FFCResnetBlock(
                feats, self.global_ratio, self.dtype, name=f"block{b}"
            )(x_l, x_g, train)

        x = jnp.concatenate([x_l, x_g], axis=-1)

        for i in range(self.n_downsampling):
            feats = feats // 2
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1) == flax
            # ConvTranspose with explicit ((1,2),(1,2)) padding and
            # transpose_kernel=True (validated in tests/test_lama.py). Bias on,
            # matching big-lama's ConvTranspose2d (bias followed by BN).
            x = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)), use_bias=True,
                                 transpose_kernel=True,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"up{i}")(x)
            x = _bn(train, self.dtype, f"up{i}_bn")(x)
            x = nn.relu(x)

        x = _reflect_pad(x, 3)
        x = nn.Conv(3, (7, 7), padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="head")(x)
        return nn.sigmoid(x.astype(jnp.float32))
