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

from functools import lru_cache
from typing import Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

_PAD1 = ((1, 1), (1, 1))

_HI = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _dft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Ortho-normalized forward-DFT matrix exp(-2πi hk/n)/√n as (re, im)."""
    k = np.arange(n)
    theta = 2.0 * np.pi * np.outer(k, k) / n
    s = 1.0 / np.sqrt(n)
    return (np.cos(theta) * s).astype(np.float32), (
        -np.sin(theta) * s).astype(np.float32)


@lru_cache(maxsize=None)
def _rdft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """[n, n//2+1] forward real-DFT matrix (ortho), keeping bins 0..n//2."""
    re, im = _dft_mats(n)
    m = n // 2 + 1
    return re[:, :m].copy(), im[:, :m].copy()


@lru_cache(maxsize=None)
def _irdft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """[n//2+1, n] inverse real-DFT (ortho) with Hermitian bin weights:
    out[w] = Σ_m ω_m (Zr cos(2πmw/n) − Zi sin(2πmw/n))/√n, ω = 2 except the
    DC and (even-n) Nyquist bins."""
    m = n // 2 + 1
    w = np.full((m, 1), 2.0, np.float64)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    theta = 2.0 * np.pi * np.outer(np.arange(m), np.arange(n)) / n
    s = w / np.sqrt(n)
    return (np.cos(theta) * s).astype(np.float32), (
        -np.sin(theta) * s).astype(np.float32)


def _rfft2_matmul(x: jnp.ndarray,
                  precision=_HI) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """rfft2(x, axes=(1,2), norm='ortho') as MXU matmuls -> (re, im).

    XLA's TPU FFT lowering decomposes into ~800 sub-millisecond fusions per
    LaMa forward (148 of 190 ms device time at B=8, profiled round 4); the
    spectral grids here are tiny (H/8 × W/8), so two dense DFT matmuls per
    axis run the whole thing on the MXU in well under a millisecond.

    ``precision`` trades accuracy for MXU passes: HIGHEST (default) keeps the
    fp32 parity the converter tests pin; DEFAULT runs the inputs' native
    (bf16) MXU path — 1 pass instead of 6 — at a hole-PSNR cost gated by
    tests/test_lama.py."""
    B, H, W, C = x.shape
    dt = x.dtype
    hr, hi = (jnp.asarray(a, dt) for a in _dft_mats(H))
    xr = jnp.einsum("bhwc,hk->bkwc", x, hr, precision=precision)
    xi = jnp.einsum("bhwc,hk->bkwc", x, hi, precision=precision)
    wr, wi = (jnp.asarray(a, dt) for a in _rdft_mats(W))
    yr = jnp.einsum("bkwc,wm->bkmc", xr, wr, precision=precision) - jnp.einsum(
        "bkwc,wm->bkmc", xi, wi, precision=precision)
    yi = jnp.einsum("bkwc,wm->bkmc", xr, wi, precision=precision) + jnp.einsum(
        "bkwc,wm->bkmc", xi, wr, precision=precision)
    return yr, yi


def _irfft2_matmul(zr: jnp.ndarray, zi: jnp.ndarray, H: int,
                   W: int, precision=_HI) -> jnp.ndarray:
    """irfft2(zr + i·zi, s=(H, W), axes=(1,2), norm='ortho') via matmuls."""
    dt = zr.dtype
    er, ei = (jnp.asarray(a, dt) for a in _dft_mats(H))
    # inverse DFT along H: conjugate-transpose of the (symmetric) forward
    xr = jnp.einsum("bkmc,kh->bhmc", zr, er, precision=precision) + jnp.einsum(
        "bkmc,kh->bhmc", zi, ei, precision=precision)
    xi = jnp.einsum("bkmc,kh->bhmc", zi, er, precision=precision) - jnp.einsum(
        "bkmc,kh->bhmc", zr, ei, precision=precision)
    gr, gi = (jnp.asarray(a, dt) for a in _irdft_mats(W))
    return jnp.einsum("bhmc,mw->bhwc", xr, gr,
                      precision=precision) + jnp.einsum(
        "bhmc,mw->bhwc", xi, gi, precision=precision)


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
                        name=name)


class FourierUnit(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    # FFT backend ("matmul" | "matmul-bf16" | "xla"), pinned at module
    # construction. The wrapper resolves VSR_LAMA_FFT ONCE when it builds the
    # generator; an env var flipped later in a live process cannot affect
    # programs already compiled via cached_jit (its key ignores the
    # environment), so reading it at trace time would silently mislead A/B
    # runs. "matmul" runs the DFT matmuls in fp32/HIGHEST (converter-parity
    # default); "matmul-bf16" runs them in the trunk dtype at DEFAULT
    # precision — one MXU pass instead of six, hole-PSNR gated in
    # tests/test_lama.py.
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        use_matmul = self.fft_impl != "xla"
        bf16 = self.fft_impl == "matmul-bf16"
        if use_matmul:
            if bf16:
                re, im = _rfft2_matmul(x.astype(self.dtype), precision=None)
            else:
                re, im = _rfft2_matmul(x.astype(jnp.float32))
        else:
            ffted = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2),
                                  norm="ortho")
            re, im = ffted.real, ffted.imag
        # [B, H, W//2+1, C] complex -> [B, H, W//2+1, 2C] channel-major (re, im)
        z = jnp.stack([re, im], axis=-1)
        z = z.reshape(B, H, W // 2 + 1, C * 2).astype(self.dtype)
        z = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(z)
        z = _bn(train, self.dtype, "bn")(z)
        z = nn.relu(z)
        if bf16:
            z = z.reshape(B, H, W // 2 + 1, self.features, 2)
            out = _irfft2_matmul(z[..., 0], z[..., 1], H, W, precision=None)
        elif use_matmul:
            z = z.astype(jnp.float32).reshape(B, H, W // 2 + 1,
                                              self.features, 2)
            out = _irfft2_matmul(z[..., 0], z[..., 1], H, W)
        else:
            z = z.astype(jnp.float32).reshape(B, H, W // 2 + 1,
                                              self.features, 2)
            comp = z[..., 0] + 1j * z[..., 1]
            out = jnp.fft.irfft2(comp, s=(H, W), axes=(1, 2), norm="ortho")
        return out.astype(self.dtype)


class SpectralTransform(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        half = self.features // 2
        x = nn.Conv(half, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        x = _bn(train, self.dtype, "bn1")(x)
        x = nn.relu(x)
        fu = FourierUnit(half, self.dtype, self.fft_impl, name="fu")(x, train)
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
    fft_impl: str = "matmul"

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
                yg = yg + SpectralTransform(out_g, self.dtype, self.fft_impl,
                                            name="g2g")(x_g, train)
        return yl, yg


class FFCBnAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    act: bool = True
    dtype: jnp.dtype = jnp.float32
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        yl, yg = FFC(self.features, self.kernel, self.stride, self.ratio_gin,
                     self.ratio_gout, self.dtype, self.fft_impl,
                     name="ffc")(x_l, x_g, train)
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
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        id_l, id_g = x_l, x_g
        x_l, x_g = FFCBnAct(self.features, 3, 1, self.ratio, self.ratio,
                            dtype=self.dtype, fft_impl=self.fft_impl,
                            name="conv1")(x_l, x_g, train)
        x_l, x_g = FFCBnAct(self.features, 3, 1, self.ratio, self.ratio,
                            dtype=self.dtype, fft_impl=self.fft_impl,
                            name="conv2")(x_l, x_g, train)
        return id_l + x_l, id_g + x_g


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class LamaGenerator(nn.Module):
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    global_ratio: float = 0.75
    dtype: jnp.dtype = jnp.float32
    fft_impl: str = "matmul"

    @nn.compact
    def __call__(self, image: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False, out_rows=None) -> jnp.ndarray:
        """image [B,H,W,3] in [0,1]; mask [B,H,W,1] {0,1} -> [B,H,W,3] [0,1].

        out_rows=(r0, out_h): return only rows [r0, r0+out_h) of the output
        (r0 may be a traced scalar; out_h must be static and even). The
        encoder/FFC trunk still sees every row (the spectral transform is
        global), but the upsampling tail — whose final full-resolution convs
        are ~half the forward's device time (head 7×7→3 alone was 53 ms of a
        110 ms B=8 batch: 3 output lanes of 128 on the MXU) — is computed
        only for the requested rows plus halo. Sliced rows are bit-identical
        to the full forward (margins cover the transpose-conv and reflect-pad
        edge effects; clamped slices coincide with the true image boundary),
        pinned by tests/test_lama.py."""
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
        x = x.astype(self.dtype)

        # stem: reflect-pad 3 + 7x7 (all-local FFC degenerates to a conv).
        # C_in=4 looks MXU-hostile but XLA's TPU conv emitter handles it
        # fine (profiled round 4: 2.0 ms of a 110 ms B=8 forward; a
        # space-to-depth phase-packed rewrite measured SLOWER, +8 ms of
        # layout copies, and was removed)
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
                dtype=self.dtype, fft_impl=self.fft_impl, name=f"down{i}",
            )(x_l, x_g, train)

        for b in range(self.n_blocks):
            x_l, x_g = FFCResnetBlock(
                feats, self.global_ratio, self.dtype, self.fft_impl,
                name=f"block{b}"
            )(x_l, x_g, train)

        x = jnp.concatenate([x_l, x_g], axis=-1)

        row_off = None
        for i in range(self.n_downsampling):
            feats = feats // 2
            if out_rows is not None and i == self.n_downsampling - 1:
                # Slice the half-resolution feature map to the rows the
                # requested output window needs: out rows [r0, r0+out_h)
                # read up-conv input rows ~[r0/2 - 2, (r0+out_h)/2 + 2) and
                # the head adds 3 more at full res. An 8-row margin on each
                # side (s0 = r0//2 - 4) covers both plus the transpose
                # conv's 2-row edge effect; when the clamp binds, the slice
                # edge IS the true image boundary, where the full model's
                # padding semantics apply identically.
                r0, out_h = out_rows
                assert out_h % 2 == 0, "out_rows height must be even"
                h_half = x.shape[1]
                slice_h = min(h_half, out_h // 2 + 8)
                s0 = jnp.clip(jnp.asarray(r0) // 2 - 4, 0, h_half - slice_h)
                x = jax.lax.dynamic_slice_in_dim(x, s0, slice_h, axis=1)
                row_off = jnp.asarray(r0) - 2 * s0
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
        out = nn.sigmoid(x.astype(jnp.float32))
        if row_off is not None:
            out = jax.lax.dynamic_slice_in_dim(out, row_off, out_rows[1],
                                               axis=1)
        return out
