"""STTN spatio-temporal transformer inpainting generator, TPU-native.

Capability target (NOT a port): the two reference STTN variants —
* "auto"  (backend/inpaint/sttn/auto_sttn.py:64-239): 640x120 input,
  patchsizes [(80,15),(32,6),(10,5),(5,3)], unmasked attention;
* "det"   (backend/inpaint/sttn/network_sttn.py:65-240): 432x240 input,
  patchsizes [(108,60),(36,20),(18,10),(9,5)], attention over keys gated by
  the hole mask and the encoder fed masked frames.

Architecture (shared): 4-conv stride-4 encoder (3->64->64->128->256, LeakyReLU
0.2) -> 8 transformer blocks (multi-scale patch attention + dilated-conv FFN,
both residual) -> decoder with two align-corners bilinear 2x upsamples ->
tanh. Convolutions use torch-style explicit padding so converted reference
checkpoints reproduce activations exactly.

TPU-first differences from the reference:
* NHWC layout end to end; convs over a flattened (B*L) frame batch.
* ``transform`` takes a *batch of windows* [B, L, h, w, C] plus a key-validity
  mask, so the ragged neighbor+reference window sweep becomes one static-shape
  program (see inpaint/sttn_auto.py) instead of a per-window Python loop.
* The det variant's attention mask is applied for real. (In the reference,
  ``scores.masked_fill(m, -1e9)`` at network_sttn.py:148 discards its result —
  an upstream no-op bug — so ``apply_attention_mask=False`` reproduces
  reference numerics with converted weights; True is the intended behaviour.)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vsr_tpu.ops.patch_attention import multi_scale_patch_attention
from vsr_tpu.ops.upsample import upsample_bilinear_2x_align_corners

STTN_AUTO_PATCHSIZES: Tuple[Tuple[int, int], ...] = ((80, 15), (32, 6), (10, 5), (5, 3))
STTN_DET_PATCHSIZES: Tuple[Tuple[int, int], ...] = ((108, 60), (36, 20), (18, 10), (9, 5))

# Model input sizes (W, H) per variant (sttn_auto_inpaint.py:38, sttn_det_inpaint.py:33)
STTN_AUTO_INPUT_SIZE = (640, 120)
STTN_DET_INPUT_SIZE = (432, 240)

_PAD1 = ((1, 1), (1, 1))
_PAD2 = ((2, 2), (2, 2))


def _lrelu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=0.2)


class STTNEncoder(nn.Module):
    """Stride-4 conv encoder: [N, H, W, 3] -> [N, H/4, W/4, C]."""

    channel: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=_PAD1,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        x = _lrelu(conv(64, 2, "conv0")(x))
        x = _lrelu(conv(64, 1, "conv1")(x))
        x = _lrelu(conv(128, 2, "conv2")(x))
        x = _lrelu(conv(self.channel, 1, "conv3")(x))
        return x


class STTNDecoder(nn.Module):
    """Two 2x align-corners upsamples + convs, tanh output in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda f, name: nn.Conv(
            f, (3, 3), padding=_PAD1,
            dtype=self.dtype, param_dtype=jnp.float32, name=name)
        x = upsample_bilinear_2x_align_corners(x)
        x = _lrelu(conv(128, "deconv0")(x))
        x = _lrelu(conv(64, "conv1")(x))
        x = upsample_bilinear_2x_align_corners(x)
        x = _lrelu(conv(64, "deconv1")(x))
        x = conv(3, "conv2")(x)
        return jnp.tanh(x)


class _AttentionLayer(nn.Module):
    """q/k/v 1x1 embeddings + multi-scale patch attention + 3x3 output conv."""

    patchsizes: Sequence[Tuple[int, int]]
    channel: int = 256
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, L, h, w, C]
        key_valid: Optional[jnp.ndarray],
        patch_mask: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        B, L, h, w, C = x.shape
        flat = x.reshape(B * L, h, w, C)
        emb = lambda name: nn.Conv(
            self.channel, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        q = emb("query")(flat).reshape(B, L, h, w, C)
        k = emb("key")(flat).reshape(B, L, h, w, C)
        v = emb("value")(flat).reshape(B, L, h, w, C)
        y = multi_scale_patch_attention(
            q, k, v, self.patchsizes, key_valid=key_valid,
            patch_mask=patch_mask, use_pallas=self.use_pallas
        )
        y = y.reshape(B * L, h, w, C)
        y = _lrelu(nn.Conv(self.channel, (3, 3), padding=_PAD1,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="out")(y))
        return y.reshape(B, L, h, w, C)


class _FeedForward(nn.Module):
    """Dilated 3x3 conv + 3x3 conv, both LeakyReLU (auto_sttn.py:210-222)."""

    channel: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, L, h, w, C = x.shape
        flat = x.reshape(B * L, h, w, C)
        flat = _lrelu(nn.Conv(self.channel, (3, 3), padding=_PAD2,
                              kernel_dilation=(2, 2), dtype=self.dtype,
                              param_dtype=jnp.float32, name="conv0")(flat))
        flat = _lrelu(nn.Conv(self.channel, (3, 3), padding=_PAD1,
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name="conv1")(flat))
        return flat.reshape(B, L, h, w, C)


class TransformerBlock(nn.Module):
    patchsizes: Sequence[Tuple[int, int]]
    channel: int = 256
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, key_valid=None, patch_mask=None):
        x = x + _AttentionLayer(
            self.patchsizes, self.channel, self.dtype, self.use_pallas,
            name="attention"
        )(x, key_valid, patch_mask)
        x = x + _FeedForward(self.channel, self.dtype, name="ffn")(x)
        return x


class STTNGenerator(nn.Module):
    """Full generator with separately-callable encode/transform/decode stages.

    The split mirrors how inference amortises work: encode all frames of a
    chunk once, then run the (much heavier) transformer per window batch over
    gathered features, then decode only each window's neighbor outputs
    (reference flow: sttn_auto_inpaint.py:136-150).
    """

    variant: str = "auto"  # "auto" | "det"
    channel: int = 256
    stack_num: int = 8
    dtype: jnp.dtype = jnp.float32
    apply_attention_mask: bool = True  # det only; False = reference no-op bug
    patchsizes_override: Optional[Tuple[Tuple[int, int], ...]] = None  # tests
    # Route eligible attention scales through the fused Pallas flash kernel
    # (ops/pallas_token_attention.py); inference wrappers set this from
    # config.use_pallas. Auto-falls-back to the XLA path off-TPU.
    use_pallas: bool = False

    @property
    def patchsizes(self) -> Tuple[Tuple[int, int], ...]:
        if self.patchsizes_override is not None:
            return self.patchsizes_override
        return STTN_AUTO_PATCHSIZES if self.variant == "auto" else STTN_DET_PATCHSIZES

    def setup(self):
        self.encoder = STTNEncoder(self.channel, self.dtype)
        self.blocks = [
            TransformerBlock(self.patchsizes, self.channel, self.dtype,
                             self.use_pallas, name=f"block{i}")
            for i in range(self.stack_num)
        ]
        self.decoder = STTNDecoder(self.dtype)

    def encode(self, frames: jnp.ndarray) -> jnp.ndarray:
        """[N, H, W, 3] in [-1, 1] -> [N, h, w, C] features."""
        return self.encoder(frames.astype(self.dtype))

    def transform(
        self,
        feats: jnp.ndarray,  # [B, L, h, w, C]
        key_valid: Optional[jnp.ndarray] = None,  # [B, L] bool
        feat_mask: Optional[jnp.ndarray] = None,  # [B, L, h, w] hole mask
    ) -> jnp.ndarray:
        patch_mask = None
        if self.variant == "det" and self.apply_attention_mask:
            patch_mask = feat_mask
        x = feats.astype(self.dtype)
        for block in self.blocks:
            x = block(x, key_valid, patch_mask)
        return x

    def decode(self, feats: jnp.ndarray) -> jnp.ndarray:
        """[N, h, w, C] -> [N, H, W, 3] in [-1, 1]."""
        return self.decoder(feats.astype(self.dtype))

    def __call__(
        self,
        masked_frames: jnp.ndarray,  # [B, T, H, W, 3] in [-1, 1]
        masks: Optional[jnp.ndarray] = None,  # [B, T, H, W, 1] in {0, 1}
    ) -> jnp.ndarray:
        """Training-style forward over whole clips (ref forward methods)."""
        B, T, H, W, _ = masked_frames.shape
        frames = masked_frames.reshape(B * T, H, W, 3)
        feats = self.encode(frames)
        h, w = feats.shape[1:3]
        feats = feats.reshape(B, T, h, w, self.channel)
        feat_mask = None
        if masks is not None:
            # nearest 1/4 downsample, matching torch F.interpolate nearest
            feat_mask = masks[:, :, ::4, ::4, 0]
        feats = self.transform(feats, key_valid=None, feat_mask=feat_mask)
        out = self.decode(feats.reshape(B * T, h, w, self.channel))
        return out.reshape(B, T, H, W, 3)
