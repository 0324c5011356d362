"""Spatio-temporal video discriminator for STTN GAN training.

Capability parity with the reference's Discriminator
(backend/inpaint/sttn/auto_sttn.py:246-288): six 3D convolutions with kernel
(3,5,5), spatial stride 2, spectral norm on all but the last, LeakyReLU 0.2.
Layout here is NDHWC ([B, T, H, W, C]) — TPU-native; the reference's
transpose dance to NCDHW disappears.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_K = (3, 5, 5)
_S = (1, 2, 2)


class VideoDiscriminator(nn.Module):
    nf: int = 64
    use_sigmoid: bool = False
    use_spectral_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False) -> jnp.ndarray:
        """x: [B, T, H, W, 3] in [-1, 1] -> [B, T', h', w', nf*4] features."""

        def sn_conv(features, name, padding):
            conv = nn.Conv(
                features, _K, strides=_S, padding=padding,
                use_bias=not self.use_spectral_norm,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )
            if self.use_spectral_norm:
                return nn.SpectralNorm(conv)
            return conv

        pad1 = ((1, 1), (1, 1), (1, 1))
        pad2 = ((1, 1), (2, 2), (2, 2))
        widths = [self.nf, self.nf * 2, self.nf * 4, self.nf * 4, self.nf * 4]
        pads = [pad1, pad2, pad2, pad2, pad2]
        for i, (width, pad) in enumerate(zip(widths, pads)):
            layer = sn_conv(width, f"conv{i}", pad)
            x = layer(x, update_stats=update_stats) if self.use_spectral_norm else layer(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(self.nf * 4, _K, strides=_S, padding=pad2,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv5")(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x
