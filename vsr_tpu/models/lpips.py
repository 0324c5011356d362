"""LPIPS perceptual metric (vgg16 backbone) in flax.

Replicates ``lpips.LPIPS(net='vgg', spatial=False)`` as used by the
reference's LPIPSLoss (backend/inpaint/video/core/loss.py:116-144):

  scaling layer (shift/scale buffers over [-1,1] input)
  -> vgg16 activations at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3
  -> channel-unit-normalize each activation (eps 1e-10)
  -> squared difference
  -> per-layer 1x1 no-bias conv head ("lin") -> spatial mean
  -> sum over layers.

Weights convert from the published lpips checkpoint via
convert/torch_lpips.py; activation parity is tested against an in-test
torch replica (tests/test_perceptual.py) since the lpips package is not
installed here.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from vsr_tpu.models.vgg import VGGFeatures

LPIPS_LAYERS: Tuple[str, ...] = (
    "relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"
)
# lpips.ScalingLayer buffers (the package pins these constants)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _unit_normalize(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(feat * feat, axis=-1, keepdims=True))
    return feat / (norm + eps)


class LPIPS(nn.Module):
    """Perceptual distance between two [B, H, W, 3] images in [-1, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        net = VGGFeatures(LPIPS_LAYERS, vgg_type="vgg16",
                          use_input_norm=False, dtype=self.dtype, name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, layer in enumerate(LPIPS_LAYERS):
            d = _unit_normalize(fx[layer]) - _unit_normalize(fy[layer])
            head = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name=f"lin{i}")
            total = total + head(d * d).mean(axis=(1, 2, 3))
        return total  # [B]
