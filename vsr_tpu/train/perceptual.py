"""Perceptual (VGG) and LPIPS training losses.

Functional ports of the reference's PerceptualLoss and LPIPSLoss
(backend/inpaint/video/core/loss.py:6-144): weighted per-layer feature
distance (l1/mse/fro) with optional Gram-matrix style term, and the
lpips-metric loss with the reference's input-normalization chain.

Both take explicit frozen feature-extractor params (loaded via
convert/torch_vgg.py / convert/torch_lpips.py) — in a jitted train step the
params ride along as closure constants or donated inputs; gradients flow
through the features to the prediction only (the reference detaches gt,
loss.py:71).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from vsr_tpu.models.lpips import LPIPS
from vsr_tpu.models.vgg import VGGFeatures


def _criterion(a: jnp.ndarray, b: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "l1":
        return jnp.mean(jnp.abs(a - b))
    if kind in ("l2", "mse"):
        return jnp.mean((a - b) ** 2)
    if kind == "fro":
        return jnp.linalg.norm((a - b).reshape(-1))
    raise NotImplementedError(f"{kind} criterion has not been supported.")


def _gram(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C, C] Gram matrix, ref loss.py:102-114."""
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)


def perceptual_loss(
    vgg_params: Mapping,
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    layer_weights: Dict[str, float],
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    range_norm: bool = False,
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
    criterion: str = "l1",
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Returns (perceptual, style) losses — None for zero-weighted terms.

    pred/gt: [B, H, W, 3]; gt is gradient-stopped (ref detaches, loss.py:71).
    """
    net = VGGFeatures(tuple(layer_weights), vgg_type=vgg_type,
                      use_input_norm=use_input_norm, range_norm=range_norm)
    fx = net.apply(vgg_params, pred)
    fgt = net.apply(vgg_params, jax.lax.stop_gradient(gt))

    percep = None
    if perceptual_weight > 0:
        percep = sum(
            _criterion(fx[k], fgt[k], criterion) * w
            for k, w in layer_weights.items()
        ) * perceptual_weight
    style = None
    if style_weight > 0:
        style = sum(
            _criterion(_gram(fx[k]), _gram(fgt[k]), criterion) * w
            for k, w in layer_weights.items()
        ) * style_weight
    return percep, style


def lpips_loss(
    lpips_params: Mapping,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    loss_weight: float = 1.0,
    use_input_norm: bool = True,
    range_norm: bool = False,
) -> jnp.ndarray:
    """The reference LPIPSLoss forward (loss.py:133-144): optional
    [-1,1]->[0,1] then ImageNet normalization, then the lpips metric."""
    from vsr_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD

    if range_norm:
        pred = (pred + 1.0) / 2.0
        target = (target + 1.0) / 2.0
    if use_input_norm:
        mean = jnp.asarray(IMAGENET_MEAN, pred.dtype)
        std = jnp.asarray(IMAGENET_STD, pred.dtype)
        pred = (pred - mean) / std
        target = (target - mean) / std
    metric = LPIPS().apply(lpips_params, target, pred)
    return loss_weight * metric.mean()
