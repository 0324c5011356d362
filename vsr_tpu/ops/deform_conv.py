"""Modulated deformable convolution (DCNv2) for TPU.

The one op the reference gets from native torchvision C++/CUDA
(backend/inpaint/video/model/modules/deformconv.py:7-54 ->
torchvision.ops.deform_conv2d, used by ProPainter's feature alignment at
propainter.py:70 and recurrent_flow_completion.py:44).

TPU decomposition (per SURVEY.md §7 "hard parts"): a 3x3 modulated deform
conv is 9 bilinear gathers at learned offsets, each scaled by a sigmoid
modulation mask, contracted with the conv weight — i.e. one big batched
gather feeding one MXU matmul:

    samples[b, p, k, cg]  = bilinear(x_g, p + k_off + offset[b, p, g, k])
    out[b, p, o]          = sum_{k, c} samples[b, p, k, c] * mod[b, p, g(c), k]
                            * W[k, c, o] + bias[o]

Offset groups: channels split into ``groups`` contiguous blocks, each with
its own 9 offsets/modulations (torchvision's deform_groups). The grouped
sampling is batched by folding the group axis into the batch dim, so it
remains a single grid_sample + einsum — no per-pixel loops, fully fused by
XLA. A Pallas fusion of gather+matmul is the planned follow-up for the hot
resolutions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from vsr_tpu.ops.grid_sample import grid_sample_bilinear


def modulated_deform_conv(
    x: jnp.ndarray,          # [B, H, W, C]
    offset: jnp.ndarray,     # [B, H, W, G, K, 2] (dy, dx) per group/kernel tap
    modulation: jnp.ndarray, # [B, H, W, G, K] in [0, 1]
    weight: jnp.ndarray,     # [kh, kw, C, Cout]
    bias: Optional[jnp.ndarray] = None,  # [Cout]
) -> jnp.ndarray:
    """3x3 (or kxk) stride-1 same-padding modulated deformable conv."""
    B, H, W, C = x.shape
    kh, kw, wc, cout = weight.shape
    G = offset.shape[3]
    K = kh * kw
    assert offset.shape == (B, H, W, G, K, 2), offset.shape
    assert modulation.shape == (B, H, W, G, K), modulation.shape
    assert wc == C and C % G == 0
    cg = C // G

    # base sampling positions: p + k_off (kernel taps relative to center)
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    base = jnp.stack([xs, ys], -1).astype(jnp.float32)  # [H, W, 2] (x, y)
    ky, kx = jnp.meshgrid(
        jnp.arange(kh) - (kh - 1) // 2, jnp.arange(kw) - (kw - 1) // 2,
        indexing="ij",
    )
    taps = jnp.stack([kx.reshape(-1), ky.reshape(-1)], -1).astype(jnp.float32)  # [K, 2] (x, y)

    # coords[b, h, w, g, k, (x, y)] — offset stores (dy, dx), flip to (dx, dy)
    off_xy = offset[..., ::-1].astype(jnp.float32)
    coords = base[None, :, :, None, None, :] + taps[None, None, None, None, :, :] + off_xy

    # fold groups into batch: x_g [B*G, H, W, cg]; coords_g [B*G, H*W, K, 2]
    x_g = x.reshape(B, H, W, G, cg).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W, cg)
    coords_g = coords.transpose(0, 3, 1, 2, 4, 5).reshape(B * G, H * W, K, 2)
    samples = grid_sample_bilinear(
        x_g, coords_g.reshape(B * G, H * W * K, 2))  # [B*G, H*W*K, cg]
    samples = samples.reshape(B, G, H, W, K, cg)

    mod = modulation.transpose(0, 3, 1, 2, 4)  # [B, G, H, W, K]
    samples = samples * mod[..., None].astype(samples.dtype)

    # contract with weight: samples [B, H, W, K, G*cg] x W [K, C, Cout]
    samples = samples.transpose(0, 2, 3, 4, 1, 5).reshape(B, H, W, K, C)
    w_flat = weight.reshape(K, C, cout)
    out = jnp.einsum("bhwkc,kco->bhwo", samples, w_flat,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
