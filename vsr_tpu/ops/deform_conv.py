"""Modulated deformable convolution (DCNv2) for TPU.

The one op the reference gets from native torchvision C++/CUDA
(backend/inpaint/video/model/modules/deformconv.py:7-54 ->
torchvision.ops.deform_conv2d, used by ProPainter's feature alignment at
propainter.py:70 and recurrent_flow_completion.py:44).

TPU decomposition (per SURVEY.md §7 "hard parts"): a 3x3 modulated deform
conv is 9 bilinear gathers at learned offsets, each scaled by a sigmoid
modulation mask, contracted with the conv weight. Two paths:

* generic path: one blocked corner gather per (position, group, tap) feeding
  an MXU einsum — correct for arbitrary offsets;
* patch path (``center``/``spread`` given): TPU gather cost is per-row
  overhead bound (~tens of ns/row; profiled 35 ms of every 61 ms
  feature-propagation scan step at the 720p band = 2.76M rows/step), and
  ProPainter's offsets are structurally LOCAL: offset = center + residual
  with |residual| <= max_residue_magnitude (tanh-bounded, propainter.py:64,
  recurrent_flow_completion.py:37) and the center (the completed flow, or 0)
  shared by every group and tap at a position. So ONE [P, P, C] patch around
  p + center(p) covers all G*K taps' bilinear corners: G*K*4-fold fewer
  gather rows (144x at ProPainter's G=16, K=9), and the per-tap bilinear
  becomes two dense one-hot contractions over the patch axes (iota compares
  + batched matmuls — the same trick as RAFT's corr lookup,
  models/propainter/raft.py:_lookup_level_onehot).

Offset groups: channels split into ``groups`` contiguous blocks, each with
its own 9 offsets/modulations (torchvision's deform_groups).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vsr_tpu.ops.grid_sample import grid_sample_bilinear

# A/B escape hatch: VSR_DEFORM_PATCH=0 forces the generic corner-gather path
# even when callers provide a center/bound.
_USE_PATCH = os.environ.get("VSR_DEFORM_PATCH", "1") != "0"


def _tap_grid(kh: int, kw: int):
    ky, kx = jnp.meshgrid(
        jnp.arange(kh) - (kh - 1) // 2, jnp.arange(kw) - (kw - 1) // 2,
        indexing="ij",
    )
    return jnp.stack([kx.reshape(-1), ky.reshape(-1)], -1).astype(jnp.float32)


def _deform_samples_generic(x, offset, weight):
    """Blocked-corner-gather sampling: [B, H, W, G, K, cg]."""
    B, H, W, C = x.shape
    kh, kw, _, _ = weight.shape
    G = offset.shape[3]
    K = kh * kw
    cg = C // G

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    base = jnp.stack([xs, ys], -1).astype(jnp.float32)  # [H, W, 2] (x, y)
    taps = _tap_grid(kh, kw)  # [K, 2] (x, y)

    # coords[b, h, w, g, k, (x, y)] — offset stores (dy, dx), flip to (dx, dy)
    off_xy = offset[..., ::-1].astype(jnp.float32)
    coords = base[None, :, :, None, None, :] + taps[None, None, None, None, :, :] + off_xy

    # fold groups into batch: x_g [B*G, H, W, cg]; coords_g [B*G, H*W*K, 2]
    x_g = x.reshape(B, H, W, G, cg).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W, cg)
    coords_g = coords.transpose(0, 3, 1, 2, 4, 5).reshape(B * G, H * W * K, 2)
    samples = grid_sample_bilinear(x_g, coords_g)  # [B*G, H*W*K, cg]
    return samples.reshape(B, G, H, W, K, cg).transpose(0, 2, 3, 1, 4, 5)


def _deform_samples_patch(x, offset, weight, center, spread: int):
    """Patch-gather sampling: [B, H, W, G, K, cg].

    center [B, H, W, 2] (dy, dx): per-position sampling centroid shared by
    all groups/taps; caller guarantees |offset - center| <= spread - tap
    radius per component (spread = tap_radius + ceil(residual bound)), so
    every bilinear corner of every tap lies in a P = 2*spread + 2 patch
    around p + center. Out-of-image corners contribute exactly zero (zeros
    padding + one-hot misses), matching torchvision's sampler.
    """
    B, H, W, C = x.shape
    kh, kw, _, _ = weight.shape
    G = offset.shape[3]
    K = kh * kw
    cg = C // G
    N = H * W
    D = spread
    P = 2 * D + 2
    pad = D + 1
    dtype = x.dtype

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    base = jnp.stack([xs, ys], -1).astype(jnp.float32)  # (x, y)
    taps = _tap_grid(kh, kw)

    c = base[None] + center[..., ::-1].astype(jnp.float32)  # [B, H, W, 2] (x, y)
    cfl = jnp.floor(c)

    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    Hp, Wp = H + 2 * pad, W + 2 * pad
    # patch start (top-left) in padded coords; clamping only binds when the
    # whole patch is outside the image, where every in-image corner test
    # below still resolves correctly (see the index-range proof in the tests)
    sx = jnp.clip(cfl[..., 0] - D + pad, 0, Wp - P).astype(jnp.int32)
    sy = jnp.clip(cfl[..., 1] - D + pad, 0, Hp - P).astype(jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    idx = jnp.stack([sy.reshape(B, N), sx.reshape(B, N)], axis=-1)
    patch = jax.lax.gather(
        xp, idx, dn, slice_sizes=(1, P, P, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, P, P, C]

    # absolute tap positions and within-patch float coordinates
    off_xy = offset[..., ::-1].astype(jnp.float32)
    pos = (base[:, :, None, None, :] + taps[None, None, :, :]
           )[None] + off_xy  # [B, H, W, G, K, 2]
    origin = jnp.stack([sx, sy], -1).astype(jnp.float32) - pad  # image coords
    u = pos - origin[:, :, :, None, None, :]
    ux = u[..., 0].reshape(B, N, G, K)
    uy = u[..., 1].reshape(B, N, G, K)

    iota = jnp.arange(P, dtype=jnp.float32)

    def onehot(uu):
        # [B, N, G, K, P]: bilinear weights along one patch axis; corners
        # outside [0, P) (possible only for out-of-image taps under start
        # clamping) match nothing and contribute zero
        u0 = jnp.floor(uu)
        frac = (uu - u0).astype(dtype)[..., None]
        eq0 = (iota == u0[..., None]).astype(dtype)
        eq1 = (iota == (u0[..., None] + 1.0)).astype(dtype)
        return eq0 * (1.0 - frac) + eq1 * frac

    wx = onehot(ux)
    wy = onehot(uy)
    # One REAL batched matmul per position instead of per-(g,k) microdots:
    # [G*K, P*P] x [P*P, C] rides the MXU (a two-stage per-group einsum
    # lowers to a ~30 ms/step VPU loop fusion at the 720p band). The matmul
    # computes every (tap, group-block) cross; the eye-select keeps only the
    # matching group's channel block (16x FLOP overdraw, but 70 GF/step on
    # the MXU beats 30 ms on the VPU by an order of magnitude).
    w2 = (wy[..., :, None] * wx[..., None, :]).reshape(B, N, G * K, P * P)
    pm = patch.reshape(B, N, P * P, C)
    full = jnp.einsum("bnkp,bnpc->bnkc", w2, pm,
                      preferred_element_type=jnp.float32).astype(dtype)
    full = full.reshape(B, N, G, K, G, cg)
    eye = jnp.eye(G, dtype=dtype)
    samples = (full * eye[None, None, :, None, :, None]).sum(axis=4)
    return samples.reshape(B, H, W, G, K, cg)


def modulated_deform_conv(
    x: jnp.ndarray,          # [B, H, W, C]
    offset: jnp.ndarray,     # [B, H, W, G, K, 2] (dy, dx) per group/kernel tap
    modulation: jnp.ndarray, # [B, H, W, G, K] in [0, 1]
    weight: jnp.ndarray,     # [kh, kw, C, Cout]
    bias: Optional[jnp.ndarray] = None,  # [Cout]
    center: Optional[jnp.ndarray] = None,  # [B, H, W, 2] (dy, dx)
    residual_bound: Optional[float] = None,
) -> jnp.ndarray:
    """3x3 (or kxk) stride-1 same-padding modulated deformable conv.

    When ``center`` and ``residual_bound`` are given (with the guarantee
    |offset - center| <= residual_bound elementwise — ProPainter's
    tanh-bounded offsets), sampling runs on the patch path: one patch gather
    per position instead of one corner-block gather per (position, group,
    tap). Numerically identical to the generic path (both are exact bilinear
    sampling with zeros padding; pinned by tests/test_deform_ops.py).
    """
    B, H, W, C = x.shape
    kh, kw, wc, cout = weight.shape
    G = offset.shape[3]
    K = kh * kw
    assert offset.shape == (B, H, W, G, K, 2), offset.shape
    assert modulation.shape == (B, H, W, G, K), modulation.shape
    assert wc == C and C % G == 0

    if center is not None and _USE_PATCH:
        assert residual_bound is not None
        spread = max((kh - 1) // 2, (kw - 1) // 2) + math.ceil(residual_bound)
        samples = _deform_samples_patch(x, offset, weight,
                                        center.astype(jnp.float32), spread)
    else:
        samples = _deform_samples_generic(x, offset, weight)

    samples = samples * modulation[..., None].astype(samples.dtype)

    # contract with weight: samples [B, H, W, K, G*cg] x W [K, C, Cout]
    samples = samples.reshape(B, H, W, G, K, C // G).transpose(
        0, 1, 2, 4, 3, 5).reshape(B, H, W, K, C)
    w_flat = weight.reshape(K, C, cout)
    out = jnp.einsum("bhwkc,kco->bhwo", samples, w_flat,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
