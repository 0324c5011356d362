"""Multi-scale spatio-temporal patch attention — the STTN hot kernel.

STTN's transformer splits the 256 feature channels into 4 groups, each
attending over a different spatial patch tiling of every frame in the window
(ref behaviour: backend/inpaint/sttn/auto_sttn.py:167-206). A token is one
(frame, patch) cell; its embedding is the flattened patch content of that
channel group. Attention is dense across all frames' tokens — this is what
lets masked regions borrow texture from temporally distant reference frames.

TPU-first design decisions:
* Tokens for a scale are built with a single reshape/transpose (layout
  [B, L, h, w, dk] -> [B, N, D]); XLA lowers this to a cheap relayout.
* QK^T / softmax / PV run per scale as big MXU matmuls; N is at most a few
  thousand while D reaches ~77k, so score materialisation is small and the
  matmuls are deep — exactly the MXU sweet spot. Scores accumulate in fp32
  regardless of the (bf16) compute dtype.
* Invalid (padded) frames and — for the detection variant — fully-masked
  patches are removed from the *key* set with an additive -1e9 bias; this is
  how ragged neighbor+reference windows become a single static shape.

The token-count/embedding-dim ordering inside D (patch-major vs channel-major)
deliberately differs from the reference's channel-major flatten: dot products
are permutation-invariant and the inverse transpose restores layout, so
results are identical while keeping NHWC-native strides.
"""

from __future__ import annotations

import math
import os
import warnings
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# Flash-kernel eligibility: scales whose token embedding D = ph*pw*dk fits
# VMEM blocking. These are the small-patch scales — exactly the ones whose
# [N, N] fp32 score tensors dominate the XLA path's HBM traffic (N ~ L*320
# tokens at the (5,3) scale). Big-patch scales have tiny N and huge D; their
# scores are negligible and they stay on the XLA path.
PALLAS_D_MAX = 4096

_pallas_ok: Optional[bool] = None


def _pallas_available() -> bool:
    """True when the backend runs our Pallas kernels (probed once).

    The remote Mosaic service behind the axon backend rejects some lowerings
    with opaque errors (see ops/pallas_token_attention.py docstring), so the
    first TPU-backend call compiles a tiny kernel and caches the verdict;
    failure falls back to the XLA path with a warning.
    """
    global _pallas_ok
    if _pallas_ok is None:
        if os.environ.get("VSR_TPU_DISABLE_PALLAS"):
            _pallas_ok = False
            return _pallas_ok
        if jax.default_backend() in ("cpu",):
            _pallas_ok = False
            return _pallas_ok
        try:
            from vsr_tpu.ops.pallas_token_attention import flash_token_attention

            # commit the probe input to the accelerator: a surrounding
            # jax.default_device(cpu) context (e.g. CPU-side param init)
            # must not fail the probe for the device the kernels target
            x = jax.device_put(jnp.zeros((1, 16, 128), jnp.bfloat16),
                               jax.devices()[0])
            jax.block_until_ready(flash_token_attention(x, x, x))
            _pallas_ok = True
        except Exception as e:  # opaque remote-compile errors included
            warnings.warn(f"Pallas attention unavailable on this backend, "
                          f"using the XLA path: {type(e).__name__}: {e}")
            _pallas_ok = False
    return _pallas_ok


def _tokens_to_grid(y: jnp.ndarray, B: int, L: int, out_h: int, out_w: int,
                    ph: int, pw: int, dk: int) -> jnp.ndarray:
    """[B, N, D] tokens -> [B, L, h, w, dk] feature grid (inverse of _grid_to_tokens)."""
    y = y.reshape(B, L, out_h, out_w, ph, pw, dk)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)  # B, L, out_h, ph, out_w, pw, dk
    return y.reshape(B, L, out_h * ph, out_w * pw, dk)


def _grid_to_tokens(x: jnp.ndarray, ph: int, pw: int) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """[B, L, h, w, dk] -> [B, N, D] patch tokens; returns dims for inversion."""
    B, L, h, w, dk = x.shape
    out_h, out_w = h // ph, w // pw
    x = x.reshape(B, L, out_h, ph, out_w, pw, dk)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # B, L, out_h, out_w, ph, pw, dk
    tokens = x.reshape(B, L * out_h * out_w, ph * pw * dk)
    return tokens, (B, L, out_h, out_w, ph, pw, dk)


def patch_attention_single_scale(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    patch: Tuple[int, int],
    key_valid: Optional[jnp.ndarray] = None,
    patch_masked: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Attention over one patch tiling.

    Args:
      q, k, v: [B, L, h, w, dk] channel-group features.
      patch: (pw, ph) patch size — width-first to match the reference's
        patchsize tuples (auto_sttn.py:69).
      key_valid: optional [B, L] bool; False frames are removed from the key set.
      patch_masked: optional [B, L, h, w] float/bool hole mask at feature
        resolution; a key token whose patch-mean > 0.5 is removed (detection
        variant, network_sttn.py:187-190 — applied here for real, see
        models/sttn.py for the reference no-op note).
      use_pallas: route eligible scales (D <= PALLAS_D_MAX) through the
        fused flash kernel (ops/pallas_token_attention.py) instead of
        materializing [B, N, N] fp32 scores.

    Returns: [B, L, h, w, dk].
    """
    pw, ph = patch
    B, L, h, w, dk = q.shape
    out_h, out_w = h // ph, w // pw
    n_spatial = out_h * out_w

    qt, dims = _grid_to_tokens(q, ph, pw)
    kt, _ = _grid_to_tokens(k, ph, pw)
    vt, _ = _grid_to_tokens(v, ph, pw)

    D = qt.shape[-1]
    key_bias = None
    if key_valid is not None:
        token_valid = jnp.repeat(key_valid, n_spatial, axis=1)  # [B, N]
        key_bias = jnp.where(token_valid, 0.0, NEG_INF)
    if patch_masked is not None:
        pm, _ = _grid_to_tokens(patch_masked[..., None].astype(jnp.float32), ph, pw)
        masked = jnp.mean(pm, axis=-1) > 0.5  # [B, N]
        mb = jnp.where(masked, NEG_INF, 0.0)
        key_bias = mb if key_bias is None else key_bias + mb

    if use_pallas and D <= PALLAS_D_MAX and _pallas_available():
        from vsr_tpu.ops.pallas_token_attention import flash_token_attention

        qb, kb = (256, 512) if D <= 1024 else (128, 256)
        y = flash_token_attention(qt, kt, vt, key_bias,
                                  q_block=qb, k_block=kb)
        return _tokens_to_grid(y, B, L, out_h, out_w, ph, pw, dk)

    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum(
        "bnd,bmd->bnm", qt, kt, preferred_element_type=jnp.float32
    ) * scale
    if key_bias is not None:
        scores = scores + key_bias[:, None, :]

    attn = jax.nn.softmax(scores, axis=-1)
    y = jnp.einsum(
        "bnm,bmd->bnd", attn.astype(vt.dtype), vt,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return _tokens_to_grid(y, B, L, out_h, out_w, ph, pw, dk)


def multi_scale_patch_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    patchsizes: Sequence[Tuple[int, int]],
    key_valid: Optional[jnp.ndarray] = None,
    patch_mask: Optional[jnp.ndarray] = None,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Split channels into len(patchsizes) groups and attend per scale.

    q/k/v: [B, L, h, w, C]; returns [B, L, h, w, C] (groups re-concatenated in
    order, matching the reference's torch.chunk/cat round trip).
    """
    n_scales = len(patchsizes)
    C = q.shape[-1]
    dk = C // n_scales
    outs: List[jnp.ndarray] = []
    for s, patch in enumerate(patchsizes):
        sl = slice(s * dk, (s + 1) * dk)
        outs.append(
            patch_attention_single_scale(
                q[..., sl], k[..., sl], v[..., sl],
                patch, key_valid=key_valid, patch_masked=patch_mask,
                use_pallas=use_pallas,
            )
        )
    return jnp.concatenate(outs, axis=-1)
