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
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9


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
    scale = 1.0 / math.sqrt(D)
    scores = jnp.einsum(
        "bnd,bmd->bnm", qt, kt, preferred_element_type=jnp.float32
    ) * scale

    bias = None
    if key_valid is not None:
        token_valid = jnp.repeat(key_valid, n_spatial, axis=1)  # [B, N]
        bias = jnp.where(token_valid, 0.0, NEG_INF)[:, None, :]
    if patch_masked is not None:
        pm, _ = _grid_to_tokens(patch_masked[..., None].astype(jnp.float32), ph, pw)
        masked = jnp.mean(pm, axis=-1) > 0.5  # [B, N]
        mb = jnp.where(masked, NEG_INF, 0.0)[:, None, :]
        bias = mb if bias is None else bias + mb
    if bias is not None:
        scores = scores + bias

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
            )
        )
    return jnp.concatenate(outs, axis=-1)
