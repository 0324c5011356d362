"""Bilinear 2x upsampling with torch align_corners=True semantics.

The reference decoder upsamples with ``F.interpolate(scale_factor=2,
mode='bilinear', align_corners=True)`` (backend/inpaint/sttn/auto_sttn.py:125).
``jax.image.resize`` only implements half-pixel-center sampling, so converted
torch weights would see a shifted grid; this op reproduces the align-corners
grid exactly: src = dst * (H_in - 1) / (H_out - 1).

Implemented as two dense gathers + lerps along H then W — XLA fuses this into
a couple of vectorized selects; no Pallas needed (bandwidth-bound, tiny op).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_weights(n_in: int, n_out: int):
    """Static gather indices / lerp weights for align-corners resampling."""
    if n_in == 1:
        idx0 = np.zeros(n_out, np.int32)
        return idx0, idx0, np.zeros(n_out, np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(src).astype(np.int32)
    i0 = np.minimum(i0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (src - i0).astype(np.float32)
    return i0, i1, w


def upsample_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [..., H, W, C] to [..., out_h, out_w, C], align-corners bilinear."""
    h, w = x.shape[-3], x.shape[-2]
    i0, i1, wy = _axis_weights(h, out_h)
    j0, j1, wx = _axis_weights(w, out_w)
    wy = jnp.asarray(wy, x.dtype).reshape((out_h, 1, 1))
    wx = jnp.asarray(wx, x.dtype).reshape((out_w, 1))

    rows = (1 - wy) * jnp.take(x, i0, axis=-3) + wy * jnp.take(x, i1, axis=-3)
    out = (1 - wx) * jnp.take(rows, j0, axis=-2) + wx * jnp.take(rows, j1, axis=-2)
    return out


def upsample_bilinear_2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x upsample of [..., H, W, C]."""
    return upsample_bilinear_align_corners(x, 2 * x.shape[-3], 2 * x.shape[-2])
