"""Bilinear/nearest grid sampling in pixel coordinates (gather-based).

TPU replacement for torch ``F.grid_sample(align_corners=True,
padding_mode='zeros')`` as used by RAFT's correlation lookup
(raft/utils/utils.py:58-72) and ProPainter's flow_warp
(modules/flow_loss_utils.py:6). Works directly in pixel space: the torch
callers normalize coordinates with 2x/(W-1)-1 which align_corners maps
straight back to pixels, so the normalize/denormalize round trip is dropped.

Gather-based (jnp.take over flattened spatial dims): XLA lowers these to
dynamic-gathers that vectorize on the VPU; out-of-bounds taps get weight 0
(zeros padding semantics).
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img [B, H, W, C]; ix/iy [B, N] int32 -> [B, N, C] (clamped indices)."""
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = iy * W + ix
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample_bilinear(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """img [B, H, W, C]; coords [B, ..., 2] (x, y) pixel coords.

    Returns [B, ..., C]. Out-of-range taps contribute zero (zeros padding);
    matches torch grid_sample(align_corners=True, padding_mode='zeros') up to
    its boundary treatment of exactly-on-edge samples.
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)
    coords = coords.reshape(B, -1, 2)
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)

    def tap(xi, yi):
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = _gather_2d(img, xi_c, yi_c)
        return vals * inb[..., None].astype(img.dtype)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return out.reshape(out_shape)


def grid_sample_nearest(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor variant (torch rounds half away from floor via round)."""
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)
    coords = coords.reshape(B, -1, 2)
    x = jnp.round(coords[..., 0])
    y = jnp.round(coords[..., 1])
    inb = ((x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1))
    xi = jnp.clip(x, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y, 0, H - 1).astype(jnp.int32)
    vals = _gather_2d(img, xi, yi) * inb[..., None].astype(img.dtype)
    return vals.reshape(out_shape)


def flow_warp(
    x: jnp.ndarray, flow: jnp.ndarray, interpolation: str = "bilinear"
) -> jnp.ndarray:
    """Warp x [B, H, W, C] by flow [B, H, W, 2] ((dx, dy) like the reference's
    (x, y)-last grid): output(p) = x(p + flow(p)).
    """
    B, H, W, _ = flow.shape
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    base = jnp.stack([xs, ys], axis=-1).astype(flow.dtype)  # [H, W, 2]
    coords = base[None] + flow
    if interpolation == "nearest":
        return grid_sample_nearest(x, coords)
    return grid_sample_bilinear(x, coords)
