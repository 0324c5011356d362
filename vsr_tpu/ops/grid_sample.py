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

import jax
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

    One lax.gather of a [2, 2, C] corner block per sample instead of four
    per-corner row gathers: TPU gather cost is dominated by per-row index
    overhead, and the blocked form measures ~1.8x faster at ProPainter's
    deformable-alignment shapes (the profiled round-3 bottleneck: ~20 s of a
    28 s window sweep was corner gathers). Exactness at the borders is kept
    by a 1-pixel zero pad (so corner (x0, y0) always sits at block position
    (0, 0) whenever any corner is in range) plus per-corner in-bounds weight
    zeroing identical to the reference sampler's semantics.
    """
    B, H, W, C = img.shape
    out_shape = coords.shape[:-1] + (C,)
    coords = coords.reshape(B, -1, 2)
    x, y = coords[..., 0], coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img.dtype)
    wy = (y - y0).astype(img.dtype)

    if C < 8:
        # blocked gather is pathological at skinny channel counts (flow
        # fields C=2-3: the 720p image-propagation stage went from 1.9 s to
        # minutes) — keep the fused per-corner path there
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
        wxe = wx[..., None]
        wye = wy[..., None]
        out = ((1 - wye) * ((1 - wxe) * v00 + wxe * v01)
               + wye * ((1 - wxe) * v10 + wxe * v11))
        return out.reshape(out_shape)

    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # block start in padded coords; for x0 in [-1, W-1] this is exact with no
    # clamping, outside that range every corner weight below is zero anyway
    sy = jnp.clip(y0 + 1, 0, H).astype(jnp.int32)
    sx = jnp.clip(x0 + 1, 0, W).astype(jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patch = jax.lax.gather(
        imgp, jnp.stack([sy, sx], axis=-1), dn, slice_sizes=(1, 2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, N, 2, 2, C]

    def inb(xi, yi):
        return ((xi >= 0) & (xi <= W - 1) & (yi >= 0)
                & (yi <= H - 1)).astype(img.dtype)

    w00 = ((1 - wx) * (1 - wy) * inb(x0, y0))[..., None]
    w01 = (wx * (1 - wy) * inb(x0 + 1, y0))[..., None]
    w10 = ((1 - wx) * wy * inb(x0, y0 + 1))[..., None]
    w11 = (wx * wy * inb(x0 + 1, y0 + 1))[..., None]
    out = (w00 * patch[:, :, 0, 0] + w01 * patch[:, :, 0, 1]
           + w10 * patch[:, :, 1, 0] + w11 * patch[:, :, 1, 1])
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
