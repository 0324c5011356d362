"""Flow training losses (parity with backend/inpaint/video/model/modules/
flow_comp_raft.py:59-140 and flow_loss_utils.py): first/second-order edge-
weighted smoothness and the census (ternary) photometric loss."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vsr_tpu.ops.grid_sample import flow_warp


def _grad_x(img):
    return img[:, :, :-1] - img[:, :, 1:]


def _grad_y(img):
    return img[:, :-1] - img[:, 1:]


def smoothness_loss(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """First-order flow smoothness inside the mask.

    flow [B, H, W, 2]; mask [B, H, W, 1]."""
    mask_x = mask[:, :, :-1] * mask[:, :, 1:]
    mask_y = mask[:, :-1] * mask[:, 1:]
    loss = (jnp.abs(_grad_x(flow)) * mask_x).mean() \
        + (jnp.abs(_grad_y(flow)) * mask_y).mean()
    return loss / 2.0


def second_order_smoothness_loss(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Second-order (curvature) smoothness inside the mask."""
    def gxx(x):
        return x[:, :, :-2] - 2 * x[:, :, 1:-1] + x[:, :, 2:]

    def gyy(x):
        return x[:, :-2] - 2 * x[:, 1:-1] + x[:, 2:]

    mask_x = mask[:, :, :-2] * mask[:, :, 1:-1] * mask[:, :, 2:]
    mask_y = mask[:, :-2] * mask[:, 1:-1] * mask[:, 2:]
    return ((jnp.abs(gxx(flow)) * mask_x).mean()
            + (jnp.abs(gyy(flow)) * mask_y).mean()) / 2.0


def _ternary_transform(img: jnp.ndarray, patch: int = 7) -> jnp.ndarray:
    """Census transform: per-pixel normalized differences to its patch.

    img [B, H, W, C] in [0, 1]; returns [B, H, W, patch*patch]."""
    gray = (img * 255.0).mean(axis=-1, keepdims=True)
    pad = patch // 2
    padded = jnp.pad(gray, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    B, H, W, _ = img.shape
    taps = [
        padded[:, i : i + H, j : j + W, 0]
        for i in range(patch) for j in range(patch)
    ]
    neighbors = jnp.stack(taps, axis=-1)
    diff = neighbors - gray
    return diff / jnp.sqrt(0.81 + jnp.square(diff))


def ternary_loss(
    frame1: jnp.ndarray,
    warped_frame2: jnp.ndarray,
    valid_mask: jnp.ndarray,
    patch: int = 7,
) -> jnp.ndarray:
    """Census-transform photometric distance between frame1 and the
    flow-warped frame2, masked by flow validity (flow_comp_raft.py ternary
    loss semantics). Frames [B, H, W, 3] in [0, 1]; mask [B, H, W, 1]."""
    t1 = _ternary_transform(frame1, patch)
    t2 = _ternary_transform(warped_frame2, patch)
    dist = jnp.square(t1 - t2)
    dist = dist / (0.1 + dist)
    dist = dist.sum(axis=-1, keepdims=True)
    pad = patch // 2
    inner = jnp.zeros_like(valid_mask)
    inner = inner.at[:, pad:-pad, pad:-pad].set(1.0)
    mask = valid_mask * inner
    return (dist * mask).sum() / jnp.clip(mask.sum(), 1.0)


def flow_warp_loss(
    frame1: jnp.ndarray,
    frame2: jnp.ndarray,
    flow_f: jnp.ndarray,
    valid_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Convenience: warp frame2 by forward flow, census-compare to frame1."""
    warped = flow_warp(frame2, flow_f)
    return ternary_loss(frame1, warped, valid_mask)
