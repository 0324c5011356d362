"""Unfold (im2col) / fold (col2im) with torch layout.

ProPainter's SoftSplit/SoftComp tokenization and FusionFeedForward
renormalization are unfold/fold round trips (sparse_transformer.py:7-101).
Torch layout: token features ordered channel-major (c, kh, kw).

unfold lowers to lax.conv_general_dilated_patches (one XLA op);
fold is kh*kw strided scatter-adds, which XLA fuses into a handful of
dynamic-update windows — fine at the 1/4-resolution feature maps it runs on.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def unfold_output_size(size: int, k: int, s: int, p: int) -> int:
    return (size + 2 * p - (k - 1) - 1) // s + 1


def unfold(x: jnp.ndarray, kernel: Tuple[int, int], stride: Tuple[int, int],
           padding: Tuple[int, int]) -> jnp.ndarray:
    """x [B, H, W, C] -> [B, oh, ow, C*kh*kw] tokens (channel-major taps)."""
    kh, kw = kernel
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return patches


def fold(tokens: jnp.ndarray, out_hw: Tuple[int, int],
         kernel: Tuple[int, int], stride: Tuple[int, int],
         padding: Tuple[int, int]) -> jnp.ndarray:
    """tokens [B, oh, ow, C*kh*kw] (channel-major taps) -> [B, H, W, C]
    by overlap-add (torch F.fold)."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    H, W = out_hw
    B, oh, ow, ck = tokens.shape
    C = ck // (kh * kw)
    vals = tokens.reshape(B, oh, ow, C, kh, kw)
    out = jnp.zeros((B, H + 2 * ph, W + 2 * pw, C), tokens.dtype)
    for i in range(kh):
        for j in range(kw):
            out = out.at[:, i : i + sh * oh : sh, j : j + sw * ow : sw, :].add(
                vals[:, :, :, :, i, j]
            )
    return out[:, ph : ph + H, pw : pw + W, :]


def fold_normalizer(out_hw: Tuple[int, int], kernel: Tuple[int, int],
                    stride: Tuple[int, int], padding: Tuple[int, int],
                    oh: int, ow: int, dtype=jnp.float32) -> jnp.ndarray:
    """fold(ones) — the per-pixel overlap count used to renormalize."""
    ones = jnp.ones((1, oh, ow, kernel[0] * kernel[1]), dtype)
    return fold(ones, out_hw, kernel, stride, padding)
