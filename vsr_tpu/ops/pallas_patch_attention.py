"""Pallas TPU kernel: fused patch attention for one STTN scale.

The XLA path (ops/patch_attention.py) materializes patch-token matrices with
reshape/transpose chains — profiled at ~30% of the STTN chunk step as pure
relayout/copy work. This kernel reads q/k/v in their natural grid layout
[L, h, w, dk] and performs token extraction, scaled-dot-product, online
softmax and value accumulation in one fused pass.

Structure (canonical TPU flash pattern):
* a "strip" is one (frame, patch-row) pair = ``w//pw`` tokens whose patch
  pixels are ``ph`` contiguous grid rows — so a strip is a plain block and
  the [ph, w, dk] -> [n_tok, D] token view is an in-register relayout;
* grid = (B, n_q_strips, n_k_strips): the Pallas pipeline streams key/value
  strips with automatic double-buffered DMA; online-softmax state (max, sum,
  accumulator) lives in VMEM scratch, which persists across the sequential
  k-strip grid steps; the output strip is written on the last k step;
* invalid (padded) frames get an additive -1e9 via the [B, L] bias input.

Equivalence with the XLA path is tested in interpret mode (CPU); on-device
use is opt-in (config.use_pallas).

Toolchain status (round 1): this environment's remote Mosaic compiler
(axon tpu_compile_helper) returns an opaque HTTP 500 for the
strip->token relayout feeding the MXU (bisected: the 5D block specs, 3D
grid, scratch accumulation, SMEM bias, and plain [32, 960] dots each compile
fine in isolation; reshape(ph, n_tok, pw, dk).transpose(1, 0, 2, 3) feeding a
dot does not, even when materialized through VMEM scratch; multi-contracting
-dim dot_general fails 'tpu.matmul' op verification). The XLA lowering of
ops/patch_attention.py remains the production path until the kernel can be
compiled on a standard Mosaic build.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _strip_to_tokens(strip: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """[ph, w, dk] grid strip -> [w//pw, ph*pw*dk] token matrix."""
    _, w, dk = strip.shape
    n_tok = w // pw
    t = strip.reshape(ph, n_tok, pw, dk).transpose(1, 0, 2, 3)
    return t.reshape(n_tok, ph * pw * dk)


def _tokens_to_strip(tokens: jnp.ndarray, ph: int, pw: int, dk: int) -> jnp.ndarray:
    """[n_tok, D] -> [ph, w, dk]."""
    n_tok = tokens.shape[0]
    t = tokens.reshape(n_tok, ph, pw, dk).transpose(1, 0, 2, 3)
    return t.reshape(ph, n_tok * pw, dk)


def _attention_kernel(ph, pw, n_strips, scale,
                      valid_ref, q_ref, k_ref, v_ref, o_ref,
                      m_sc, s_sc, acc_sc):
    """Grid: (B, n_q_strips, n_k_strips) — k dim innermost/sequential.

    valid_ref: [1, 1, L] additive bias row for this batch item, SMEM
    q_ref/o_ref: [1, 1, ph, w, dk] query/output strip
    k_ref/v_ref: [1, 1, ph, w, dk] current key/value strip
    scratch: m/s [n_tok, 128] f32 (col 0 used), acc [n_tok, D] f32
    """
    j = pl.program_id(2)
    n_k = pl.num_programs(2)
    frame = j // n_strips

    @pl.when(j == 0)
    def _():
        # finite sentinel instead of -inf (Mosaic-safe); full-lane stores
        m_sc[...] = jnp.full_like(m_sc, -1e30)
        s_sc[...] = jnp.zeros_like(s_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = _strip_to_tokens(q_ref[0, 0], ph, pw).astype(jnp.float32) * scale
    kt = _strip_to_tokens(k_ref[0, 0], ph, pw).astype(jnp.float32)
    vt = _strip_to_tokens(v_ref[0, 0], ph, pw).astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, kt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [n_tok, n_tok_k]
    scores = scores + valid_ref[0, 0, frame]

    m_prev = m_sc[:, :1]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    s_new = s_sc[:, :1] * correction + p.sum(axis=-1, keepdims=True)
    acc_new = acc_sc[...] * correction + jax.lax.dot_general(
        p, vt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # store broadcast across the full 128-lane scratch (single-lane stores
    # are not lowerable on all Mosaic builds)
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    s_sc[...] = jnp.broadcast_to(s_new, s_sc.shape)
    acc_sc[...] = acc_new

    @pl.when(j == n_k - 1)
    def _():
        out = acc_sc[...] / s_sc[:, :1]
        dk = o_ref.shape[-1]
        o_ref[0, 0] = _tokens_to_strip(out, ph, pw, dk).astype(o_ref.dtype)


def patch_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    patch: Tuple[int, int],
    key_valid: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused single-scale patch attention.

    q/k/v: [B, L, h, w, dk]; patch (pw, ph); key_valid: [B, L] bool.
    Returns [B, L, h, w, dk]. Matches
    ops.patch_attention.patch_attention_single_scale (tested).
    """
    pw, ph = patch
    B, L, h, w, dk = q.shape
    assert h % ph == 0 and w % pw == 0
    n_strips = h // ph
    n_tok = w // pw
    D = ph * pw * dk
    scale = 1.0 / math.sqrt(D)

    if key_valid is None:
        bias = jnp.zeros((B, 1, L), jnp.float32)
    else:
        bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, :]

    kernel = functools.partial(_attention_kernel, ph, pw, n_strips, scale)

    strip_spec = lambda: pl.BlockSpec(
        (1, 1, ph, w, dk),
        lambda b, i, j: (b, i // n_strips, i % n_strips, 0, 0),
        memory_space=pltpu.VMEM)
    kv_spec = lambda: pl.BlockSpec(
        (1, 1, ph, w, dk),
        lambda b, i, j: (b, j // n_strips, j % n_strips, 0, 0),
        memory_space=pltpu.VMEM)

    grid = (B, L * n_strips, L * n_strips)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            strip_spec(),
            kv_spec(),
            kv_spec(),
        ],
        out_specs=strip_spec(),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((n_tok, 128), jnp.float32),
            pltpu.VMEM((n_tok, 128), jnp.float32),
            pltpu.VMEM((n_tok, D), jnp.float32),
        ],
        interpret=interpret,
    )(bias, q, k, v)
