"""Pallas TPU kernel: flash attention over pre-tokenized patch tokens.

Round-1's fused kernel did the grid->token relayout *inside* the kernel;
this environment's remote Mosaic compiler 500s on exactly that construct
(bisect, for the record: 5D block specs, 3D grid, scratch accumulation, and
plain [32, 960] dots each compile fine in isolation;
``reshape(ph, n_tok, pw, dk).transpose(1, 0, 2, 3)`` feeding a dot does
not, even when materialized through VMEM scratch; multi-contracting-dim
dot_general fails 'tpu.matmul' verification). This kernel takes the
restructuring that dodges all of it: XLA performs the (cheap, fusable)
tokenization outside, and the kernel is a textbook flash attention over
[B, N, D] token matrices — dots, exp, max only; no reshapes or transposes.

What it buys on the STTN hot path (ops/patch_attention.py): the XLA path
materializes [B, N, N] fp32 score tensors (N up to ~5k tokens per window
batch -> ~100 MB per block per scale) and runs softmax over them in HBM —
profiled as the dominant "fusion" cost of the chunk step. Here scores live
in VMEM tiles with online softmax; HBM traffic drops to the q/k/v/token
reads + one output write.

Numerics: fp32 score/softmax accumulation regardless of input dtype (same
contract as the XLA path); additive key bias folds both the padded-frame
mask and the det-variant hole-patch mask.

Used for scales whose D = ph*pw*dk fits VMEM blocks (the small-patch scales,
which are exactly the large-N, score-dominated ones); the big-patch scales
(N tiny, D ~77k) stay on the XLA path where score tensors are negligible.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _flash_kernel(scale, q_ref, k_ref, v_ref, bias_ref, o_ref,
                  m_sc, s_sc, acc_sc):
    """Grid (B, n_q_blocks, n_k_blocks), k innermost/sequential.

    q_ref/o_ref: [1, qb, D]; k_ref/v_ref: [1, kb, D];
    bias_ref: [1, 1, kb] additive key bias (0 or -1e9).
    Scratch: m/s [qb, 128] f32 (lane-broadcast), acc [qb, D] f32.
    """
    j = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_sc[...] = jnp.full_like(m_sc, -1e30)
        s_sc[...] = jnp.zeros_like(s_sc)
        acc_sc[...] = jnp.zeros_like(acc_sc)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [qb, kb]
    scores = scores + bias_ref[0]  # [1, kb] broadcasts over rows

    m_prev = m_sc[:, :1]
    m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
    correction = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)
    s_new = s_sc[:, :1] * correction + p.sum(axis=-1, keepdims=True)
    acc_new = acc_sc[...] * correction + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    # full-lane stores (single-lane stores fail on some Mosaic builds)
    m_sc[...] = jnp.broadcast_to(m_new, m_sc.shape)
    s_sc[...] = jnp.broadcast_to(s_new, s_sc.shape)
    acc_sc[...] = acc_new

    @pl.when(j == n_k - 1)
    def _():
        o_ref[0] = (acc_sc[...] / s_sc[:, :1]).astype(o_ref.dtype)


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _divisor_block(n: int, want: int, unit: int) -> int:
    """Largest divisor of n that is <= want and a multiple of ``unit``.

    n must already be a multiple of ``unit`` (callers pad first)."""
    if n <= want:
        return n
    for b in range(want - want % unit, unit - 1, -unit):
        if n % b == 0:
            return b
    return n


def flash_token_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_bias: Optional[jnp.ndarray] = None,
    q_block: int = 256,
    k_block: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D) + bias) v over token matrices.

    q/k/v: [B, N, D] (N_q may differ from N_k); key_bias: [B, N_k] additive
    (0 / -1e9). Returns [B, N_q, D] in q.dtype. Matches the XLA einsum path
    to ~1e-3 in bf16 (tested in tests/test_pallas_attention.py).

    Token counts are padded internally — queries to a multiple of 8 (rows
    sliced off the output), keys to a multiple of 128 with a 2*NEG_INF bias
    — so every block shape satisfies the (8, 128) Mosaic tiling rule
    regardless of L-dependent N. The pad sentinel is strictly below the
    caller's NEG_INF mask value so that even when EVERY real key is masked
    (reachable in the det variant when all key patches exceed the hole-mean
    threshold) the softmax still distributes over real keys only, matching
    the XLA path instead of leaking weight onto zero-valued padded rows.
    """
    B, Nq, D = q.shape
    Nk = k.shape[1]
    scale = 1.0 / math.sqrt(D)

    if key_bias is None:
        key_bias = jnp.zeros((B, Nk), jnp.float32)
    nq_pad = _pad_to(Nq, 8)
    nk_pad = _pad_to(Nk, 128)
    if nq_pad != Nq:
        q = jnp.pad(q, ((0, 0), (0, nq_pad - Nq), (0, 0)))
    if nk_pad != Nk:
        k = jnp.pad(k, ((0, 0), (0, nk_pad - Nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, nk_pad - Nk), (0, 0)))
    key_bias = jnp.pad(key_bias.astype(jnp.float32),
                       ((0, 0), (0, nk_pad - Nk)),
                       constant_values=2 * NEG_INF)
    qb = _divisor_block(nq_pad, q_block, 8)
    kb = _divisor_block(nk_pad, k_block, 128)
    bias = key_bias[:, None, :]

    kernel = functools.partial(_flash_kernel, scale)
    grid = (B, nq_pad // qb, nk_pad // kb)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kb), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qb, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nq_pad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((qb, 128), jnp.float32),
            pltpu.VMEM((qb, 128), jnp.float32),
            pltpu.VMEM((qb, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :Nq] if nq_pad != Nq else out
