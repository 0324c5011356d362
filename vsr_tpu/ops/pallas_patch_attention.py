"""Pallas TPU kernel: fused patch attention for one STTN scale.

The XLA path (ops/patch_attention.py) materializes patch-token matrices with
reshape/transpose chains — profiled at ~30% of the STTN chunk step as pure
relayout/copy work. This kernel reads q/k/v in their natural grid layout
[L, h, w, dk] and performs token extraction, scaled-dot-product, online
softmax and value accumulation in one pass per (batch, query-strip):

* a "strip" is one (frame, patch-row) pair = ``w//pw`` tokens whose patch
  pixels live in ``ph`` contiguous grid rows — loading a strip is a plain
  slice, and the [ph, w, dk] -> [n_tok, D] token view is a cheap in-register
  relayout;
* the kernel grid is (B, L*n_strips) over query strips; keys/values stay in
  HBM and stream strip-by-strip through a double-buffered DMA pipeline with a
  running (max, sum, acc) online softmax — scores never touch HBM;
* invalid (padded) frames get an additive -1e9 per key strip.

Equivalence with the XLA path is tested in interpret mode (CPU); on-device
use is opt-in (config.use_pallas) pending a perf win over XLA's lowering.
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


def _attention_kernel(ph, pw, n_strips, L, scale,
                      valid_ref, q_ref, k_hbm, v_hbm, o_ref):
    """Grid: (B, L*n_strips).

    valid_ref: [1, L] additive bias (0 / -1e9), VMEM
    q_ref/o_ref: [1, 1, ph, w, dk] query/output strip, VMEM
    k_hbm/v_hbm: [1, L, h, w, dk] in HBM/ANY — strips DMA'd in.
    """
    dk = q_ref.shape[-1]
    w = q_ref.shape[-2]
    n_tok = w // pw
    D = ph * pw * dk
    b = pl.program_id(0)
    q = _strip_to_tokens(q_ref[0, 0], ph, pw).astype(jnp.float32) * scale
    total = L * n_strips

    def run(k_buf, v_buf, sems):
        def make_dmas(slot, idx):
            frame = idx // n_strips
            row = idx % n_strips
            kc = pltpu.make_async_copy(
                k_hbm.at[b, frame, pl.ds(row * ph, ph)],
                k_buf.at[slot], sems.at[slot, 0])
            vc = pltpu.make_async_copy(
                v_hbm.at[b, frame, pl.ds(row * ph, ph)],
                v_buf.at[slot], sems.at[slot, 1])
            return kc, vc

        def start_dma(slot, idx):
            kc, vc = make_dmas(slot, idx)
            kc.start()
            vc.start()

        start_dma(0, 0)

        m0 = jnp.full((n_tok, 1), -jnp.inf, jnp.float32)
        s0 = jnp.zeros((n_tok, 1), jnp.float32)
        a0 = jnp.zeros((n_tok, D), jnp.float32)

        def body(i, carry):
            m, s, acc = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < total)
            def _():
                start_dma(nxt, i + 1)

            frame = i // n_strips
            kc, vc = make_dmas(slot, i)
            kc.wait()
            vc.wait()

            kt = _strip_to_tokens(k_buf[slot], ph, pw).astype(jnp.float32)
            vt = _strip_to_tokens(v_buf[slot], ph, pw).astype(jnp.float32)
            scores = jax.lax.dot_general(
                q, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = scores + valid_ref[0, frame]
            m_new = jnp.maximum(m, scores.max(axis=-1, keepdims=True))
            correction = jnp.exp(m - m_new)
            p = jnp.exp(scores - m_new)
            s_new = s * correction + p.sum(axis=-1, keepdims=True)
            acc_new = acc * correction + jax.lax.dot_general(
                p, vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, s_new, acc_new

        m, s, acc = jax.lax.fori_loop(0, total, body, (m0, s0, a0))
        out = acc / s
        o_ref[0, 0] = _tokens_to_strip(out, ph, pw, dk).astype(o_ref.dtype)

    pl.run_scoped(
        run,
        k_buf=pltpu.VMEM((2, ph, w, dk), q_ref.dtype),
        v_buf=pltpu.VMEM((2, ph, w, dk), q_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


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
    D = ph * pw * dk
    scale = 1.0 / math.sqrt(D)

    if key_valid is None:
        bias = jnp.zeros((B, L), jnp.float32)
    else:
        bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)

    kernel = functools.partial(_attention_kernel, ph, pw, n_strips, L, scale)

    grid = (B, L * n_strips)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ph, w, dk),
                         lambda b, i: (b, i // n_strips, i % n_strips, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ph, w, dk),
            lambda b, i: (b, i // n_strips, i % n_strips, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(bias, q, k, v)
