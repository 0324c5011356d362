"""Probe: does the stock Pallas TPU flash-attention kernel lower on this
Mosaic build, and does it beat the XLA einsum attention path at STTN's
fine-scale shapes?

STTN-auto hot shapes (window_batch=2, L=23 slots, 640x120 input -> 30x160
features): scale (5,3) -> N=23*320=7360 tokens, D=960; scale (10,5) ->
N=23*96=2208, D=3200. The XLA path materialises [B, N, N] fp32 scores
(433 MB for scale 4) — flash avoids that.

Run on the real TPU (one process at a time!). Prints timings as JSON lines.
"""
import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def fetch_time(fn, *args, n=5):
    out = fn(*args)  # warmup/compile
    np.asarray(jax.tree.leaves(out)[0])  # sync fetch (block_until_ready lies on axon)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def xla_attn(q, k, v, kv_valid):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32) * scale
    s = s + jnp.where(kv_valid, 0.0, -1e9)[:, None, :]
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", a.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    rng = np.random.default_rng(0)
    results = {}

    for name, (B, N, D, n_pad, d_pad, blk) in {
        "scale4": (2, 7360, 960, 7680, 1024, 256),
        "scale3": (2, 2208, 3200, 2304, 3328, 128),
    }.items():
        q = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, N, D)), jnp.bfloat16)
        kv_valid = jnp.asarray(rng.uniform(size=(B, N)) > 0.2)

        t_xla = fetch_time(jax.jit(xla_attn), q, k, v, kv_valid)
        results[f"{name}_xla_ms"] = round(t_xla * 1e3, 2)
        print(json.dumps({name: "xla ok", "ms": results[f"{name}_xla_ms"]}))

        def flash_path(q, k, v, kv_valid):
            qp = jnp.pad(q, ((0, 0), (0, n_pad - N), (0, d_pad - D)))
            kp = jnp.pad(k, ((0, 0), (0, n_pad - N), (0, d_pad - D)))
            vp = jnp.pad(v, ((0, 0), (0, n_pad - N), (0, d_pad - D)))
            seg_q = jnp.ones((B, n_pad), jnp.int32)
            seg_kv = jnp.where(
                jnp.pad(kv_valid, ((0, 0), (0, n_pad - N))), 1, 2
            ).astype(jnp.int32)
            bs = BlockSizes(
                block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
                block_q_major_dkv=blk, block_k_major_dkv=blk,
                block_k_dkv=blk, block_q_dkv=blk,
                block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
            )
            o = flash_attention(
                qp[:, None], kp[:, None], vp[:, None],
                segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
                sm_scale=1.0 / float(np.sqrt(D)),
                block_sizes=bs,
            )
            return o[:, 0, :N, :D]

        try:
            t_fl = fetch_time(jax.jit(flash_path), q, k, v, kv_valid)
            results[f"{name}_flash_ms"] = round(t_fl * 1e3, 2)
            print(json.dumps({name: "flash ok", "ms": results[f"{name}_flash_ms"]}))
            # numeric check vs xla
            a = np.asarray(jax.jit(xla_attn)(q, k, v, kv_valid), np.float32)
            b = np.asarray(jax.jit(flash_path)(q, k, v, kv_valid), np.float32)
            err = float(np.max(np.abs(a - b)))
            results[f"{name}_maxerr"] = err
            print(json.dumps({name: "numerics", "maxerr": err}))
        except Exception as e:  # noqa: BLE001
            results[f"{name}_flash_error"] = repr(e)[:500]
            print(json.dumps({name: "flash FAILED", "err": repr(e)[:500]}))

    print(json.dumps({"results": results}))


if __name__ == "__main__":
    sys.exit(main())
