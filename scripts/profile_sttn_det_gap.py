"""Settle the sttn-det vs sttn-auto throughput gap (VERDICT r3 item 8).

BENCH_MODES_r03: sttn-det 54.1 fps vs sttn-auto 67.2 fps on the same 720p
band. The two modes run DIFFERENT model geometries by design (reference
parity): sttn-auto crops the band and resizes to 640x120; sttn-det resizes
the whole frame to 432x240 (sttn_det_inpaint.py W_ori/H_ori scaling), which
is 1.35x the pixels. This script times the two engines' chunk programs at
their production geometries and normalizes per pixel, separating "model
input is bigger" from "masked attention/extra mask plumbing costs".

An equal-geometry comparison is mathematically impossible: each variant's
patch sizes pin its legal input sizes (auto needs W%640==0 H%120==0, det
needs W%432==0 H%240==0 — the stride-4 feature map must divide every patch
size) and the two sets don't intersect below 4K-scale. Per-pixel time is
the honest common denominator.

Measured on the v5e (round 4, quiet host, clip=50, chunk program only):
  auto @ 640x120: 25.3 ms/frame / 76800 px  = 0.329 us/px
  det  @ 432x240: 35.9 ms/frame / 103680 px = 0.346 us/px  (+5.2%)
=> the BENCH_MODES e2e gap (54 vs 67 fps) is the 1.35x pixel count the
reference chose for the det model input, plus ~5% masked-attention/mask
plumbing. Nothing material is recoverable without changing the reference's
model geometry.

Run alone on a quiet machine:  python scripts/profile_sttn_det_gap.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.engine import STTNWindowEngine
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.models.sttn import STTNGenerator


def sync(x):
    np.asarray(x.reshape(-1)[0])


def time_engine(engine, frames, masks=None, n=3):
    handle = engine.dispatch(frames, masks)  # compile/warm
    sync(handle[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        h = engine.dispatch(frames, masks)
        sync(h[0])
        best = min(best, time.perf_counter() - t0)
    return best


def build(variant, hw, clip, cfg, masked):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model = STTNGenerator(variant=variant, dtype=dtype,
                          use_pallas=cfg.use_pallas)
    h, w = hw
    params = load_or_init_params(model, (jnp.zeros((1, 1, h, w, 3)),), None)
    return STTNWindowEngine(
        model, params, clip_len=clip, input_hw=hw,
        stride=cfg.sttn_neighbor_stride, ref_length=cfg.sttn_reference_length,
        window_batch=cfg.window_batch, masked=masked)


def main():
    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")
    clip = 50
    rng = np.random.default_rng(0)

    cases = [
        # (label, variant, masked, (h, w)) — production geometries only;
        # the variants' legal input sets don't intersect (see module doc)
        ("auto @ production 640x120", "auto", False, (120, 640)),
        ("det  @ production 432x240", "det", True, (240, 432)),
    ]
    results = []
    for label, variant, masked, (h, w) in cases:
        frames = rng.integers(0, 256, (clip, h, w, 3), np.uint8)
        masks = None
        if masked:
            masks = np.zeros((clip, h, w), np.float32)
            masks[:, h // 3 : h // 2, w // 8 : -w // 8] = 1.0
        engine = build(variant, (h, w), clip, cfg, masked)
        dt = time_engine(engine, frames, masks)
        px = h * w
        us_px = dt / clip / px * 1e6
        results.append(us_px)
        print(f"{label:32s} {dt:6.3f}s/chunk  {clip/dt:6.1f} fps  "
              f"({dt/clip*1e3:5.1f} ms/frame, {px} px, {us_px:.3f} us/px)",
              flush=True)
    if len(results) == 2:
        print(f"det per-pixel overhead vs auto: "
              f"{(results[1]/results[0]-1)*100:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
