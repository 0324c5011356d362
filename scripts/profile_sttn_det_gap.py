"""Settle the sttn-det vs sttn-auto throughput gap (VERDICT r3 item 8).

BENCH_MODES_r03: sttn-det 54.1 fps vs sttn-auto 67.2 fps on the same 720p
band. The two modes run DIFFERENT model geometries by design (reference
parity): sttn-auto crops the band and resizes to 640x120; sttn-det resizes
the whole frame to 432x240 (sttn_det_inpaint.py W_ori/H_ori scaling), which
is 2.66x the pixels. This script times the two engines' chunk programs at
BOTH their production geometries AND at equal geometry, separating "model
input is bigger" from "masked attention/extra mask plumbing costs".

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
        # (label, variant, masked, (h, w))
        ("auto @ production 640x120", "auto", False, (120, 640)),
        ("det  @ production 432x240", "det", True, (240, 432)),
        ("det  @ auto geometry 640x120", "det", True, (120, 640)),
        ("auto @ det geometry 432x240", "auto", False, (240, 432)),
    ]
    for label, variant, masked, (h, w) in cases:
        frames = rng.integers(0, 256, (clip, h, w, 3), np.uint8)
        masks = None
        if masked:
            masks = np.zeros((clip, h, w), np.float32)
            masks[:, h // 3 : h // 2, w // 8 : -w // 8] = 1.0
        engine = build(variant, (h, w), clip, cfg, masked)
        dt = time_engine(engine, frames, masks)
        px = h * w
        print(f"{label:32s} {dt:6.3f}s/chunk  {clip/dt:6.1f} fps  "
              f"({dt/clip*1e3:5.1f} ms/frame, {px} px)", flush=True)


if __name__ == "__main__":
    main()
