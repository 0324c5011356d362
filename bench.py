"""Benchmark: sttn-auto 1080p end-to-end inpaint throughput per chip.

Runs the full streaming inpaint path (band crop + cv2 resize + H2D + encoder
+ batched window transformer + decode + D2H + overlap composite + paste-back)
on synthetic 1080p frames with the production model size, on the default JAX
device (the real TPU under the driver).

Prints ONE JSON line:
  {"metric": "sttn_auto_1080p_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 60.0}

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target from BASELINE.json is >=2x realtime 1080p sttn-auto per chip — i.e.
60 fps for 30fps video — so vs_baseline = fps / 60 (1.0 == target met).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    from vsr_tpu.config import Config
    from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter
    from vsr_tpu.masks.mask import create_mask

    W, H = 1920, 1080
    # 5 chunks: enough for the 2-deep chunk pipeline to reach steady state
    # (the production regime — real videos run thousands of frames); 100
    # frames under-measured it by ~30% on pure ramp-up.
    n_frames = int(os.environ.get("VSR_BENCH_FRAMES", "250"))
    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = [np.roll(base, 7 * i, axis=1) for i in range(n_frames)]
    # bottom-band subtitle mask (the standard use case)
    mask = create_mask((H, W), [(300, 1620, 960, 1040)])

    inpainter = STTNAutoInpainter(config=cfg)

    # warmup: compile the chunk program
    clip = cfg.get_sttn_max_load_num()
    _ = inpainter(frames[:clip], mask)

    # steady state: best of N trials (the remote-device session warms up
    # over the first iterations)
    trials = int(os.environ.get("VSR_BENCH_TRIALS", "3"))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = inpainter(frames, mask)
        best = min(best, time.perf_counter() - t0)

    fps = n_frames / best
    result = {
        "metric": "sttn_auto_1080p_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
