"""Per-mode warm steady-state throughput harness -> BENCH_MODES_r<k>.json.

VERDICT r2 item 3: the driver's bench.py tracks only the headline 1080p
sttn-auto number; mode regressions (lama/sttn-det/propainter) were invisible
and the committed parity_results fps were compile-contaminated. This harness
measures each inpaint mode's WARM throughput at a fixed geometry — one
full-length warmup pass compiles every program, then the best of N timed
passes is reported. All mode wrappers return host numpy frames, so wall
clock around the call is a sync measurement (no block_until_ready lies —
CLAUDE.md).

Geometry: 1280x720 frames with a 100px-tall full-width-ish subtitle band
(the standard 720p use case; the band solver crops ~128 rows x 1280 for the
band modes — matching the round-2 STATUS prose numbers' setup).

Run on a QUIET machine (the 1-core host serializes everything):
    python scripts/bench_modes.py --out BENCH_MODES_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 1280, 720
BAND = (100, 1180, 600, 700)  # xmin, xmax, ymin, ymax

# frames per timed pass: long enough for pipelining to reach steady state,
# short enough that the slowest mode stays benchable
MODE_FRAMES = {
    "sttn-auto": 100,
    "sttn-det": 100,
    "lama": 48,
    "propainter": 48,
}


def make_frames(n: int) -> list:
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    return [np.roll(base, 5 * i, axis=1) for i in range(n)]


def build(mode: str, cfg):
    if mode == "sttn-auto":
        from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter

        return STTNAutoInpainter(config=cfg)
    if mode == "sttn-det":
        from vsr_tpu.inpaint.sttn_det import STTNDetInpainter

        return STTNDetInpainter(config=cfg)
    if mode == "lama":
        from vsr_tpu.inpaint.lama import LamaInpainter

        return LamaInpainter(config=cfg)
    if mode == "propainter":
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        return PropainterInpainter(config=cfg)
    raise ValueError(mode)


def bench_mode(mode: str, trials: int) -> dict:
    from vsr_tpu.config import Config
    from vsr_tpu.masks.mask import create_mask

    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")
    n = MODE_FRAMES[mode]
    frames = make_frames(n)
    mask = create_mask((H, W), [BAND])

    model = build(mode, cfg)
    t0 = time.perf_counter()
    out = model(frames, mask)
    warm_s = time.perf_counter() - t0
    assert len(out) == n and out[0].shape == frames[0].shape

    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = model(frames, mask)
        best = min(best, time.perf_counter() - t0)
    return {
        "fps": round(n / best, 2),
        "frames": n,
        "best_pass_s": round(best, 2),
        "first_pass_s": round(warm_s, 1),
        "trials": trials,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="*", default=list(MODE_FRAMES))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    results = {
        "geometry": f"{W}x{H} band {BAND}",
        "dtype": os.environ.get("VSR_BENCH_DTYPE", "bfloat16"),
        "device": str(jax.devices()[0]),
        "modes": {},
    }
    for mode in args.modes:
        r = bench_mode(mode, args.trials)
        results["modes"][mode] = r
        print(f"{mode}: {r['fps']} fps warm "
              f"(first pass {r['first_pass_s']}s)", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
