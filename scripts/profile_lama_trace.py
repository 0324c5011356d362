"""Device-op breakdown of the LaMa forward (jax.profiler trace).

Where do 28 ms/frame go at B=8 256x1280? Aggregates 'X' trace events from
the axon profiler dump (CLAUDE.md recipe).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.config import Config
    from vsr_tpu.inpaint.lama import LamaInpainter

    cfg = Config()
    cfg.compute_dtype = "bfloat16"
    inp = LamaInpainter(config=cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    B, ph, W = 8, 256, 1280
    img = jax.device_put(rng.integers(0, 256, (B, ph, W, 3), np.uint8), dev)
    msk = jax.device_put(
        (rng.integers(0, 2, (B, ph, W, 1), np.uint8) * 255), dev)

    out = inp._forward(inp.params, img, msk)
    np.asarray(out)  # warm

    logdir = "/tmp/lama_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = inp._forward(inp.params, img, msk)
        np.asarray(out)

    traces = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    print("trace files:", traces, flush=True)
    agg: dict = defaultdict(float)
    cnt: dict = defaultdict(int)
    total = 0.0
    for t in traces:
        with gzip.open(t, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e6  # us -> s
            agg[name] += dur
            cnt[name] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"total X time {total:.3f}s over 3 fwd (B=8)")
    for name, dur in rows[:40]:
        print(f"{dur*1e3:9.2f} ms  x{cnt[name]:4d}  {name[:130]}")


if __name__ == "__main__":
    main()
