"""Op-level breakdown of the sttn-auto 1080p chunk program.

Builds the production STTNAutoInpainter, runs process_video once to warm the
chunk executable (exec cache), times a steady chunk, then jax.profiler-traces
one dispatch+fetch and prints the top device ops by self time (same parsing
recipe as scripts/profile_pp_sweep.py).

Run alone on a quiet machine:  python scripts/profile_sttn_chunk.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from vsr_tpu.config import Config
    from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter
    from vsr_tpu.masks.mask import create_mask

    W, H = 1920, 1080
    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")
    inp = STTNAutoInpainter(config=cfg)
    clip = inp.clip_gap

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = [np.roll(base, 7 * i, axis=1) for i in range(clip)]
    mask = create_mask((H, W), [(300, 1620, 960, 1040)])

    class _R:
        def __init__(self, fl):
            self._f, self._i = fl, 0

        def read(self):
            if self._i >= len(self._f):
                return False, None
            self._i += 1
            return True, self._f[self._i - 1]

    class _W:
        def write(self, f):
            pass

    t0 = time.perf_counter()
    inp.process_video(_R(frames), _W(), mask, clip, (W, H))
    print(f"warm pass: {time.perf_counter() - t0:.1f}s", flush=True)

    # time three steady passes (chunk wall incl. host crop/resize/paste)
    for i in range(3):
        t0 = time.perf_counter()
        inp.process_video(_R(frames), _W(), mask, clip, (W, H))
        dt = time.perf_counter() - t0
        print(f"pass {i}: {dt:.3f}s  {clip / dt:.1f} fps", flush=True)

    trace_dir = "/tmp/sttn_chunk_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        inp.process_video(_R(frames), _W(), mask, clip, (W, H))

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    lane_total = defaultdict(float)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pname = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        by_name[ev.get("name", "?")] += ev.get("dur", 0) / 1e6
        lane_total[pname] += ev.get("dur", 0) / 1e6
    total = sum(by_name.values())
    print(f"\nlanes: {dict(lane_total)}")
    print(f"device ops total {total:.3f}s — top 40:")
    for name, s in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {s:7.3f}s  {100 * s / max(total, 1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
