"""ProPainter per-stage wall-clock profile at the bench geometry.

Times each pipeline stage (RAFT flows, flow completion, image propagation,
window sweep) separately with warm programs, syncing through a tiny scalar
fetch so the ~60 MB/s tunnel D2H doesn't pollute the numbers
(block_until_ready lies on axon — CLAUDE.md).

Run alone on a quiet machine:  python scripts/profile_pp.py [T]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 240, 1280  # the 720p band: split_h = 1280*3/16

import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.propainter import PropainterInpainter, dilate_mask


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    np.asarray(x.reshape(-1)[0])


def timeit(label, fn, n=2):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best:7.2f}s  ({best/T*1000:6.1f} ms/frame)", flush=True)
    return out


def main():
    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")
    pp = PropainterInpainter(config=cfg)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = [np.roll(base, 5 * i, axis=1) for i in range(T)]
    mask = np.zeros((H, W), np.uint8)
    mask[40:140, 100:1180] = 255

    t0 = time.perf_counter()
    out = pp.inpaint(frames, mask)
    print(f"cold inpaint: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = pp.inpaint(frames, mask)
    warm = time.perf_counter() - t0
    print(f"warm inpaint: {warm:.2f}s -> {T/warm:.2f} fps", flush=True)

    # stage-by-stage (device-resident chain, tiny sync fetches)
    dil = dilate_mask(mask, 4)
    rgb = np.stack([f[..., ::-1] for f in frames])
    rgb_dev = jnp.asarray(rgb)
    frames_n = rgb_dev.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    fm = jnp.broadcast_to(jnp.asarray(dil, jnp.float32)[None, :, :, None],
                          (T, H, W, 1))
    md = fm

    flows = timeit("1 raft flows", lambda: pp._compute_flows(frames_n))
    comp = timeit("2 flow completion",
                  lambda: pp._complete_flows(flows[0], flows[1], fm))
    del flows  # mirror the pipeline's stage-buffer frees (HBM headroom)
    upd = timeit("3 image propagation",
                 lambda: pp._propagate_images(frames_n, md, comp[0], comp[1]))
    frames_n = None

    def windows():
        ref_num = -1
        wins = []
        for f in range(0, T, pp.neighbor_stride):
            ns = list(range(max(0, f - pp.neighbor_stride),
                            min(T, f + pp.neighbor_stride + 1)))
            from vsr_tpu.inpaint.propainter import get_ref_index

            wins.append((ns, get_ref_index(f, ns, T, pp.ref_stride, ref_num)))
        n_max = max(len(ns) for ns, _ in wins)
        r_max = max(len(rs) for _, rs in wins)
        return pp._run_windows_static(rgb_dev, md, upd[0], upd[1],
                                      comp[0], comp[1], wins, n_max, r_max, T)

    t0 = time.perf_counter()
    res = windows()
    np.asarray(res[0])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = windows()
    np.asarray(res[0])
    t2 = time.perf_counter() - t0
    best = min(t1, t2)
    print(f"{'4 window sweep (+D2H)':28s} {best:7.2f}s  ({best/T*1000:6.1f} ms/frame)",
          flush=True)


if __name__ == "__main__":
    main()
