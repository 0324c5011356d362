"""Op-level breakdown of ProPainter's stage-4 window sweep (and stage 2).

Times encode-once vs one window-group compose call, then jax.profiler-traces
a compose call and prints the top device ops by self time (parsed from the
trace's trace-viewer JSON, 'X' complete events on device lanes).

Run alone on a quiet machine:  python scripts/profile_pp_sweep.py [T]
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

T = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 240, 1280

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.propainter import (PropainterInpainter, dilate_mask,
                                        get_ref_index)


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].reshape(-1)[0])


def timeit(label, fn, n=2):
    best = float("inf")
    out = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:32s} {best:7.3f}s", flush=True)
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

    dil = dilate_mask(mask, 4)
    rgb = np.stack([f[..., ::-1] for f in frames])
    rgb_dev = jnp.asarray(rgb)
    frames_n = rgb_dev.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    fm = jnp.broadcast_to(jnp.asarray(dil, jnp.float32)[None, :, :, None],
                          (T, H, W, 1))
    md = fm

    flows = pp._compute_flows(frames_n)
    comp = pp._complete_flows(flows[0], flows[1], fm)
    del flows
    upd_frames, upd_masks = pp._propagate_images(frames_n, md, comp[0], comp[1])

    # ---- stage-4 pieces ----
    enc_all = timeit("encode_all (T frames)", lambda: pp._encode_fn(
        pp.gen_params, upd_frames[None], md[None], upd_masks[None]))

    wins = []
    for f in range(0, T, pp.neighbor_stride):
        ns = list(range(max(0, f - pp.neighbor_stride),
                        min(T, f + pp.neighbor_stride + 1)))
        wins.append((ns, get_ref_index(f, ns, T, pp.ref_stride, -1)))
    n_max = max(len(ns) for ns, _ in wins)
    r_max = max(len(rs) for _, rs in wins)
    print(f"windows={len(wins)} n_max={n_max} r_max={r_max} "
          f"WB={getattr(pp.config, 'propainter_window_batch', 2)}")

    # build one group's arrays exactly like _run_windows_static
    def window_arrays(neighbor_ids, ref_ids):
        n_pad = n_max - len(neighbor_ids)
        r_pad = r_max - len(ref_ids)
        sel = np.asarray(neighbor_ids + [neighbor_ids[-1]] * n_pad
                         + ref_ids + [0] * r_pad, np.int32)
        valid = np.zeros((len(sel),), bool)
        valid[: len(neighbor_ids)] = True
        valid[n_max : n_max + len(ref_ids)] = True
        pair_ids = np.asarray(
            neighbor_ids[:-1] + [neighbor_ids[-1] - 1] * n_pad,
            np.int32)[: n_max - 1]
        safe_ids = np.asarray(neighbor_ids + [T] * n_pad, np.int32)
        return sel, valid, pair_ids, safe_ids

    WB = max(1, int(getattr(pp.config, "propainter_window_batch", 2)))
    group = [window_arrays(*w) for w in wins[:WB]]
    sel, valid, pair_ids, safe_ids = (
        np.stack([gr[i] for gr in group]) for i in range(4))
    sel, valid = jnp.asarray(sel), jnp.asarray(valid)
    pair_ids, safe_ids = jnp.asarray(pair_ids), jnp.asarray(safe_ids)

    def one_group():
        comp_buf = jnp.zeros((T + 1, H, W, 3), jnp.uint8)
        written = jnp.zeros((T + 1,), bool)
        return pp._window_compose_fn(
            pp.gen_params, enc_all, comp[0], comp[1], md, upd_masks,
            rgb_dev, comp_buf, written, sel, pair_ids, valid, safe_ids)

    timeit("one window-group compose", one_group, n=3)

    n_groups = (len(wins) + WB - 1) // WB
    print(f"(x {n_groups} groups per clip)")

    # ---- trace one compose call ----
    trace_dir = "/tmp/pp_sweep_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = one_group()
        sync(out)

    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print("no trace file found")
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
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
    total = sum(by_name.values())
    print(f"\ndevice ops total {total:.3f}s — top 30:")
    for name, s in sorted(by_name.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {s:7.3f}s  {100*s/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
