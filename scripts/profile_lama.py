"""Profile the LaMa video-band path: where do 2.6 s / 48 frames go?

VERDICT r3 item 4: LaMa sits at 18.5 fps (720p band, warm) with no profile
showing the split between H2D, device compute, D2H, and per-dispatch RPC
overhead on the tunnelled axon device. This script measures each in
isolation at the bench_modes geometry (1280x720, band -> ~128-240 rows),
then the production pipelined path, for a range of mini-batch sizes.

Run alone on a quiet machine (one TPU process at a time):
    python scripts/profile_lama.py [--batches 4 8 16] [--frames 48]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 1280, 720
BAND = (100, 1180, 600, 700)


def sync(x) -> None:
    # block_until_ready lies on axon; a scalar fetch is the reliable sync
    import jax.numpy as jnp

    np.asarray(jnp.sum(x[..., :1, :1, :1].astype(jnp.int32)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", nargs="*", type=int, default=[4, 8, 16])
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from vsr_tpu.config import Config
    from vsr_tpu.inpaint import lama as lama_mod
    from vsr_tpu.inpaint.lama import LamaInpainter
    from vsr_tpu.masks.mask import create_mask
    from vsr_tpu.masks.solver import get_inpaint_area_by_mask

    import jax.numpy as jnp

    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = [np.roll(base, 5 * i, axis=1) for i in range(args.frames)]
    mask = create_mask((H, W), [BAND])
    m3 = mask[:, :, None] if mask.ndim == 2 else mask
    split_h = int(W * 3 / 16)
    bands = get_inpaint_area_by_mask(W, H, split_h, m3)
    ymin, ymax = bands[0][0], bands[0][1]
    band_h = ymax - ymin
    print(f"band rows {ymin}:{ymax} (h={band_h}), crop {band_h}x{W}x3 uint8 "
          f"= {band_h * W * 3 / 1e6:.2f} MB/frame", flush=True)

    inp = LamaInpainter(config=cfg)

    crop = frames[0][ymin:ymax]
    mcrop = m3[ymin:ymax]

    for B in args.batches:
        img = np.stack([lama_mod.pad_to_modulo(crop, lama_mod.pad_bucket())] * B)
        msk = np.stack(
            [lama_mod.pad_to_modulo(mcrop, lama_mod.pad_bucket())] * B)
        print(f"\n== batch {B}: padded {img.shape} ==", flush=True)

        # warm compile
        d_img, d_msk = jnp.asarray(img), jnp.asarray(msk)
        out = inp._forward(inp.params, d_img, d_msk)
        sync(out)

        # 1. H2D
        t0 = time.perf_counter()
        for _ in range(args.reps):
            d_img = jnp.asarray(img)
            d_msk = jnp.asarray(msk)
            sync(d_img)
        h2d = (time.perf_counter() - t0) / args.reps
        print(f"H2D: {h2d * 1e3:8.1f} ms/batch  {h2d / B * 1e3:6.1f} ms/frame",
              flush=True)

        # 2. device forward (inputs resident, scalar-sync)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = inp._forward(inp.params, d_img, d_msk)
            sync(out)
        fwd = (time.perf_counter() - t0) / args.reps
        print(f"FWD: {fwd * 1e3:8.1f} ms/batch  {fwd / B * 1e3:6.1f} ms/frame",
              flush=True)

        # 3. D2H of the uint8 output (already computed + synced)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            np.asarray(out)
        d2h = (time.perf_counter() - t0) / args.reps
        print(f"D2H: {d2h * 1e3:8.1f} ms/batch  {d2h / B * 1e3:6.1f} ms/frame",
              flush=True)

        # 4. dispatch overhead probe: same forward, no sync between reps,
        # single sync at the end — measures device-side pipelined rate
        t0 = time.perf_counter()
        outs = [inp._forward(inp.params, d_img, d_msk)
                for _ in range(args.reps)]
        for o in outs:
            sync(o)
        piped = (time.perf_counter() - t0) / args.reps
        print(f"FWD pipelined: {piped * 1e3:8.1f} ms/batch  "
              f"{piped / B * 1e3:6.1f} ms/frame", flush=True)

        # 5. production path at this mini-batch
        lama_mod.MINI_BATCH = B
        t0 = time.perf_counter()
        outf = inp(frames, mask)
        dt = time.perf_counter() - t0
        assert len(outf) == args.frames
        t0 = time.perf_counter()
        outf = inp(frames, mask)
        dt = time.perf_counter() - t0
        print(f"pipeline (__call__ {args.frames}f): {dt:.2f} s  "
              f"{args.frames / dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
