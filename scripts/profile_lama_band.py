"""Profile the CURRENT LaMa band path (i420 upload + masked-row D2H).

Round-4 follow-up to profile_lama.py (which probes the legacy full-band
forward): breaks the default production path into host encode, H2D,
band-forward device time, row D2H, and host paste, at the bench_modes
geometry, then times the pipelined production `_inpaint_band`.

Run alone on a quiet machine:  python scripts/profile_lama_band.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

W, H = 1280, 720
BAND = (100, 1180, 600, 700)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.config import Config
    from vsr_tpu.inpaint import lama as lama_mod
    from vsr_tpu.inpaint.lama import LamaInpainter
    from vsr_tpu.masks.mask import create_mask
    from vsr_tpu.masks.solver import get_inpaint_area_by_mask

    reps = int(os.environ.get("REPS", "5"))
    n_frames = int(os.environ.get("FRAMES", "48"))
    B = lama_mod.band_batch()

    cfg = Config()
    cfg.compute_dtype = os.environ.get("VSR_BENCH_DTYPE", "bfloat16")

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    frames = [np.roll(base, 5 * i, axis=1) for i in range(n_frames)]
    mask = create_mask((H, W), [BAND])
    m3 = mask[:, :, None]
    split_h = int(W * 3 / 16)
    bands = get_inpaint_area_by_mask(W, H, split_h, m3)
    ymin, ymax = bands[0][0], bands[0][1]
    band_h = ymax - ymin
    bucket = lama_mod.band_pad_bucket()
    d2h = lama_mod.d2h_codec()

    inp = LamaInpainter(config=cfg)
    dev = jax.devices()[0]

    crops = [f[ymin:ymax] for f in frames[:B]]
    print(f"band {ymin}:{ymax} h={band_h}, batch {B}, bucket {bucket}",
          flush=True)

    # host encode (pad + BGR->I420)
    t0 = time.perf_counter()
    for _ in range(reps):
        arr = np.stack([
            cv2.cvtColor(lama_mod.pad_to_modulo(c, bucket),
                         cv2.COLOR_BGR2YUV_I420) for c in crops])
    enc = (time.perf_counter() - t0) / reps
    print(f"host encode: {enc*1e3:7.1f} ms/batch  {enc/B*1e3:5.1f} ms/frame",
          flush=True)

    d_mask = jax.device_put(
        lama_mod.pad_to_modulo(m3[ymin:ymax], bucket)[None], dev)

    mrows = np.nonzero(mask[ymin:ymax].any(axis=1))[0]
    out_h = min(band_h, (int(mrows[-1] - mrows[0]) // 64 + 1) * 64)
    r0 = max(0, min(int(mrows[0]), band_h - out_h))
    print(f"out rows: r0={r0} out_h={out_h} (mask spans "
          f"{mrows[0]}..{mrows[-1]})", flush=True)

    def sync(x):
        np.asarray(jnp.sum(x[..., :1, :1, :1].astype(jnp.int32)))

    # warm compile
    d_img = jax.device_put(arr, dev)
    out = inp._band_forward(inp.params, d_img, d_mask, np.int32(r0), out_h,
                            W, "i420", d2h)
    sync(out)

    # H2D
    t0 = time.perf_counter()
    for _ in range(reps):
        d_img = jax.device_put(arr, dev)
        sync(d_img)
    h2d = (time.perf_counter() - t0) / reps
    print(f"H2D i420:    {h2d*1e3:7.1f} ms/batch  {h2d/B*1e3:5.1f} ms/frame  "
          f"({arr.nbytes/1e6:.2f} MB)", flush=True)

    # device forward
    t0 = time.perf_counter()
    for _ in range(reps):
        out = inp._band_forward(inp.params, d_img, d_mask, np.int32(r0),
                                out_h, W, "i420", d2h)
        sync(out)
    fwd = (time.perf_counter() - t0) / reps
    print(f"band FWD:    {fwd*1e3:7.1f} ms/batch  {fwd/B*1e3:5.1f} ms/frame",
          flush=True)

    # D2H rows (note: only the first np.asarray of a given jax.Array pays
    # the transfer — it caches — so re-run the forward per rep)
    t0 = time.perf_counter()
    for _ in range(reps):
        host = np.asarray(out)
    t_d2h = (time.perf_counter() - t0) / reps
    print(f"D2H rows:    {t_d2h*1e3:7.1f} ms/batch  "
          f"{t_d2h/B*1e3:5.1f} ms/frame  ({host.nbytes/1e6:.2f} MB)",
          flush=True)

    # host paste (incl. i420 decode when that's the D2H codec)
    outf = [f.copy() for f in frames[:B]]
    hole3 = mask[ymin + r0 : ymin + r0 + out_h][..., None] > 0
    t0 = time.perf_counter()
    for _ in range(reps):
        for i in range(B):
            rows = host[i]
            if d2h == "i420":
                rows = cv2.cvtColor(rows, cv2.COLOR_YUV2BGR_I420)
            np.copyto(outf[i][ymin + r0 : ymin + r0 + out_h], rows,
                      where=hole3)
    paste = (time.perf_counter() - t0) / reps
    print(f"host paste:  {paste*1e3:7.1f} ms/batch  "
          f"{paste/B*1e3:5.1f} ms/frame", flush=True)

    tot = enc + h2d + fwd + t_d2h + paste
    print(f"sum:         {tot*1e3:7.1f} ms/batch  {tot/B*1e3:5.1f} ms/frame  "
          f"(= {B/tot:.1f} fps unpipelined)", flush=True)

    # production pipelined path
    for _ in range(2):
        t0 = time.perf_counter()
        res = inp(frames, mask)
        dt = time.perf_counter() - t0
        assert len(res) == n_frames
        print(f"production __call__ {n_frames}f: {dt:.2f} s  "
              f"{n_frames/dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
