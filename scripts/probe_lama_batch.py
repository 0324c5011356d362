"""Measure LaMa forward at batch 8/16 + device_put uploads + overlap test.

Follows scripts/profile_lama.py's finding that H2D (jnp.asarray) dominates:
checks whether (a) bigger batches improve MXU utilization, (b) device_put of
one big stacked batch reaches the tunnel's ~45 MB/s, (c) an uploader thread
overlaps H2D with device compute.
"""

from __future__ import annotations

import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 1280, 720
BAND_H = 240  # solver band at the bench geometry; pads to 256


def sync(x) -> None:
    import jax.numpy as jnp

    np.asarray(jnp.sum(x[..., :1, :1, :1].astype(jnp.int32)))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vsr_tpu.config import Config
    from vsr_tpu.inpaint import lama as lama_mod
    from vsr_tpu.inpaint.lama import LamaInpainter

    cfg = Config()
    cfg.compute_dtype = "bfloat16"
    inp = LamaInpainter(config=cfg)
    dev = jax.devices()[0]

    rng = np.random.default_rng(0)
    ph = 256  # padded band height

    # resident mask variant: mask [1, ph, W, 1], broadcast inside
    from vsr_tpu.utils.exec_cache import cached_jit

    def fwd_resident(params, img_u8, mask_u8):
        img = img_u8.astype(jnp.float32) / 255.0
        msk = jnp.broadcast_to((mask_u8 > 0).astype(jnp.float32),
                               img.shape[:3] + (1,))
        out = inp.model.apply(params, img, msk)
        return jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)

    fwd_res = cached_jit(fwd_resident)
    mask_host = (rng.integers(0, 2, (1, ph, W, 1), dtype=np.uint8) * 255)
    d_mask = jax.device_put(mask_host, dev)

    for B in [8, 16]:
        img = rng.integers(0, 256, (B, ph, W, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        d_img = jax.device_put(img, dev)
        sync(d_img)
        up_cold = time.perf_counter() - t0

        t0 = time.perf_counter()
        out = fwd_res(inp.params, d_img, d_mask)
        sync(out)
        compile_s = time.perf_counter() - t0

        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            d_img = jax.device_put(img, dev)
            sync(d_img)
        up = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            out = fwd_res(inp.params, d_img, d_mask)
            sync(out)
        fwd = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(out)
        d2h = (time.perf_counter() - t0) / reps

        mb = img.nbytes / 1e6
        print(f"B={B}: compile {compile_s:.0f}s; H2D {up*1e3:.0f} ms "
              f"({mb/up:.0f} MB/s, {up/B*1e3:.1f} ms/f); "
              f"FWD {fwd*1e3:.0f} ms ({fwd/B*1e3:.1f} ms/f); "
              f"D2H {d2h*1e3:.0f} ms ({d2h/B*1e3:.1f} ms/f)", flush=True)

        # overlap test: uploader thread + compute on previous batch
        n_batches = 6
        imgs = [rng.integers(0, 256, (B, ph, W, 3), dtype=np.uint8)
                for _ in range(n_batches)]
        q: queue.Queue = queue.Queue(maxsize=2)

        def uploader():
            for a in imgs:
                d = jax.device_put(a, dev)
                q.put(d)
            q.put(None)

        t0 = time.perf_counter()
        th = threading.Thread(target=uploader)
        th.start()
        outs = []
        while True:
            d = q.get()
            if d is None:
                break
            outs.append(fwd_res(inp.params, d, d_mask))
            if len(outs) > 2:
                np.asarray(outs.pop(0))
        for o in outs:
            np.asarray(o)
        th.join()
        dt = time.perf_counter() - t0
        tot = n_batches * B
        print(f"B={B}: overlapped pipeline {n_batches} batches: {dt:.2f}s = "
              f"{tot/dt:.1f} fps ({dt/tot*1e3:.1f} ms/f)", flush=True)


if __name__ == "__main__":
    main()
