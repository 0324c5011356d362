"""Probe tunnel H2D/D2H bandwidth vs transfer size on the axon device.

LaMa profile showed H2D at ~13 MB/s effective (391 ms for 5.2 MB) while D2H
runs at ~74 MB/s — this measures both directions across sizes to split fixed
per-RPC latency from stream bandwidth, and compares jnp.asarray vs
jax.device_put vs device_put with explicit sharding.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync_scalar(x) -> None:
    np.asarray(jnp.sum(x[:1, :1].astype(jnp.int32)))


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    sizes_mb = [0.25, 1, 4, 16, 64]
    for mb in sizes_mb:
        n = int(mb * 1e6)
        host = np.random.default_rng(0).integers(0, 256, (n // 1024, 1024),
                                                 dtype=np.uint8)
        # warm
        d = jax.device_put(host, dev)
        sync_scalar(d)

        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            d = jax.device_put(host, dev)
            sync_scalar(d)
        up = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            d2 = jnp.asarray(host)
            sync_scalar(d2)
        up2 = (time.perf_counter() - t0) / reps

        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(d)
        down = (time.perf_counter() - t0) / reps

        print(f"{mb:6.2f} MB  device_put {up*1e3:8.1f} ms ({mb/up:6.1f} MB/s)"
              f"  asarray {up2*1e3:8.1f} ms ({mb/up2:6.1f} MB/s)"
              f"  D2H {down*1e3:8.1f} ms ({mb/down:6.1f} MB/s)", flush=True)

    # float32 vs uint8 (does dtype matter for the tunnel codec?)
    n = 4_000_000
    hostf = np.random.default_rng(0).standard_normal((n // 4 // 1024, 1024),
                                                     dtype=np.float32)
    d = jax.device_put(hostf, dev)
    sync_scalar(d)
    t0 = time.perf_counter()
    for _ in range(3):
        d = jax.device_put(hostf, dev)
        sync_scalar(d)
    up = (time.perf_counter() - t0) / 3
    print(f"4 MB f32: device_put {up*1e3:8.1f} ms ({4/up:6.1f} MB/s)",
          flush=True)

    # concurrent H2D from two threads — does the tunnel parallelize?
    import threading

    host = np.random.default_rng(0).integers(0, 256, (16_000_000 // 1024, 1024),
                                             dtype=np.uint8)
    jax.device_put(host, dev).block_until_ready()

    def put():
        d = jax.device_put(host, dev)
        sync_scalar(d)

    t0 = time.perf_counter()
    ths = [threading.Thread(target=put) for _ in range(2)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    dt = time.perf_counter() - t0
    print(f"2x16 MB concurrent H2D: {dt*1e3:.1f} ms ({32/dt:6.1f} MB/s agg)",
          flush=True)


if __name__ == "__main__":
    main()
