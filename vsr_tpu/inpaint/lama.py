"""LaMa inpainting mode wrapper.

Capability parity with LamaInpaint (backend/inpaint/lama_inpaint.py:11-116):
* inpaint(image, mask): single image at native resolution, pad-to-modulo-8,
  output cropped back;
* __call__(frames, mask): band-crop video path (split_h = W*3/16) running
  fixed-size mini-batches (4) through one jitted forward per shape bucket,
  full-band overwrite on paste-back.

Frames stay in their native (BGR) channel order end to end, as in the
reference (which feeds cv2 frames to the blob unconverted).
"""

from __future__ import annotations

import math
import os
import queue
import threading
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.masks.solver import get_inpaint_area_by_mask
from vsr_tpu.models.lama import LamaGenerator

MINI_BATCH = 4  # ref :38 (generic / picture path)


def band_batch() -> int:
    """Mini-batch for the video band path. The reference's 4 was a GPU-VRAM
    artifact (lama_inpaint.py:38); on the tunnelled TPU bigger batches
    amortize the ~40 ms per-transfer RPC latency into the link's ~46 MB/s
    (profiled round 4: 16-frame uploads run 2.1x the byte rate of 4-frame
    ones) and fill the MXU better."""
    return int(os.environ.get("VSR_LAMA_BAND_BATCH", "16"))


def h2d_codec() -> str:
    """Upload codec for band crops. 'i420' (default): frames cross the
    tunnel as YUV 4:2:0 — HALF the bytes of BGR on a link that serializes
    transfer and execute RPCs (H2D was 41 of 69 ms/frame), and lossless to
    ±1 uint8 for footage that was 4:2:0-encoded, i.e. virtually every video
    this tool processes: the decoder's BGR output lies on the I420 manifold
    (measured max|Δ|=1, mean 0.19 round-tripping the reference test clip's
    band). 'bgr' restores byte-exact uploads (the e2e differential pins
    reference parity under it). Either way, pixels OUTSIDE the mask are
    never model-touched — paste-back blends only mask pixels on host."""
    return os.environ.get("VSR_LAMA_H2D", "i420")


def d2h_codec() -> str:
    """Download format for the band-path composite rows.

    'i420' (default): rows cross the tunnel as YUV 4:2:0 — half the bytes
    of BGR on the ~25-70 MB/s link. Pixels OUTSIDE the mask are restored
    byte-exact on host regardless (paste blends only mask pixels), so the
    codec touches only synthesized hole content, where the ±2 uint8
    round-trip error is invisible. 'bgr' ships exact BGR rows (the e2e
    reference differential pins parity under it); 'full' is the legacy
    whole-band reference-overwrite mode (see _inpaint_band). The historic
    value 'masked' is accepted as an alias of 'bgr'."""
    v = os.environ.get("VSR_LAMA_BAND_D2H", "i420")
    return "bgr" if v == "masked" else v


def band_pad_bucket() -> int:
    """Shape bucket for the VIDEO band path (the picture path keeps
    pad_bucket()=64). Band heights are deterministic per resolution
    (split_h = W*3/16), so mod-8 padding — the reference's own rule — costs
    one program per video resolution, same as bucket-64, while dropping the
    dead padded rows bucket-64 added (240->256 at 720p: 6.7% of H2D bytes
    and FFC compute for rows the model never returns)."""
    return int(os.environ.get("VSR_LAMA_BAND_BUCKET", "8"))


def _bgr_to_i420_device(x: "jnp.ndarray") -> "jnp.ndarray":
    """[B, h, W, 3] uint8 BGR -> [B, h*3/2, W] uint8 I420 planes (BT.601
    limited range, top-left-of-2x2 chroma like cv2.COLOR_BGR2YUV_I420 —
    verified against it in tests/test_lama.py) — the inverse of
    _i420_to_bgr_device / cv2.COLOR_YUV2BGR_I420, for shipping composite
    rows at 1.5 bytes/px. Requires h % 4 == 0 and W % 2 == 0 (the caller
    falls back to 'bgr' otherwise)."""
    f = x.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = 16.0 + (65.738 * r + 129.057 * g + 25.064 * b) * (1.0 / 256.0)
    bs, gs, rs = b[:, ::2, ::2], g[:, ::2, ::2], r[:, ::2, ::2]
    u = 128.0 + (-37.945 * rs - 74.494 * gs + 112.439 * bs) * (1.0 / 256.0)
    v = 128.0 + (112.439 * rs - 94.154 * gs - 18.285 * bs) * (1.0 / 256.0)
    B, h, W = y.shape
    pack = jnp.concatenate(
        [y, u.reshape(B, h // 4, W), v.reshape(B, h // 4, W)], axis=1)
    return jnp.clip(jnp.round(pack), 0, 255).astype(jnp.uint8)


def _i420_to_bgr_device(x: "jnp.ndarray") -> "jnp.ndarray":
    """[B, H*3/2, W] uint8 I420 planes -> [B, H, W, 3] float32 BGR (0..255).

    Nearest chroma upsample + BT.601 limited-range — matches cv2's
    COLOR_YUV2BGR_I420 within ±1 (pinned by tests/test_lama.py)."""
    B, h15, W = x.shape
    H = h15 * 2 // 3
    y = x[:, :H].astype(jnp.float32)
    u = x[:, H : H + H // 4].reshape(B, H // 2, W // 2).astype(jnp.float32)
    v = x[:, H + H // 4 :].reshape(B, H // 2, W // 2).astype(jnp.float32)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    c = y - 16.0
    d = u - 128.0
    e = v - 128.0
    r = 1.164 * c + 1.596 * e
    g = 1.164 * c - 0.392 * d - 0.813 * e
    b = 1.164 * c + 2.017 * d
    return jnp.stack([b, g, r], axis=-1)


def pad_bucket() -> int:
    """Shape-bucket granularity for padded inputs.

    The reference pads to modulo 8 (lama_util.py:59), which makes every
    distinct image size its own XLA program — a ~280 s cold compile per new
    size on the axon service (parity_results_r2 config1). Padding to modulo
    64 instead collapses sizes into few buckets a `--warmup` run can
    precompile, at the cost of up to 63 extra mirrored border pixels seen by
    the (global-FFT) model. VSR_LAMA_BUCKET=8 restores the exact reference
    padding."""
    import os

    return int(os.environ.get("VSR_LAMA_BUCKET", "64"))


def pad_to_modulo(arr: np.ndarray, mod: int = 8) -> np.ndarray:
    """Bottom/right symmetric-reflection pad to the next multiple — matching
    the reference's np.pad(mode='symmetric') exactly
    (backend/inpaint/utils/lama_util.py:59); constant padding would degrade
    inpaint quality at the padded borders."""
    h, w = arr.shape[:2]
    ph = (mod - h % mod) % mod
    pw = (mod - w % mod) % mod
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, mode="symmetric")


class LamaInpainter:
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        config: Optional[Config] = None,
        n_blocks: int = 18,
        mesh=None,
    ):
        self.config = config or Config()
        # Multi-chip (SURVEY §2c): the band path's frame mini-batch is the
        # natural shard axis — with a mesh, band batches round up to a
        # multiple of the 'data' axis (tail frames pad, as on one chip) and
        # the jitted forward constrains the batch dim to P("data"), so each
        # chip runs B/n frames of the identical FFC program.
        self.mesh = mesh
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        # VSR_LAMA_FFT is resolved ONCE here: programs compile through
        # cached_jit whose key ignores the environment, so a later env flip
        # must not (and now cannot) silently leave stale executables in play.
        self.model = LamaGenerator(
            n_blocks=n_blocks, dtype=dtype,
            fft_impl=os.environ.get("VSR_LAMA_FFT", "matmul"))
        self.params = load_or_init_params(
            self.model,
            (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))),
            checkpoint_path,
        )
        self._build_forward()

    def _build_forward(self) -> None:
        """(Re)build the jitted uint8 forwards for the current self.model.
        Tests swap in tiny models and call this instead of duplicating the
        contract."""
        from vsr_tpu.utils.exec_cache import cached_jit

        def _shard_batch(x):
            """Mesh mode: shard the frame batch over the 'data' axis (the
            mask stays replicated — it broadcasts across the batch). Batches
            that don't divide the axis (e.g. the picture path's MINI_BATCH)
            stay unconstrained."""
            mesh = getattr(self, "mesh", None)
            if mesh is None or x.shape[0] % mesh.shape["data"]:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data")))

        def fwd(params, img_u8, mask_u8):
            # uint8 in, uint8 out: normalization and the final clip/cast run
            # on device so only uint8 crosses the (slow, tunnelled) link.
            # The mask may carry batch dim 1 (video band path: the constant
            # band mask is uploaded ONCE per band, not once per mini-batch —
            # it was 25% of H2D bytes) and broadcasts to the image batch.
            img = _shard_batch(img_u8).astype(jnp.float32) / 255.0
            msk = jnp.broadcast_to((mask_u8 > 0).astype(jnp.float32),
                                   img.shape[:3] + (1,))
            out = self.model.apply(params, img, msk)
            return jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)

        self._forward = cached_jit(fwd)

        def band_fwd(params, raw_u8, mask_u8, r0, out_h, out_w, codec, d2h):
            # Band-path forward: decode the upload codec, run the model —
            # with its upsampling tail computed only for the ``out_h`` rows
            # from ``r0`` that cover the mask (models/lama.py out_rows) —
            # composite on device, and ship only those rows, optionally
            # re-packed as I420 (half the D2H bytes). r0 is a dynamic scalar
            # so one program serves any mask position; out_h/out_w/codec/d2h
            # are static. Non-mask pixels are restored bit-exact on the host
            # (paste blends only mask pixels), so the fetched rows only need
            # to be right INSIDE the mask.
            raw_u8 = _shard_batch(raw_u8)
            if codec == "i420":
                bgr = _i420_to_bgr_device(raw_u8)
                img_u8 = jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)
            else:
                img_u8 = raw_u8
            img = img_u8.astype(jnp.float32) / 255.0
            mskb = mask_u8 > 0                       # [1, H, W, 1]
            msk = jnp.broadcast_to(mskb.astype(jnp.float32),
                                   img.shape[:3] + (1,))
            r0 = jnp.asarray(r0)
            if out_h % 2 == 0:
                pred = self.model.apply(params, img, msk,
                                        out_rows=(r0, out_h))
            else:  # odd out_h (non-standard band height): full-output path
                pred = self.model.apply(params, img, msk)
                pred = jax.lax.dynamic_slice_in_dim(pred, r0, out_h, axis=1)
            pred_u8 = jnp.clip(pred * 255.0, 0, 255).astype(jnp.uint8)
            img_rows = jax.lax.dynamic_slice_in_dim(img_u8, r0, out_h, axis=1)
            msk_rows = jax.lax.dynamic_slice_in_dim(mskb, r0, out_h, axis=1)
            comp = jnp.where(msk_rows, pred_u8, img_rows)[:, :, :out_w]
            if d2h == "i420":
                comp = _bgr_to_i420_device(comp)
            return comp

        self._band_forward = cached_jit(band_fwd,
                                        static_argnums=(4, 5, 6, 7))

    # ---- core batched forward over a fixed shape bucket ----
    def _dispatch_batch(self, images: List[np.ndarray], masks: List[np.ndarray]):
        """Async-dispatch one padded batch; returns (handle, orig_h, orig_w)."""
        orig_h, orig_w = images[0].shape[:2]
        bucket = pad_bucket()
        img = np.stack([pad_to_modulo(im, bucket) for im in images])
        msk = np.stack([
            pad_to_modulo(np.asarray(m).squeeze()[..., None], bucket)
            for m in masks
        ])
        out = self._forward(self.params, jnp.asarray(img), jnp.asarray(msk))
        return out, orig_h, orig_w

    def _fetch_batch(self, handle, n: int) -> List[np.ndarray]:
        out, orig_h, orig_w = handle
        arr = np.asarray(out)
        return [arr[i, :orig_h, :orig_w] for i in range(n)]

    def _run_batch(self, images: List[np.ndarray], masks: List[np.ndarray]) -> List[np.ndarray]:
        """images: HWC uint8 BGR (equal shapes); masks: HW/HW1 uint8."""
        return self._fetch_batch(self._dispatch_batch(images, masks),
                                 len(images))

    def inpaint(self, image: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """Single-image native-resolution inpaint (ref :17-28)."""
        return self._run_batch([image], [mask])[0]

    def inpaint_batch(self, images: List[np.ndarray], masks: List[np.ndarray]) -> List[np.ndarray]:
        """Mini-batched inference, two batches in flight (async dispatch);
        the tail batch pads to MINI_BATCH so each shape bucket compiles at
        most twice (batch 1 and batch 4)."""
        if len(images) == 1:
            return [self.inpaint(images[0], masks[0])]
        results: List[np.ndarray] = []
        pending: List[tuple] = []
        for start in range(0, len(images), MINI_BATCH):
            chunk = images[start : start + MINI_BATCH]
            mchunk = masks[start : start + MINI_BATCH]
            n = len(chunk)
            if n < MINI_BATCH:
                chunk = chunk + [chunk[-1]] * (MINI_BATCH - n)
                mchunk = mchunk + [mchunk[-1]] * (MINI_BATCH - n)
            pending.append((self._dispatch_batch(chunk, mchunk), n))
            if len(pending) > 2:
                handle, k = pending.pop(0)
                results.extend(self._fetch_batch(handle, k))
        for handle, k in pending:
            results.extend(self._fetch_batch(handle, k))
        return results

    # ---- video band path (ref :69-116) ----
    def __call__(self, input_frames: List[np.ndarray], input_mask: np.ndarray) -> List[np.ndarray]:
        mask = np.asarray(input_mask)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        H, W = mask.shape[:2]
        split_h = int(W * 3 / 16)
        bands = get_inpaint_area_by_mask(W, H, split_h, mask)
        out = [f.copy() for f in input_frames]
        if not bands:
            return out
        for band in bands:
            self._inpaint_band(out, mask, band[0], band[1])
        return out

    def _mesh_placements(self):
        """(batch_sharding, replicated_sharding) for mesh mode, else (None,
        None). Params/mask must be placed as mesh arrays BEFORE lowering —
        single-device-committed inputs conflict with the program's
        sharding constraints at compile time."""
        if getattr(self, "mesh", None) is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        if jax.tree_util.tree_leaves(self.params):
            first = jax.tree_util.tree_leaves(self.params)[0]
            if getattr(first, "sharding", None) != repl:
                self.params = jax.device_put(self.params, repl)
        return NamedSharding(self.mesh, P("data")), repl

    def _inpaint_band(self, out: List[np.ndarray], mask: np.ndarray,
                      ymin: int, ymax: int) -> None:
        """Inpaint one horizontal band in place across all frames.

        Tunnel-shaped streaming (round-4 profile: H2D at jnp.asarray
        granularity was 98 ms/frame of a 74 ms/frame budget):
        * the band mask is constant across frames — device_put ONCE;
        * frame crops upload as big stacked uint8 device_puts from a
          background thread (the link rewards few large transfers);
        * two batches stay in flight so host pad/stack/paste work hides
          behind device time even though the tunnel itself serializes
          transfer and execute RPCs;
        * D2H fetches only the mask-covering rows of the on-device composite
          (mask pixels = prediction, everything else = original input), in
          64-row buckets so programs stay warmup-precompilable.

        Documented divergence: the reference overwrites the WHOLE band with
        the generator's reconstruction (lama_inpaint.py:105), so non-mask
        band pixels pick up autoencoder noise there; the composite keeps
        them bit-exact to the input instead. VSR_LAMA_BAND_D2H=full restores
        the reference full-band overwrite (the e2e differential pins parity
        under that flag).
        """
        dev = jax.devices()[0]
        B = band_batch()
        batch_sharding, repl_sharding = self._mesh_placements()
        if getattr(self, "mesh", None) is not None:
            # one tail-padded shard per data device
            n_dev = self.mesh.shape["data"]
            B = -(-B // n_dev) * n_dev
        n = len(out)
        orig_h, orig_w = ymax - ymin, out[0].shape[1]

        d2h = d2h_codec()
        full_band = d2h == "full"
        bucket = pad_bucket() if full_band else band_pad_bucket()
        d_mask = jax.device_put(
            pad_to_modulo(mask[ymin:ymax], bucket)[None],
            repl_sharding or dev)

        # full-band compat mode implies exact uploads: it exists to reproduce
        # the reference's band overwrite byte-for-byte
        codec = "bgr" if full_band else h2d_codec()
        pad_h = -(-orig_h // bucket) * bucket
        pad_w = -(-orig_w // bucket) * bucket
        if codec == "i420" and (pad_h % 4 or pad_w % 2):
            # _i420_to_bgr_device's plane reshape assumes cv2's I420 packing,
            # which only round-trips when the padded height is a multiple of
            # 4 and the width is even (possible under a non-default
            # VSR_LAMA_BAND_BUCKET) — mirror the d2h guard below.
            codec = "bgr"
        if full_band:
            r0 = 0
            hole3 = None
        else:
            mrows = np.nonzero(mask[ymin:ymax, :, 0].any(axis=1))[0]
            if len(mrows) == 0:
                return  # nothing to inpaint in this band
            # 64-row out-height buckets bound the compile count; r0 is a
            # dynamic arg so mask position never recompiles
            out_h = min(orig_h, (int(mrows[-1] - mrows[0]) // 64 + 1) * 64)
            r0 = max(0, min(int(mrows[0]), orig_h - out_h))
            hole3 = mask[ymin + r0 : ymin + r0 + out_h] > 0  # [out_h, W, 1]
            if d2h == "i420" and (out_h % 4 or orig_w % 2):
                d2h = "bgr"  # I420 needs h%4 (plane packing) and even W

        q: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def encode(c: np.ndarray) -> np.ndarray:
            padded = pad_to_modulo(c, bucket)
            if codec == "i420":
                return cv2.cvtColor(padded, cv2.COLOR_BGR2YUV_I420)
            return padded

        def uploader() -> None:
            try:
                for start in range(0, n, B):
                    if stop.is_set():
                        break
                    chunk = [out[j][ymin:ymax] for j in
                             range(start, min(start + B, n))]
                    k = len(chunk)
                    if k < B:  # pad the tail: one program per bucket
                        chunk = chunk + [chunk[-1]] * (B - k)
                    arr = np.stack([encode(c) for c in chunk])
                    q.put((jax.device_put(arr, batch_sharding or dev),
                           start, k))
                q.put(None)
            except BaseException as e:  # surface in the consumer
                q.put(e)

        th = threading.Thread(target=uploader, daemon=True)
        th.start()
        pending: List[tuple] = []

        def paste(handle, start: int, k: int) -> None:
            arr = np.asarray(handle)
            if full_band:
                for i in range(k):
                    out[start + i][ymin:ymax] = arr[i, :orig_h, :orig_w]
            else:
                # blend ONLY mask pixels: everything else stays the original
                # frame byte-for-byte (the fetched non-mask pixels went
                # through the upload/download codecs and the device composite)
                y0 = ymin + r0
                for i in range(k):
                    rows = arr[i]
                    if d2h == "i420":
                        rows = cv2.cvtColor(rows, cv2.COLOR_YUV2BGR_I420)
                    np.copyto(out[start + i][y0 : y0 + out_h],
                              rows, where=hole3)

        def forward(d_img):
            if full_band:
                return self._forward(self.params, d_img, d_mask)
            return self._band_forward(self.params, d_img, d_mask,
                                      np.int32(r0), out_h, orig_w, codec,
                                      d2h)

        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                d_img, start, k = item
                pending.append((forward(d_img), start, k))
                if len(pending) > 2:
                    paste(*pending.pop(0))
            for h in pending:
                paste(*h)
        finally:
            stop.set()
            while th.is_alive():  # unblock a producer stuck on q.put
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                th.join(timeout=0.05)
