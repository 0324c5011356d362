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
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.masks.solver import get_inpaint_area_by_mask
from vsr_tpu.models.lama import LamaGenerator

MINI_BATCH = 4  # ref :38


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
    ):
        self.config = config or Config()
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        self.model = LamaGenerator(n_blocks=n_blocks, dtype=dtype)
        self.params = load_or_init_params(
            self.model,
            (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))),
            checkpoint_path,
        )
        from vsr_tpu.utils.exec_cache import cached_jit

        def fwd(params, img_u8, mask_u8):
            # uint8 in, uint8 out: normalization and the final clip/cast run
            # on device so only uint8 crosses the (slow, tunnelled) link
            img = img_u8.astype(jnp.float32) / 255.0
            msk = (mask_u8 > 0).astype(jnp.float32)
            out = self.model.apply(params, img, msk)
            return jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)

        self._forward = cached_jit(fwd)

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
            ymin, ymax = band[0], band[1]
            crops = [f[ymin:ymax, :, :] for f in out]
            mcrops = [mask[ymin:ymax, :, :]] * len(crops)
            comps = self.inpaint_batch(crops, mcrops)
            for j in range(len(out)):
                out[j][ymin:ymax, :, :] = comps[j]
        return out
