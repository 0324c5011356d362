"""Precompile the standard shape buckets into the on-disk executable cache.

The axon TPU service recompiles large programs per process (150-400 s cold,
CLAUDE.md "compile caching reality") and bypasses JAX's persistent cache;
``vsr_tpu.utils.exec_cache`` serializes compiled executables to
``~/.cache/vsr_tpu/executables`` instead. This module pays that compile cost
up front — ``vsr_tpu --warmup`` — so the first real run of each mode starts
in seconds (VERDICT r2 item 5: the 280 s single-image LaMa cold start).

What gets warmed per mode:
* sttn-auto / sttn-det: the chunked window engine at the configured
  ``clip_gap`` (the one big program each mode dispatches);
* lama: the batch-1 picture program and the batch-``MINI_BATCH`` band
  program for each requested frame size (sizes collapse into few programs
  via the modulo-``pad_bucket()`` shape buckets);
* propainter (opt-in — many programs, minutes of compile): the four staged
  programs at the band geometry of each requested size.
"""

from __future__ import annotations

import time
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from vsr_tpu.config import Config

# common source material: 480p (the reference test assets), 720p, 1080p
DEFAULT_SIZES: Tuple[Tuple[int, int], ...] = ((480, 852), (720, 1280),
                                              (1080, 1920))
DEFAULT_MODES: Tuple[str, ...] = ("sttn-auto", "sttn-det", "lama")


def _log(msg: str) -> None:
    print(f"[warmup] {msg}", flush=True)


def _warm_sttn(mode: str, cfg: Config, checkpoint_dir: Optional[str],
               clip_len: Optional[int]) -> None:
    import os

    ckpt = None
    if checkpoint_dir:
        name = "sttn_auto.npz" if mode == "sttn-auto" else "sttn_det.npz"
        path = os.path.join(checkpoint_dir, name)
        ckpt = path if os.path.exists(path) else None
    if mode == "sttn-auto":
        from vsr_tpu.inpaint.sttn_auto import STTNAutoInpainter

        inp = STTNAutoInpainter(checkpoint_path=ckpt, config=cfg)
        clip = clip_len or inp.clip_gap
        engine = inp._engine(clip, None)
        frames = np.zeros((clip, inp.model_input_height,
                           inp.model_input_width, 3), np.uint8)
        engine.fetch(engine.dispatch(frames))
    else:
        from vsr_tpu.inpaint.sttn_det import STTNDetInpainter

        inp = STTNDetInpainter(checkpoint_path=ckpt, config=cfg)
        clip = clip_len or cfg.get_sttn_max_load_num()
        engine = inp._engine(clip, None)
        frames = np.zeros((clip, inp.model_input_height,
                           inp.model_input_width, 3), np.uint8)
        masks = np.zeros((clip, inp.model_input_height,
                          inp.model_input_width), np.float32)
        masks[:, 2:6, 2:6] = 1.0
        engine.fetch(engine.dispatch(frames, masks))


def _warm_lama(cfg: Config, checkpoint_dir: Optional[str],
               sizes: Sequence[Tuple[int, int]]) -> None:
    import os

    from vsr_tpu.inpaint.lama import LamaInpainter

    ckpt = None
    if checkpoint_dir:
        path = os.path.join(checkpoint_dir, "lama.npz")
        ckpt = path if os.path.exists(path) else None
    inp = LamaInpainter(checkpoint_path=ckpt, config=cfg)
    for h, w in sizes:
        mask = np.zeros((h, w), np.uint8)
        mask[h // 2 : h // 2 + 8, w // 4 : w // 2] = 255
        # picture path (batch 1, full resolution)
        inp.inpaint(np.zeros((h, w, 3), np.uint8), mask)
        # video band path (batch band_batch() with the resident band mask,
        # at split_h = W*3/16 — the same program __call__ dispatches)
        from vsr_tpu.inpaint.lama import band_batch

        split_h = int(w * 3 / 16)
        frames = [np.zeros((h, w, 3), np.uint8)
                  for _ in range(band_batch())]
        full_mask = np.zeros((h, w, 1), np.uint8)
        # ~100-row mask: subtitle bands at 720p+ land in the 128-row D2H
        # out-height bucket — warm that program, not the 64-row one
        mh = min(100, split_h - 8)
        full_mask[h - 4 - mh : h - 4, w // 4 : w // 2] = 255
        inp(frames, full_mask)


def _warm_propainter(cfg: Config, checkpoint_dir: Optional[str],
                     sizes: Sequence[Tuple[int, int]],
                     clip_len: Optional[int]) -> None:
    from vsr_tpu.inpaint.propainter import PropainterInpainter

    inp = PropainterInpainter(checkpoint_dir=checkpoint_dir, config=cfg)
    t = clip_len or cfg.propainter_max_load_num
    for h, w in sizes:
        split_h = int(w * 3 / 16)
        band_h = min(h, split_h + (-split_h) % 8)
        frames = [np.zeros((band_h, w, 3), np.uint8) for _ in range(t)]
        mask = np.zeros((band_h, w), np.uint8)
        mask[band_h // 3 : 2 * band_h // 3, w // 4 : 3 * w // 4] = 255
        inp.inpaint(frames, mask)


def warmup(
    modes: Iterable[str] = DEFAULT_MODES,
    sizes: Sequence[Tuple[int, int]] = DEFAULT_SIZES,
    checkpoint_dir: Optional[str] = None,
    config: Optional[Config] = None,
    clip_len: Optional[int] = None,
) -> List[str]:
    """Compile (and exec-cache) each mode's standard programs. Returns the
    list of modes warmed. ``clip_len`` overrides the engine chunk length
    (tests use a tiny one; production leaves it None = configured gap)."""
    cfg = config or Config()
    done = []
    for mode in modes:
        t0 = time.perf_counter()
        if mode in ("sttn-auto", "sttn-det"):
            _warm_sttn(mode, cfg, checkpoint_dir, clip_len)
        elif mode == "lama":
            _warm_lama(cfg, checkpoint_dir, sizes)
        elif mode == "propainter":
            _warm_propainter(cfg, checkpoint_dir, sizes, clip_len)
        elif mode == "opencv":
            continue  # host-only, nothing to compile
        else:
            raise ValueError(f"unknown warmup mode: {mode}")
        _log(f"{mode}: ready in {time.perf_counter() - t0:.1f}s")
        done.append(mode)
    return done
