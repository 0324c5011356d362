"""Subtitle detection over video frames — the TPU-batched replacement for
the reference's SubtitleDetect (backend/tools/subtitle_detect.py:16-132).

Behavioural parity:
* fps-adaptive sampling (step 4/3/2 for >=60/>=30/else fps, :29-39)
* per-frame DBNet detection filtered to the user's subtitle areas (:56-82)
* gap interpolation between consecutive detected samples (gap <= 2*step,
  :112-124) and region unification (:181-215 — see masks/intervals.py)

TPU-first difference: sampled frames are accumulated into fixed-size batches
and run through one jitted DBNet forward per batch (static shape bucket per
video resolution), instead of one Paddle predict() per frame.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config, SubtitleDetectMode
from vsr_tpu.detect.boxes import get_coordinates
from vsr_tpu.detect.dbnet import DBNet
from vsr_tpu.detect.postprocess import db_postprocess
from vsr_tpu.detect.preprocess import det_resize_shape, preprocess_frame
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.io.video import VideoReader, read_video_info
from vsr_tpu.masks.intervals import (
    find_continuous_ranges,
    find_continuous_ranges_with_same_mask,
    is_frame_number_in_ab_sections,
    split_range_by_scene,
    unify_regions,
)

Box = Tuple[int, int, int, int]  # (xmin, xmax, ymin, ymax)


class SubtitleDetector:
    def __init__(
        self,
        video_path: str,
        sub_areas: Optional[Sequence[Tuple[int, int, int, int]]] = None,
        config: Optional[Config] = None,
        checkpoint_path: Optional[str] = None,
        batch_size: int = 8,
        model: Optional[DBNet] = None,
    ):
        self.video_path = video_path
        self.sub_areas = list(sub_areas or [])
        self.config = config or Config()
        self.checkpoint_path = checkpoint_path
        self.batch_size = batch_size
        self._model = model
        self._params = None
        self._forward = None
        self.sample_step = self._compute_sample_step()

    def _compute_sample_step(self) -> int:
        """>=8 OCR samples/s (ref :29-39)."""
        try:
            fps = read_video_info(self.video_path).fps
        except Exception:
            return 3
        if fps >= 60:
            return 4
        if fps >= 30:
            return 3
        return 2

    # ---- model plumbing ----
    @property
    def model(self) -> DBNet:
        if self._model is None:
            preset = (
                "server"
                if self.config.subtitle_detect_mode == SubtitleDetectMode.PP_OCRv5_SERVER
                else "mobile"
            )
            self._model = DBNet(preset=preset)
        return self._model

    def _ensure_params(self, sample: np.ndarray) -> None:
        if self._params is None:
            self._params = load_or_init_params(
                self.model, (jnp.asarray(sample[None]),), self.checkpoint_path
            )
            from vsr_tpu.utils.exec_cache import cached_jit

            self._forward = cached_jit(
                lambda params, x: self.model.apply(params, x)
            )

    # ---- detection ----
    def _detect_batch(self, frames_bgr: List[np.ndarray]) -> List[List[Box]]:
        """DBNet over a batch of equally-sized BGR frames -> boxes per frame.

        Tail batches pad to batch_size (replicated last frame, results
        dropped) so each video resolution compiles exactly one program."""
        n = len(frames_bgr)
        h, w = frames_bgr[0].shape[:2]
        batch = np.stack([preprocess_frame(f) for f in frames_bgr])
        if n < self.batch_size:
            pad = np.repeat(batch[-1:], self.batch_size - n, axis=0)
            batch = np.concatenate([batch, pad])
        self._ensure_params(batch[0])
        prob = np.asarray(self._forward(self._params, jnp.asarray(batch)))
        results: List[List[Box]] = []
        for i in range(n):
            quads = db_postprocess(prob[i, ..., 0], (h, w))
            results.append(get_coordinates([q.tolist() for q in quads]))
        return results

    def _filter_to_areas(self, boxes: List[Box]) -> List[Box]:
        """Keep boxes fully inside any user subtitle area (ref :60-81)."""
        if not self.sub_areas:
            return list(boxes)
        kept = []
        for xmin, xmax, ymin, ymax in boxes:
            for s_ymin, s_ymax, s_xmin, s_xmax in self.sub_areas:
                if (s_xmin <= xmin and xmax <= s_xmax
                        and s_ymin <= ymin and ymax <= s_ymax):
                    kept.append((xmin, xmax, ymin, ymax))
                    break
        return kept

    def detect_subtitle(self, img: np.ndarray) -> List[Box]:
        """Single-image detection + area filter (ref :56-82)."""
        return self._filter_to_areas(self._detect_batch([img])[0])

    def find_subtitle_frame_no(self, sub_remover=None) -> Dict[int, List[Box]]:
        """Sample frames, batch-detect, interpolate gaps, unify regions.

        Returns {frame_no (1-based): [(xmin, xmax, ymin, ymax), ...]}.
        """
        ab_sections = getattr(sub_remover, "ab_sections", None)
        reader = VideoReader(self.video_path)
        frame_count = reader.info.frame_count

        sampled_results: Dict[int, List[Box]] = {}
        pending: List[Tuple[int, np.ndarray]] = []

        def flush():
            if not pending:
                return
            frames = [f for _, f in pending]
            for (frame_no, _), boxes in zip(pending, self._detect_batch(frames)):
                kept = self._filter_to_areas(boxes)
                if kept:
                    sampled_results[frame_no] = kept
            pending.clear()

        current = 0
        try:
            while True:
                ok, frame = reader.read()
                if not ok:
                    break
                current += 1
                if not is_frame_number_in_ab_sections(current - 1, ab_sections):
                    continue
                if (current - 1) % self.sample_step == 0 or self.sample_step <= 1:
                    pending.append((current, frame))
                    if len(pending) >= self.batch_size:
                        flush()
                if sub_remover is not None and frame_count:
                    sub_remover.progress_total = (
                        100.0 * current / frame_count
                    ) // 2
            flush()
        finally:
            reader.release()

        # gap interpolation (ref :112-124)
        out: Dict[int, List[Box]] = {}
        detected = sorted(sampled_results.keys())
        max_gap = self.sample_step * 2
        for f, next_f in zip(detected, detected[1:]):
            out[f] = sampled_results[f]
            if next_f - f <= max_gap:
                for fill in range(f + 1, next_f):
                    out[fill] = sampled_results[f]
        if detected:
            out[detected[-1]] = sampled_results[detected[-1]]

        out = unify_regions(
            out,
            tol_x=self.config.subtitle_area_pixel_tolerance_x,
            tol_y=self.config.subtitle_area_pixel_tolerance_y,
        )
        return {k: v for k, v in out.items() if v}

    # convenience passthroughs mirroring the reference static helpers
    find_continuous_ranges = staticmethod(find_continuous_ranges)
    find_continuous_ranges_with_same_mask = staticmethod(
        find_continuous_ranges_with_same_mask
    )
    split_range_by_scene = staticmethod(split_range_by_scene)
