"""STTN-auto inpainting mode: fixed-mask temporal inpaint, no detection.

Capability parity with STTNInpaint/STTNAutoInpaint
(backend/inpaint/sttn_auto_inpaint.py:28-336): the mask's full-width bands of
height split_h = W*3/16 are cropped, resized to 640x120, inpainted by the
window engine, and blended back under the mask. Streaming runs in chunks of
``clip_gap`` frames.

Host/device split: band crop + cv2 resizes + mask blend stay on the host (cv2
bilinear, matching reference resampling exactly — see SURVEY.md §7 "bit-parity
pitfalls"); everything between (normalize, encoder, windows, transformer,
decode, uint8 pack) is one jitted program per chunk.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import cv2
import numpy as np

import jax.numpy as jnp

from vsr_tpu import native
from vsr_tpu.config import Config
from vsr_tpu.inpaint.engine import STTNWindowEngine
from vsr_tpu.inpaint.paste import band_out_rows, paste_band
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.masks.intervals import is_frame_number_in_ab_sections
from vsr_tpu.masks.mask import binarize_mask
from vsr_tpu.masks.solver import get_inpaint_area_by_mask
from vsr_tpu.models.sttn import STTN_AUTO_INPUT_SIZE, STTNGenerator


class STTNAutoInpainter:
    """Uniform inpainter contract: __call__(frames, mask) -> frames.

    Also exposes process_video() for the streaming chunked path used by the
    pipeline orchestrator.
    """

    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        config: Optional[Config] = None,
        input_size=STTN_AUTO_INPUT_SIZE,
    ):
        self.config = config or Config()
        self.model_input_width, self.model_input_height = input_size
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        self.model = STTNGenerator(variant="auto", dtype=dtype,
                                   use_pallas=self.config.use_pallas)
        from vsr_tpu.convert.torch_sttn import load_sttn_checkpoint

        self.params = load_or_init_params(
            self.model,
            (jnp.zeros((1, 1, self.model_input_height, self.model_input_width, 3)),),
            checkpoint_path,
            torch_converter=load_sttn_checkpoint,
        )
        # HBM-adaptive chunk length (the reference's free-VRAM clip_gap clamp,
        # sttn_auto_inpaint.py:229-238): only ever shrinks the configured gap.
        from vsr_tpu.utils.device import Accelerator

        self.clip_gap = Accelerator.instance().adaptive_clip_len(
            self.config.get_sttn_max_load_num(),
            self.model_input_height, self.model_input_width,
            minimum=self.config.sttn_reference_length,
        )
        self._engines = {}

    def _mesh(self):
        from vsr_tpu.parallel.mesh import default_inference_mesh

        return default_inference_mesh()

    def _engine(self, clip_len: int, out_rows=None) -> STTNWindowEngine:
        """One engine (one compiled program) per (chunk length, output slice)."""
        key = (clip_len, out_rows)
        if key not in self._engines:
            self._engines[key] = STTNWindowEngine(
                self.model,
                self.params,
                clip_len=clip_len,
                input_hw=(self.model_input_height, self.model_input_width),
                stride=self.config.sttn_neighbor_stride,
                ref_length=self.config.sttn_reference_length,
                window_batch=self.config.window_batch,
                out_rows=out_rows,
                mesh=self._mesh(),
            )
        return self._engines[key]

    def _band_out_rows(self, mask01: np.ndarray, band) -> tuple:
        return band_out_rows(mask01, band, self.model_input_height)

    # ---- band helpers ----
    def _split_h(self, width: int) -> int:
        return int(width * 3 / 16)  # ref :54,217

    def _crop_and_resize(self, frame: np.ndarray, band,
                         out: Optional[np.ndarray] = None) -> np.ndarray:
        ymin, ymax, _, _ = band
        res = native.crop_resize(
            frame, ymin, ymax - ymin,
            self.model_input_width, self.model_input_height, out=out)
        if res is not None:
            return res
        crop = frame[ymin:ymax, :, :]
        resized = cv2.resize(
            crop, (self.model_input_width, self.model_input_height))
        if out is not None:
            out[...] = resized
            return out
        return resized

    def _stack_band(self, frames: List[np.ndarray], band) -> np.ndarray:
        """Crop+resize a chunk directly into one preallocated [T, h, w, 3]
        buffer (the np.stack copy was ~35% of steady-state host prep)."""
        buf = np.empty((len(frames), self.model_input_height,
                        self.model_input_width, 3), np.uint8)
        for j, f in enumerate(frames):
            self._crop_and_resize(f, band, out=buf[j])
        return buf

    def _paste_band(
        self,
        frame: np.ndarray,
        comp: np.ndarray,
        band,
        mask01: np.ndarray,
        width: int,
        split_h: int,
        out_rows=None,
    ) -> None:
        paste_band(frame, comp, band, mask01, width,
                   self.model_input_height, out_rows)

    # ---- list-in/list-out contract (ref STTNInpaint.__call__ :43-97) ----
    def __call__(
        self, input_frames: List[np.ndarray], input_mask: np.ndarray
    ) -> List[np.ndarray]:
        """Streamed per band: chunk i's host prep and chunk i-2's paste-back
        run while the device crunches chunks i-1/i (async dispatch, two in
        flight) — host work hides behind device time exactly like
        process_video's 3-stage overlap."""
        mask01 = binarize_mask(input_mask)
        H, W = mask01.shape[:2]
        split_h = self._split_h(W)
        bands = get_inpaint_area_by_mask(W, H, split_h, mask01)
        if not bands:
            return [f.copy() for f in input_frames]
        out = [f.copy() for f in input_frames]
        t = len(input_frames)
        for band in bands:
            out_rows = self._band_out_rows(mask01, band)
            clip = min(self.clip_gap,
                       max(t, self.config.sttn_reference_length))
            engine = self._engine(clip, out_rows)

            def drain(item):
                start, handle = item
                for j, comp in enumerate(engine.fetch(handle)):
                    self._paste_band(out[start + j], comp, band, mask01, W,
                                     split_h, out_rows)

            pending = []
            for s in range(0, t, clip):
                scaled = self._stack_band(input_frames[s : s + clip], band)
                pending.append((s, engine.dispatch(scaled)))
                if len(pending) > 2:
                    drain(pending.pop(0))
            for item in pending:
                drain(item)
        return out

    # ---- streaming video path (ref STTNAutoInpaint.__call__ :199-336) ----
    def process_video(
        self,
        reader,
        writer,
        input_mask: np.ndarray,
        frame_count: int,
        size,  # (W, H)
        ab_sections=None,
        progress_cb: Optional[Callable[[int], None]] = None,
        preview_cb: Optional[Callable[[np.ndarray, np.ndarray], None]] = None,
    ) -> int:
        """Stream the whole video through chunked band inpainting.

        reader: object with read() -> (ok, BGR frame); writer: write(frame).
        Returns number of frames written.

        Pipelined: while the device crunches chunk i (async dispatch), the
        host pastes back and encodes chunk i-1 and the prefetch thread decodes
        chunk i+1 — the three stages overlap.
        """
        W, H = size
        split_h = self._split_h(W)
        mask01 = binarize_mask(input_mask)
        bands = get_inpaint_area_by_mask(W, H, split_h, mask01)
        clip = self.clip_gap
        band_rows = [self._band_out_rows(mask01, band) for band in bands]
        engines = [self._engine(clip, rows) for rows in band_rows]

        def read_chunk():
            frames_hr: List[np.ndarray] = []
            in_section: List[bool] = []
            nonlocal frame_no
            # cap at frame_count: CAP_PROP_FRAME_COUNT can undercount and the
            # writer/audio mux must stay in sync with the reported length
            while len(frames_hr) < clip and frame_no < frame_count:
                ok, frame = reader.read()
                if not ok:
                    break
                frames_hr.append(frame)
                in_section.append(
                    is_frame_number_in_ab_sections(frame_no, ab_sections)
                )
                frame_no += 1
            return frames_hr, in_section

        def dispatch_chunk(frames_hr, in_section):
            proc_idx = [i for i, p in enumerate(in_section) if p]
            handles = []
            if bands and proc_idx:
                for band, engine in zip(bands, engines):
                    scaled = self._stack_band(
                        [frames_hr[i] for i in proc_idx], band)
                    handles.append(engine.dispatch(scaled))
            return frames_hr, proc_idx, handles

        def drain_chunk(frames_hr, proc_idx, handles) -> int:
            comps_per_band = [engine.fetch(h)
                              for engine, h in zip(engines, handles)]
            proc_map = {i: j for j, i in enumerate(proc_idx)}
            n = 0
            for i, frame in enumerate(frames_hr):
                original = frame.copy() if preview_cb else None
                if i in proc_map and comps_per_band:
                    for band, rows, comps in zip(bands, band_rows,
                                                 comps_per_band):
                        self._paste_band(
                            frame, comps[proc_map[i]], band, mask01, W,
                            split_h, rows
                        )
                writer.write(frame)
                n += 1
                if progress_cb:
                    progress_cb(1)
                if preview_cb:
                    preview_cb(original, frame)
            return n

        written = 0
        frame_no = 0
        pending = None
        while written + (len(pending[0]) if pending else 0) < frame_count:
            frames_hr, in_section = read_chunk()
            if not frames_hr:
                break
            current = dispatch_chunk(frames_hr, in_section)
            if pending is not None:
                written += drain_chunk(*pending)
            pending = current
            if len(frames_hr) < clip:
                break  # reader exhausted
        if pending is not None:
            written += drain_chunk(*pending)
        return written
