"""Static-shape temporal window engine for STTN inference.

The reference walks a python loop per window, gathering a ragged
neighbor+reference frame set and calling the transformer on it
(backend/inpaint/sttn_auto_inpaint.py:142-162). On TPU that would retrace per
window length and serialize tiny kernels, so this engine:

1. pads every chunk to a fixed length T (``clip_len``) — one XLA program for
   the whole video;
2. precomputes, per chunk on the host, an index matrix [Wn, L] selecting each
   window's neighbor and reference slots, plus a validity mask for padded /
   out-of-range slots (L = n_max + r_max is static);
3. runs encode(all frames) -> gather -> transformer over a *batch of windows*
   -> decode(neighbor slots) -> **overlap-average compositing**, entirely
   jitted. Window batches stream through ``lax.map`` to bound activation
   memory; the batch size is auto-snapped to a divisor of the window count so
   no padded windows are computed.
4. Compositing runs on device in the reference's exact sequential order
   (first window truncates to uint8, later overlaps blend 0.5/0.5 in float,
   final truncation — :152-162), so only the composited [T, H, W, 3] uint8
   chunk crosses back to the host (4x less D2H than per-window predictions).

``dispatch``/``fetch`` split exposes JAX's async dispatch: the host can
paste-back/encode chunk i-1 while the device crunches chunk i.

Masked attention guarantees the padded computation equals the ragged one
(tested in tests/test_ops.py::test_padding_mask_equals_subset).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

MAX_OVERLAPS = 3  # a frame is covered by at most 3 windows (stride-5 windows span ±5)


def window_starts(t: int, stride: int) -> List[int]:
    return list(range(0, t, stride))


def neighbor_ids(f: int, t: int, stride: int) -> List[int]:
    """Window at f covers [f-stride, f+stride] clamped (ref :144)."""
    return list(range(max(0, f - stride), min(t, f + stride + 1)))


def ref_ids(neighbors: List[int], t: int, ref_length: int) -> List[int]:
    """Global refs every ref_length frames, excluding neighbors (ref :107-120)."""
    ns = set(neighbors)
    return [i for i in range(0, t, ref_length) if i not in ns]


def build_window_index(
    t_valid: int,
    t_padded: int,
    stride: int,
    ref_length: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Build gather indices for all windows of a chunk.

    Returns (idx [Wn, L] int32, valid [Wn, L] bool, n_max). Slot layout per
    window: [n_max neighbor slots | r_max reference slots]. Wn and L depend
    only on (t_padded, stride, ref_length) so compiled shapes are stable
    across chunks; t_valid only changes the *values*.
    """
    n_max = 2 * stride + 1
    r_max = math.ceil(t_padded / ref_length)
    wn = math.ceil(t_padded / stride)
    L = n_max + r_max
    idx = np.zeros((wn, L), np.int32)
    valid = np.zeros((wn, L), bool)
    for w, f in enumerate(window_starts(t_padded, stride)):
        if f >= t_valid:
            continue  # fully padded window; outputs discarded
        ns = neighbor_ids(f, t_valid, stride)
        rs = ref_ids(ns, t_valid, ref_length)
        idx[w, : len(ns)] = ns
        valid[w, : len(ns)] = True
        idx[w, n_max : n_max + len(rs)] = rs
        valid[w, n_max : n_max + len(rs)] = True
    return idx, valid, n_max


def build_composite_index(
    t_valid: int, t_padded: int, stride: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-frame contribution map for device-side compositing.

    Returns (fwin [T, K], fslot [T, K], fcount [T]): for each frame, the
    windows covering it (ascending — the reference's sequential blend order)
    and the neighbor slot holding its prediction.
    """
    fwin = np.zeros((t_padded, MAX_OVERLAPS), np.int32)
    fslot = np.zeros((t_padded, MAX_OVERLAPS), np.int32)
    fcount = np.zeros((t_padded,), np.int32)
    for w, f in enumerate(window_starts(t_valid, stride)):
        for slot, frame_idx in enumerate(neighbor_ids(f, t_valid, stride)):
            k = fcount[frame_idx]
            assert k < MAX_OVERLAPS, "window stride/overlap invariant violated"
            fwin[frame_idx, k] = w
            fslot[frame_idx, k] = slot
            fcount[frame_idx] += 1
    return fwin, fslot, fcount


def _auto_window_batch(num_windows: int, requested: int) -> int:
    """Largest divisor of num_windows that is <= requested (no padded windows)."""
    if requested <= 0 or requested >= num_windows:
        return num_windows
    for wb in range(requested, 0, -1):
        if num_windows % wb == 0:
            return wb
    return 1


class STTNWindowEngine:
    """Jitted chunk processor around an STTNGenerator."""

    def __init__(
        self,
        model,
        params,
        clip_len: int,
        input_hw: Tuple[int, int],
        stride: int = 5,
        ref_length: int = 10,
        window_batch: int = 0,
        masked: bool = False,
        out_rows: Optional[Tuple[int, int]] = None,
        mesh=None,
    ):
        self.model = model
        self.params = params
        self.clip_len = clip_len
        self.input_hw = input_hw
        self.stride = stride
        self.ref_length = ref_length
        self.masked = masked  # det variant: masked encoder input + attention
        # Multi-chip: windows are embarrassingly parallel after encode, so
        # with a mesh the whole window batch is evaluated at once with the
        # window axis sharded over 'data' (the CP-analog from SURVEY §2c);
        # GSPMD all-gathers the small encoded features to each chip.
        self.mesh = mesh
        # out_rows: static (r0, r1) row slice of the composited output to
        # return. When the video's mask only covers part of the band (the
        # common case), transferring just those rows cuts D2H severalfold —
        # the dominant cost over a remote device link. The caller must choose
        # rows with enough margin that every blended pixel's interpolation
        # support lies inside the slice (sttn_auto computes this).
        self.out_rows = out_rows
        self.n_max = 2 * stride + 1
        self.r_max = math.ceil(clip_len / ref_length)
        self.num_windows = math.ceil(clip_len / stride)
        if mesh is not None:
            # pad windows to the mesh's data-axis multiple, single batch
            n_dev = mesh.shape["data"]
            self.num_windows_sharded = math.ceil(self.num_windows / n_dev) * n_dev
            self.window_batch = self.num_windows_sharded
        else:
            self.num_windows_sharded = self.num_windows
            self.window_batch = _auto_window_batch(self.num_windows, window_batch)
        self._step = jax.jit(self._chunk_step)
        # AOT-compiled executable, built on first dispatch through the
        # on-disk executable cache (utils/exec_cache.py): the axon service
        # recompiles this 150-400 s program in every fresh process, so the
        # serialized executable is the only way to a fast cold start.
        self._compiled = None

    # ---- device program ----
    def _chunk_step(self, params, frames_u8, idx, valid, fwin, fslot, fcount,
                    masks=None):
        """frames_u8: [T, H, W, 3] BGR uint8; idx/valid: [Wn, L];
        fwin/fslot/fcount: composite index (build_composite_index);
        masks (det variant): [T, H, W] float {0,1} hole masks.

        Returns composited [T, H, W, 3] BGR uint8.
        """
        x = frames_u8[..., ::-1].astype(jnp.float32) / 255.0 * 2.0 - 1.0  # RGB [-1,1]
        feat_masks = None
        if masks is not None:
            # hole pixels removed from the encoder input (ref
            # sttn_det_inpaint.py:143) and nearest-1/4 mask fed to attention
            x = x * (1.0 - masks[..., None])
            feat_masks = masks[:, ::4, ::4]
        feats = self.model.apply(params, x, method=self.model.encode)  # [T,h,w,C]

        def window_batch_fn(args):
            widx, wvalid = args  # [wb, L], [wb, L]
            # invalid slots carry clamped-index (finite) features; they are
            # excluded from attention via the key mask and their outputs are
            # never composited, so no zeroing pass is needed
            wf = feats[widx]  # [wb, L, h, w, C]
            wm = feat_masks[widx] if feat_masks is not None else None
            out = self.model.apply(
                params, wf, wvalid, wm, method=self.model.transform
            )
            nb = out[:, : self.n_max]  # neighbor slots only
            wb, n, h, w, c = nb.shape
            dec = self.model.apply(
                params, nb.reshape(wb * n, h, w, c), method=self.model.decode
            )
            return dec.reshape(wb, n, dec.shape[1], dec.shape[2], 3)

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("data"))
            idx = jax.lax.with_sharding_constraint(idx, shard)
            valid = jax.lax.with_sharding_constraint(valid, shard)
            preds = window_batch_fn((idx, valid))
        else:
            wb = self.window_batch
            widx = idx.reshape(-1, wb, idx.shape[-1])
            wvalid = valid.reshape(-1, wb, valid.shape[-1])
            preds = jax.lax.map(window_batch_fn, (widx, wvalid))
            preds = preds.reshape(-1, self.n_max, *preds.shape[-3:])
        preds_u8 = jnp.clip((preds + 1.0) * 0.5 * 255.0, 0, 255).astype(jnp.uint8)
        preds_u8 = preds_u8[..., ::-1]  # RGB -> BGR

        r0, r1 = self.out_rows if self.out_rows is not None else (0, preds_u8.shape[2])
        preds_u8 = preds_u8[:, :, r0:r1]

        # per-frame contributions in window order: [T, K, rows, W, 3]
        contrib = preds_u8[fwin, fslot].astype(jnp.float32)
        if masks is not None:
            # det variant blends prediction into the source under the hole
            # before the overlap average (sttn_det_inpaint.py:168)
            m = masks[:, None, r0:r1, :, None]
            frame_f = frames_u8[:, None, r0:r1].astype(jnp.float32)
            contrib = contrib * m + frame_f * (1.0 - m)

        comp = contrib[:, 0]
        for k in range(1, MAX_OVERLAPS):
            take = (fcount > k)[:, None, None, None]
            comp = jnp.where(take, 0.5 * comp + 0.5 * contrib[:, k], comp)
        return comp.astype(jnp.uint8)

    # ---- host driver ----
    def dispatch(self, frames: np.ndarray, masks: Optional[np.ndarray] = None):
        """Launch one chunk asynchronously; returns an opaque handle.

        frames: [T', H, W, 3] BGR uint8 with T' <= clip_len (model input size).
        masks (det variant): [T', H, W] binary {0,1}.
        """
        t_valid = len(frames)
        assert 0 < t_valid <= self.clip_len, (t_valid, self.clip_len)
        h, w = self.input_hw
        assert frames.shape[1:] == (h, w, 3), frames.shape
        assert (masks is not None) == self.masked

        padded = frames
        if t_valid < self.clip_len:
            pad = np.repeat(frames[-1:], self.clip_len - t_valid, axis=0)
            padded = np.concatenate([frames, pad], axis=0)

        idx, valid, _ = build_window_index(
            t_valid, self.clip_len, self.stride, self.ref_length
        )
        if self.num_windows_sharded > idx.shape[0]:
            extra = self.num_windows_sharded - idx.shape[0]
            idx = np.concatenate([idx, np.zeros((extra, idx.shape[1]), idx.dtype)])
            valid = np.concatenate(
                [valid, np.zeros((extra, valid.shape[1]), bool)])
        fwin, fslot, fcount = build_composite_index(
            t_valid, self.clip_len, self.stride
        )
        args = [self.params, jnp.asarray(padded), jnp.asarray(idx),
                jnp.asarray(valid), jnp.asarray(fwin), jnp.asarray(fslot),
                jnp.asarray(fcount)]
        if self.masked:
            padded_masks = masks.astype(np.float32)
            if t_valid < self.clip_len:
                mpad = np.repeat(padded_masks[-1:], self.clip_len - t_valid, axis=0)
                padded_masks = np.concatenate([padded_masks, mpad], axis=0)
            args.append(jnp.asarray(padded_masks))
        if self._compiled is None:
            from vsr_tpu.utils.exec_cache import compile_cached

            self._compiled = compile_cached(self._step, *args)
        out = self._compiled(*args)  # async dispatch — does not block
        # Queue the D2H right behind this chunk's compute rather than at
        # np.asarray time (no measurable effect on the axon tunnel, where
        # transfers serialize with compute anyway, but it is the correct
        # ordering for standard PJRT backends with DMA streams).
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        return (out, t_valid)

    def fetch(self, handle) -> np.ndarray:
        """Block on a dispatched chunk; returns [T', H, W, 3] BGR uint8."""
        out, t_valid = handle
        return np.asarray(out)[:t_valid]

    def process_chunk(
        self, frames: np.ndarray, masks: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Synchronous dispatch+fetch."""
        return self.fetch(self.dispatch(frames, masks))
