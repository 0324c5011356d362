"""ProPainter inpainting mode: flow-guided propagation + sparse transformer.

Capability parity with PropainterInpaint (backend/inpaint/propainter_inpaint.py:
137-418): staged pipeline per batch —
  1. RAFT bidirectional flows in fp32, chunked by width-dependent
     short_clip_len 12/8/4/2 (ref :219-247);
  2. recurrent flow completion in sub_video_length=80 chunks, 5-frame halo
     (ref :253-281);
  3. parameter-free image propagation in <=100-frame chunks, 10-frame halo
     (ref :283-316);
  4. sliding transformer windows (stride neighbor_length//2=5, global refs
     every ref_stride=10) with the same uint8 0.5/0.5 overlap compositing.

Masks are dilated with scipy binary_dilation iterations=4 for both flow and
frame masks (ref read_mask :32-77 with mask_dilation=4). The band __call__
crops native-resolution full-width bands rounded to multiples of 8.

Compile-count note: stages 1-3 are jitted per distinct clip length (the
pipeline's batch_generator yields at most two per video). Stage 4 uses
static window scheduling by default: every window pads to (max neighbors +
max refs) with frame-validity masks threaded through the generator
(attention key bias + gated propagation scans), so ONE program compiles per
clip length. Interior windows match the ragged reference scheduling exactly
(tested); boundary windows differ marginally because the reference's
t_dilation key subsets are position-based (arange(i, T, 2)) and ragged
boundary selections place refs at parities no fixed shape can reproduce.
Set VSR_PP_DYNAMIC_WINDOWS=1 for the exact ragged scheduling (one compile
per distinct window shape).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
import scipy.ndimage

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.weights import load_or_init_params
from vsr_tpu.masks.solver import get_inpaint_area_by_mask
from vsr_tpu.models.propainter.flow_completion import RecurrentFlowCompleteNet
from vsr_tpu.models.propainter.generator import ProPainterGenerator, image_propagation
from vsr_tpu.models.propainter.raft import RAFT


def get_ref_index(mid, neighbor_ids, length, ref_stride=10, ref_num=-1):
    """Global reference frame selection (ref :120-134)."""
    ref_index = []
    if ref_num == -1:
        for i in range(0, length, ref_stride):
            if i not in neighbor_ids:
                ref_index.append(i)
    else:
        start_idx = max(0, mid - ref_stride * (ref_num // 2))
        end_idx = min(length, mid + ref_stride * (ref_num // 2))
        for i in range(start_idx, end_idx, ref_stride):
            if i not in neighbor_ids:
                if len(ref_index) > ref_num:
                    break
                ref_index.append(i)
    return ref_index


def dilate_mask(mask: np.ndarray, iterations: int) -> np.ndarray:
    """Binary dilation (scipy default 4-connectivity, ref read_mask)."""
    binary = np.asarray(mask).squeeze() > 0
    if iterations > 0:
        binary = scipy.ndimage.binary_dilation(binary, iterations=iterations)
    return binary.astype(np.float32)


def short_clip_len_for_width(width: int) -> int:
    if width <= 640:
        return 12
    if width <= 720:
        return 8
    if width <= 1280:
        return 4
    return 2


class PropainterInpainter:
    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        config: Optional[Config] = None,
        generator_kwargs: Optional[dict] = None,
        raft_kwargs: Optional[dict] = None,
    ):
        self.config = config or Config()
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        self.sub_video_length = self.config.propainter_subvideo_length
        self.neighbor_stride = self.config.propainter_neighbor_length // 2
        self.ref_stride = self.config.propainter_ref_stride
        self.mask_dilation = 4

        self.raft = RAFT(iters=self.config.propainter_raft_iters,
                         **(raft_kwargs or {}))  # fp32 (ref keeps RAFT fp32)
        self.flow_net = RecurrentFlowCompleteNet(dtype=dtype)
        self.generator = ProPainterGenerator(dtype=dtype, **(generator_kwargs or {}))

        def ckpt(name):
            if not checkpoint_dir:
                return None
            import os

            return os.path.join(checkpoint_dir, name)

        from vsr_tpu.convert.torch_propainter import (
            convert_flow_completion,
            convert_propainter_generator,
        )
        from vsr_tpu.convert.torch_raft import load_raft_checkpoint

        def torch_loader(convert_fn):
            def load(path):
                import torch

                return convert_fn(torch.load(path, map_location="cpu"))

            return load

        img = jnp.zeros((1, 64, 64, 3))
        self.raft_params = load_or_init_params(
            self.raft, (img, img), ckpt("raft.npz"),
            torch_converter=load_raft_checkpoint)
        self.flow_params = load_or_init_params(
            self.flow_net,
            (jnp.zeros((1, 2, 64, 64, 2)), jnp.zeros((1, 2, 64, 64, 1))),
            ckpt("flow_completion.npz"),
            torch_converter=torch_loader(convert_flow_completion))
        self.gen_params = load_or_init_params(
            self.generator,
            (jnp.zeros((1, 3, 64, 64, 3)),
             (jnp.zeros((1, 1, 64, 64, 2)), jnp.zeros((1, 1, 64, 64, 2))),
             jnp.zeros((1, 3, 64, 64, 1)), jnp.zeros((1, 3, 64, 64, 1)), 2),
            ckpt("propainter.npz"),
            torch_converter=torch_loader(convert_propainter_generator))

        from vsr_tpu.utils.exec_cache import cached_jit

        self._raft_pair_fn = cached_jit(
            lambda p, a, b: self.raft.apply(p, a, b))
        self._flow_complete_fn = cached_jit(self._flow_complete)
        self._img_prop_fn = cached_jit(image_propagation)
        # static window scheduling: pad every window to one shape per clip
        # length (VSR_PP_DYNAMIC_WINDOWS=1 restores the ragged reference
        # scheduling for A/B comparison)
        import os

        self.static_windows = os.environ.get("VSR_PP_DYNAMIC_WINDOWS") != "1"
        self._gen_fn = cached_jit(
            lambda p, fr, fl, m, mu, lt, fv: self.generator.apply(
                p, fr, fl, m, mu, lt, frame_valid=fv),
            static_argnums=(5,))

    # ---- stages ----
    def _flow_complete(self, params, flows_f, flows_b, masks):
        pred = self.flow_net.apply(
            params, (flows_f, flows_b), masks,
            method=self.flow_net.forward_bidirect_flow)
        return RecurrentFlowCompleteNet.combine_flow(
            (flows_f, flows_b), pred, masks)

    def _compute_flows(self, frames_n: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """frames_n [T, H, W, 3] in [-1,1] -> (flows_f, flows_b) [T-1, ...]."""
        T, H, W, _ = frames_n.shape
        clip = short_clip_len_for_width(W)
        f_list, b_list = [], []
        # chunk into fixed-size pair batches (pad tail) for stable compiles
        pairs_a = frames_n[:-1]
        pairs_b = frames_n[1:]
        n_pairs = T - 1
        for s in range(0, n_pairs, clip):
            a = pairs_a[s : s + clip]
            b = pairs_b[s : s + clip]
            n = len(a)
            if n < clip:
                pad = np.repeat(a[-1:], clip - n, axis=0)
                a = np.concatenate([a, pad])
                b = np.concatenate([b, np.repeat(b[-1:], clip - n, axis=0)])
            ff = np.asarray(self._raft_pair_fn(
                self.raft_params, jnp.asarray(a), jnp.asarray(b)))[:n]
            fb = np.asarray(self._raft_pair_fn(
                self.raft_params, jnp.asarray(b), jnp.asarray(a)))[:n]
            f_list.append(ff)
            b_list.append(fb)
        return np.concatenate(f_list), np.concatenate(b_list)

    def _complete_flows(self, flows_f, flows_b, flow_masks):
        """Chunked flow completion with halo (ref :253-281). Host-driven."""
        flow_length = len(flows_f)
        sub = self.sub_video_length
        if flow_length <= sub:
            out_f, out_b = self._flow_complete_fn(
                self.flow_params, jnp.asarray(flows_f[None]),
                jnp.asarray(flows_b[None]), jnp.asarray(flow_masks[None]))
            return np.asarray(out_f[0]), np.asarray(out_b[0])
        pad_len = 5
        pf, pb = [], []
        for f in range(0, flow_length, sub):
            s_f = max(0, f - pad_len)
            e_f = min(flow_length, f + sub + pad_len)
            pad_s = f - s_f
            pad_e = e_f - min(flow_length, f + sub)
            of, ob = self._flow_complete_fn(
                self.flow_params,
                jnp.asarray(flows_f[s_f:e_f][None]),
                jnp.asarray(flows_b[s_f:e_f][None]),
                jnp.asarray(flow_masks[s_f : e_f + 1][None]))
            of, ob = np.asarray(of[0]), np.asarray(ob[0])
            end = of.shape[0] - pad_e
            pf.append(of[pad_s:end])
            pb.append(ob[pad_s:end])
        return np.concatenate(pf), np.concatenate(pb)

    def _propagate_images(self, frames_n, masks_dilated, flows_f, flows_b):
        """Chunked image propagation with halo (ref :283-316)."""
        T = len(frames_n)
        masked = frames_n * (1 - masks_dilated)
        sub = min(100, self.sub_video_length)
        if T <= sub:
            prop, upd = self._img_prop_fn(
                jnp.asarray(masked[None]), jnp.asarray(masks_dilated[None]),
                jnp.asarray(flows_f[None]), jnp.asarray(flows_b[None]))
            prop, upd = np.asarray(prop[0]), np.asarray(upd[0])
            updated = frames_n * (1 - masks_dilated) + prop * masks_dilated
            return updated, upd
        pad_len = 10
        out_frames, out_masks = [], []
        for f in range(0, T, sub):
            s_f = max(0, f - pad_len)
            e_f = min(T, f + sub + pad_len)
            pad_s = f - s_f
            pad_e = e_f - min(T, f + sub)
            prop, upd = self._img_prop_fn(
                jnp.asarray(masked[s_f:e_f][None]),
                jnp.asarray(masks_dilated[s_f:e_f][None]),
                jnp.asarray(flows_f[s_f : e_f - 1][None]),
                jnp.asarray(flows_b[s_f : e_f - 1][None]))
            prop, upd = np.asarray(prop[0]), np.asarray(upd[0])
            updated = (frames_n[s_f:e_f] * (1 - masks_dilated[s_f:e_f])
                       + prop * masks_dilated[s_f:e_f])
            end = updated.shape[0] - pad_e
            out_frames.append(updated[pad_s:end])
            out_masks.append(upd[pad_s:end])
        return np.concatenate(out_frames), np.concatenate(out_masks)

    # ---- full pipeline on one clip ----
    def inpaint(self, frames_bgr: List[np.ndarray], mask: np.ndarray) -> List[np.ndarray]:
        """frames: list of equally-sized BGR uint8; mask: HxW{x1} uint8.

        Returns inpainted BGR uint8 frames. H, W must be divisible by 8
        (the band solver guarantees this via multiple=8).
        """
        dilated = dilate_mask(mask, self.mask_dilation)
        return self._inpaint_with_masks(frames_bgr, dilated, dilated)

    def _run_stages(self, rgb, frames_n, flow_masks, masks_dilated) -> List[np.ndarray]:
        T = len(frames_n)

        # 1) optical flow (fp32)
        flows_f, flows_b = self._compute_flows(frames_n)
        # 2) flow completion
        comp_f, comp_b = self._complete_flows(flows_f, flows_b, flow_masks)
        # 3) image propagation
        updated_frames, updated_masks = self._propagate_images(
            frames_n, masks_dilated, comp_f, comp_b)

        # 4) windowed transformer + composite
        comp_frames: List[Optional[np.ndarray]] = [None] * T
        ref_num = self.sub_video_length // self.ref_stride if T > self.sub_video_length else -1

        # precompute window selections; in static mode pad every window to
        # (n_max neighbors + r_max refs) with validity flags so one program
        # compiles per clip length instead of one per ragged shape
        windows = []
        for f in range(0, T, self.neighbor_stride):
            ns = list(range(max(0, f - self.neighbor_stride),
                            min(T, f + self.neighbor_stride + 1)))
            rs = get_ref_index(f, ns, T, self.ref_stride, ref_num)
            windows.append((ns, rs))
        static = self.static_windows
        n_max = max(len(ns) for ns, _ in windows)
        r_max = max(len(rs) for _, rs in windows)

        for neighbor_ids, ref_ids in windows:
            if static:
                n_pad = n_max - len(neighbor_ids)
                r_pad = r_max - len(ref_ids)
                sel = (neighbor_ids + [neighbor_ids[-1]] * n_pad
                       + ref_ids + [0] * r_pad)
                valid = np.zeros((1, len(sel)), bool)
                valid[0, : len(neighbor_ids)] = True
                valid[0, n_max : n_max + len(ref_ids)] = True
                l_t = n_max
                # masks of padded slots are zeroed (no attention occupancy)
                sel_arr = np.asarray(sel)
                sel_masks = masks_dilated[sel_arr].copy()
                sel_upd = updated_masks[sel_arr].copy()
                sel_masks[~valid[0]] = 0
                sel_upd[~valid[0]] = 0
                # neighbor-pair flows; zero the padded pairs
                pair_ids = np.asarray(
                    neighbor_ids[:-1]
                    + [neighbor_ids[-1] - 1] * n_pad)[: n_max - 1]
                flows_f_sel = comp_f[pair_ids].copy()
                flows_b_sel = comp_b[pair_ids].copy()
                n_valid_pairs = len(neighbor_ids) - 1
                flows_f_sel[n_valid_pairs:] = 0
                flows_b_sel[n_valid_pairs:] = 0
                frame_valid = jnp.asarray(valid)
            else:
                sel = neighbor_ids + ref_ids
                sel_arr = np.asarray(sel)
                sel_masks = masks_dilated[sel_arr]
                sel_upd = updated_masks[sel_arr]
                flows_f_sel = comp_f[np.asarray(neighbor_ids[:-1])]
                flows_b_sel = comp_b[np.asarray(neighbor_ids[:-1])]
                l_t = len(neighbor_ids)
                frame_valid = None
            sel_flows = (jnp.asarray(flows_f_sel[None]),
                         jnp.asarray(flows_b_sel[None]))
            pred = self._gen_fn(
                self.gen_params,
                jnp.asarray(updated_frames[sel_arr][None]),
                sel_flows,
                jnp.asarray(sel_masks[None]),
                jnp.asarray(sel_upd[None]),
                l_t,
                frame_valid,
            )
            pred = np.asarray(pred[0])
            pred_u8 = np.clip((pred + 1) / 2 * 255, 0, 255).astype(np.uint8)
            for i, idx in enumerate(neighbor_ids):
                bmask = masks_dilated[idx].astype(np.uint8)
                img = pred_u8[i] * bmask + rgb[idx] * (1 - bmask)
                if comp_frames[idx] is None:
                    comp_frames[idx] = img
                else:
                    comp_frames[idx] = (
                        comp_frames[idx].astype(np.float32) * 0.5
                        + img.astype(np.float32) * 0.5
                    ).astype(np.uint8)
        return [c[..., ::-1].astype(np.uint8) for c in comp_frames]  # RGB->BGR

    # ---- video outpainting (ref extrapolation :80-118) ----
    def outpaint(
        self, frames_bgr: List[np.ndarray], scale: Tuple[float, float]
    ) -> List[np.ndarray]:
        """Extend the field of view by scale=(sh, sw): frames are centered on
        an enlarged canvas and the border is synthesized. The flow mask keeps
        a 4px overlap into known content when the border is wide (ref :105)."""
        n = len(frames_bgr)
        h, w = frames_bgr[0].shape[:2]
        eh = int(scale[0] * h) - int(scale[0] * h) % 8
        ew = int(scale[1] * w) - int(scale[1] * w) % 8
        y0 = (eh - h) // 2
        x0 = (ew - w) // 2
        canvas = np.zeros((n, eh, ew, 3), np.uint8)
        canvas[:, y0 : y0 + h, x0 : x0 + w] = np.stack(frames_bgr)

        dil_h = 4 if y0 > 10 else 0
        dil_w = 4 if x0 > 10 else 0
        flow_mask = np.ones((eh, ew), np.float32)
        flow_mask[y0 + dil_h : y0 + h - dil_h, x0 + dil_w : x0 + w - dil_w] = 0
        mask = np.ones((eh, ew), np.float32)
        mask[y0 : y0 + h, x0 : x0 + w] = 0
        return self._inpaint_with_masks(list(canvas), flow_mask, mask)

    def _inpaint_with_masks(self, frames_bgr, flow_mask, mask_dilated):
        """Core staged pipeline with explicit (flow_mask, mask) pair —
        shared by inpaint() (both = dilated subtitle mask) and outpaint()."""
        T = len(frames_bgr)
        rgb = np.stack([f[..., ::-1] for f in frames_bgr])
        frames_n = rgb.astype(np.float32) / 255.0 * 2.0 - 1.0
        flow_masks = np.repeat(flow_mask[None, :, :, None], T, axis=0)
        masks_dilated = np.repeat(mask_dilated[None, :, :, None], T, axis=0)
        return self._run_stages(rgb, frames_n, flow_masks, masks_dilated)

    # ---- band video path (ref :363-418) ----
    def __call__(self, input_frames: List[np.ndarray], input_mask: np.ndarray) -> List[np.ndarray]:
        mask = np.asarray(input_mask)
        if mask.ndim == 2:
            mask = mask[:, :, None]
        H, W = mask.shape[:2]
        split_h = int(W * 3 / 16)
        bands = get_inpaint_area_by_mask(W, H, split_h, mask, multiple=8)
        out = [f.copy() for f in input_frames]
        if not bands:
            return out
        for ymin, ymax, xmin, xmax in bands:
            crops = [f[ymin:ymax, xmin:xmax, :] for f in out]
            mask_crop = mask[ymin:ymax, xmin:xmax, 0]
            comps = self.inpaint(crops, mask_crop)
            for j in range(len(out)):
                out[j][ymin:ymax, xmin:xmax, :] = comps[j]
        return out
