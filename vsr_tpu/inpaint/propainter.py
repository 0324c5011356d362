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
    """Reference RAFT pair-chunk table (propainter_inpaint.py:221-228) —
    width-keyed because the reference always flows FULL frames on ~24 GB
    GPUs. Kept for parity reference; the wrapper sizes by corr footprint
    (raft_chunk_pairs), which matters for band crops far smaller than the
    frame."""
    if width <= 640:
        return 12
    if width <= 720:
        return 8
    if width <= 1280:
        return 4
    return 2


def raft_chunk_pairs(height: int, width: int,
                     budget_bytes: float = 4e9) -> int:
    """Pairs per RAFT call sized so the all-pairs corr pyramid fits the
    budget: each per-call RPC to the (remote) device costs ~1 s, so bigger
    chunks directly cut the flow stage's wall clock. 4 GB default leaves
    room for RAFT activations + the pipeline's resident frame stacks in
    16 GB HBM."""
    n1 = max(1, (height // 8) * (width // 8))
    per_pair = (n1 * n1) * 4 * 1.34  # fp32 pyramid, levels sum to ~1.33x
    return int(max(2, min(16, budget_bytes // per_pair)))


class PropainterInpainter:
    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        config: Optional[Config] = None,
        generator_kwargs: Optional[dict] = None,
        raft_kwargs: Optional[dict] = None,
        mesh=None,
    ):
        self.config = config or Config()
        # Multi-chip (SURVEY §2c temporal-window sharding): with a mesh the
        # static window sweep batches windows in multiples of the 'data'
        # axis and shards the generator's window-batch dimension over it —
        # the same CP-analog the STTN engine uses (engine.py mesh mode).
        # Stages 1-3 stay single-program (sequential scans over time); the
        # transformer sweep is where the FLOPs are.
        self.mesh = mesh
        dtype = jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32
        self.sub_video_length = self.config.propainter_subvideo_length
        self.neighbor_stride = self.config.propainter_neighbor_length // 2
        self.ref_stride = self.config.propainter_ref_stride
        self.mask_dilation = 4

        raft_kwargs = dict(raft_kwargs or {})
        if "corr_dtype" not in raft_kwargs:
            # bf16 corr pyramid SETTLED round 5 (VERDICT r4 #3): the parity
            # gate passes easily (mean 0.022 px EPE,
            # tests/test_propainter.py TestBF16CorrParityGate) but on the v5e
            # it measured a WASH at the 720p band bench geometry — 2.93 fps
            # vs 3.02 fp32 — because the round-3 one-hot matmul lookup made
            # the pyramid read MXU-bound, not byte-bound, and the per-step
            # bf16->fp32 cast eats the byte saving. Default stays fp32
            # (which is also the torch bit-parity dtype);
            # VSR_PP_CORR_DTYPE=bfloat16 opts in where HBM, not the lookup,
            # is the binding constraint (e.g. longer clips at higher res).
            import os as _os

            raft_kwargs["corr_dtype"] = (
                jnp.bfloat16
                if _os.environ.get("VSR_PP_CORR_DTYPE") == "bfloat16"
                else jnp.float32)
        self.raft = RAFT(iters=self.config.propainter_raft_iters,
                         **raft_kwargs)
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

        self._raft_encode_fn = cached_jit(
            lambda p, x: self.raft.apply(p, x, method="encode"))
        self._raft_flow_fn = cached_jit(
            lambda p, f1, f2, net, inp: self.raft.apply(
                p, f1, f2, net, inp, method="forward_encoded"))
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
        # whole-clip per-frame encoding (window-independent): lets the
        # static sweep encode each frame once instead of re-encoding every
        # window's frame set (typ. ~3x fewer encoder frame passes at
        # stride 5 / window 11 + refs)
        self._encode_fn = cached_jit(
            lambda p, fr, m, mu: self.generator.apply(
                p, fr, m, mu, method="encode"))
        # static-window device sweep: generator + composite in one program,
        # comp/written buffers donated across the window loop
        self._window_compose_fn = cached_jit(
            self._window_compose, donate_argnums=(7, 8))

    # ---- stages ----
    def _flow_complete(self, params, flows_f, flows_b, masks):
        pred = self.flow_net.apply(
            params, (flows_f, flows_b), masks,
            method=self.flow_net.forward_bidirect_flow)
        return RecurrentFlowCompleteNet.combine_flow(
            (flows_f, flows_b), pred, masks)

    def _compute_flows(self, frames_n) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """frames_n [T, H, W, 3] in [-1,1] (device) -> (flows_f, flows_b)
        [T-1, ...] on device.

        Device-resident: inputs are sliced on device and outputs stay there —
        per-chunk host round trips (~40 MB each over a ~10-60 MB/s tunnel)
        previously dominated this stage's wall clock.
        """
        T, H, W, _ = frames_n.shape
        n_pairs = T - 1
        cap = raft_chunk_pairs(H, W)
        # balanced chunks: minimize tail padding (a padded pair costs as
        # much as a real one — RAFT is gather-bound, not dispatch-bound)
        n_chunks = max(1, math.ceil(n_pairs / cap))
        clip = math.ceil(n_pairs / n_chunks)
        frames_n = jnp.asarray(frames_n)
        # encode every frame ONCE (fnet+cnet are pair-independent); the
        # chunked pair loop below then runs only the iterative GRU stage.
        # Per-pair-per-direction RAFT re-encoded image1+image2, so interior
        # frames passed through fnet 4x and cnet 2x before this split.
        fmap, net, inp = self._raft_encode_fn(self.raft_params, frames_n)
        f_list, b_list = [], []

        def pad_tail(x, n):
            return (x if n == clip
                    else jnp.concatenate([x, jnp.repeat(x[-1:], clip - n, 0)]))

        # chunk into fixed-size pair batches (pad tail) for stable compiles
        for s in range(0, n_pairs, clip):
            e = min(s + clip, n_pairs)
            n = e - s
            fa, fb = pad_tail(fmap[s:e], n), pad_tail(fmap[s + 1 : e + 1], n)
            # forward pair (i -> i+1): context of frame i; backward: of i+1
            f_list.append(self._raft_flow_fn(
                self.raft_params, fa, fb,
                pad_tail(net[s:e], n), pad_tail(inp[s:e], n))[:n])
            b_list.append(self._raft_flow_fn(
                self.raft_params, fb, fa,
                pad_tail(net[s + 1 : e + 1], n),
                pad_tail(inp[s + 1 : e + 1], n))[:n])
        if len(f_list) == 1:
            return f_list[0], b_list[0]
        return jnp.concatenate(f_list), jnp.concatenate(b_list)

    def _complete_flows(self, flows_f, flows_b, flow_masks):
        """Chunked flow completion with halo (ref :253-281). Device-resident:
        slices and outputs stay jnp arrays."""
        flow_length = len(flows_f)
        sub = self.sub_video_length
        if flow_length <= sub:
            out_f, out_b = self._flow_complete_fn(
                self.flow_params, jnp.asarray(flows_f)[None],
                jnp.asarray(flows_b)[None], jnp.asarray(flow_masks)[None])
            return out_f[0], out_b[0]
        pad_len = 5
        pf, pb = [], []
        for f in range(0, flow_length, sub):
            s_f = max(0, f - pad_len)
            e_f = min(flow_length, f + sub + pad_len)
            pad_s = f - s_f
            pad_e = e_f - min(flow_length, f + sub)
            of, ob = self._flow_complete_fn(
                self.flow_params,
                jnp.asarray(flows_f[s_f:e_f])[None],
                jnp.asarray(flows_b[s_f:e_f])[None],
                jnp.asarray(flow_masks[s_f : e_f + 1])[None])
            of, ob = of[0], ob[0]
            end = of.shape[0] - pad_e
            pf.append(of[pad_s:end])
            pb.append(ob[pad_s:end])
        return jnp.concatenate(pf), jnp.concatenate(pb)

    def _propagate_images(self, frames_n, masks_dilated, flows_f, flows_b):
        """Chunked image propagation with halo (ref :283-316).
        Device-resident in and out."""
        T = len(frames_n)
        frames_n = jnp.asarray(frames_n)
        masks_dilated = jnp.asarray(masks_dilated)
        masked = frames_n * (1 - masks_dilated)
        sub = min(100, self.sub_video_length)
        if T <= sub:
            prop, upd = self._img_prop_fn(
                masked[None], masks_dilated[None],
                jnp.asarray(flows_f)[None], jnp.asarray(flows_b)[None])
            prop, upd = prop[0], upd[0]
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
                masked[s_f:e_f][None],
                masks_dilated[s_f:e_f][None],
                jnp.asarray(flows_f[s_f : e_f - 1])[None],
                jnp.asarray(flows_b[s_f : e_f - 1])[None])
            prop, upd = prop[0], upd[0]
            updated = (frames_n[s_f:e_f] * (1 - masks_dilated[s_f:e_f])
                       + prop * masks_dilated[s_f:e_f])
            end = updated.shape[0] - pad_e
            out_frames.append(updated[pad_s:end])
            out_masks.append(upd[pad_s:end])
        return jnp.concatenate(out_frames), jnp.concatenate(out_masks)

    # ---- full pipeline on one clip ----
    def inpaint(self, frames_bgr: List[np.ndarray], mask: np.ndarray) -> List[np.ndarray]:
        """frames: list of equally-sized BGR uint8; mask: HxW{x1} uint8.

        Returns inpainted BGR uint8 frames. H, W must be divisible by 8
        (the band solver guarantees this via multiple=8).
        """
        dilated = dilate_mask(mask, self.mask_dilation)
        return self._inpaint_with_masks(frames_bgr, dilated, dilated)

    @staticmethod
    def _mask_rows(mask: np.ndarray):
        rows = np.nonzero(np.asarray(mask).any(axis=1))[0]
        if len(rows) == 0:
            return None
        return (int(rows[0]), int(rows[-1]) + 1)

    def _masked_window_set(self, mask2d: np.ndarray):
        """Hole-bearing attention-window indices for a frame-constant mask —
        the static window-skip set (VERDICT r4 #3). Replicates the generator's
        mask-token geometry on host: nearest /4 downsample, maxpool k7 s3 p3
        (forward_encoded), ceil window partition (SparseWindowAttention).
        Returns None when every window bears mask (the skip would be a no-op)
        — the attention then runs its original single-einsum program."""
        wh, ww = self.generator.window_size
        m = (np.asarray(mask2d) > 0)[::4, ::4]
        mp = np.pad(m, 3, constant_values=False)
        fh = (mp.shape[0] - 7) // 3 + 1
        fw = (mp.shape[1] - 7) // 3 + 1
        pooled = np.zeros((fh, fw), bool)
        for i in range(fh):
            for j in range(fw):
                pooled[i, j] = mp[3 * i : 3 * i + 7, 3 * j : 3 * j + 7].any()
        nwh, nww = -(-fh // wh), -(-fw // ww)
        padded = np.zeros((nwh * wh, nww * ww), bool)
        padded[:fh, :fw] = pooled
        occ = padded.reshape(nwh, wh, nww, ww).max(axis=(1, 3)).reshape(-1)
        idx = np.nonzero(occ)[0].astype(np.int32)
        if len(idx) == 0 or len(idx) == occ.size:
            return None
        return idx

    def _window_compose(self, params, enc_all, comp_f, comp_b,
                        masks_dilated, updated_masks, rgb_u8, comp, written,
                        sel, pair_ids, valid, safe_neighbor_ids,
                        masked_windows=None):
        """A GROUP of static windows fully on device: batched generator ->
        reference uint8 0.5/0.5 composites applied in window order.

        enc_all [1, T, h, w, C] is the whole-clip per-frame encoding
        (encode once, gather per window — the encoder input is
        window-independent, so valid-slot numerics are unchanged; invalid
        slots were garbage-excluded via frame_valid before and still are).
        sel/valid [NW, L]; pair_ids [NW, n_max-1]; safe_neighbor_ids
        [NW, n_max]. The generator is batch-independent so NW windows share
        one forward (better MXU utilization, NW-fold fewer sequential scan
        steps); the composite loop stays ordered because overlap blending is
        order-dependent. comp/written carry T+1 rows; padded slots (and
        whole dummy pad windows) scatter into the trash row T. Donated and
        threaded through the group loop — the only D2H of the whole stage is
        the final composited video.
        """
        NW, n_max = safe_neighbor_ids.shape
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("data"))
            sel = jax.lax.with_sharding_constraint(sel, shard)
            valid = jax.lax.with_sharding_constraint(valid, shard)
            pair_ids = jax.lax.with_sharding_constraint(pair_ids, shard)
            safe_neighbor_ids = jax.lax.with_sharding_constraint(
                safe_neighbor_ids, shard)
        vmask = valid[:, :, None, None, None].astype(masks_dilated.dtype)
        enc = enc_all[0][sel]                         # [NW, L, h, w, C]
        m = masks_dilated[sel] * vmask
        mu = updated_masks[sel] * vmask
        pair_valid = valid[:, : n_max - 1] & valid[:, 1:n_max]
        pv = pair_valid[:, :, None, None, None].astype(comp_f.dtype)
        sel_flows = (comp_f[pair_ids] * pv, comp_b[pair_ids] * pv)
        pred = self.generator.apply(params, enc, sel_flows, m, mu, n_max,
                                    frame_valid=valid,
                                    masked_windows=masked_windows,
                                    method="forward_encoded")  # [NW, n_max, ...]
        pred_u8 = jnp.clip((pred + 1.0) / 2.0 * 255.0, 0, 255
                           ).astype(jnp.uint8)

        for w in range(NW):
            nvalid = valid[w, :n_max]
            ids = safe_neighbor_ids[w]  # invalid slots point at row T
            cl = jnp.clip(ids, 0, rgb_u8.shape[0] - 1)
            bmask = masks_dilated[cl].astype(jnp.uint8)
            img = pred_u8[w] * bmask + rgb_u8[cl] * (1 - bmask)
            prev = comp[ids]
            wr = written[ids][:, None, None, None]
            blended = (prev.astype(jnp.float32) * 0.5
                       + img.astype(jnp.float32) * 0.5).astype(jnp.uint8)
            comp = comp.at[ids].set(jnp.where(wr, blended, img))
            written = written.at[ids].set(written[ids] | nvalid)
        return comp, written

    def _run_stages(self, rgb, frames_n, flow_masks, masks_dilated,
                    frames_bgr=None, out_rows=None,
                    host_mask2d=None) -> List[np.ndarray]:
        T = len(frames_n)

        # 1) optical flow (fp32)
        flows_f, flows_b = self._compute_flows(frames_n)
        # 2) flow completion
        comp_f, comp_b = self._complete_flows(flows_f, flows_b, flow_masks)
        del flows_f, flows_b, flow_masks  # free raw-flow HBM before the sweep
        # 3) image propagation
        updated_frames, updated_masks = self._propagate_images(
            frames_n, masks_dilated, comp_f, comp_b)
        del frames_n  # the sweep reads rgb/updated_frames, not the fp32 stack

        # 4) windowed transformer + composite
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
        n_max = max(len(ns) for ns, _ in windows)
        r_max = max(len(rs) for _, rs in windows)

        if self.static_windows:
            return self._run_windows_static(
                rgb, masks_dilated, updated_frames, updated_masks,
                comp_f, comp_b, windows, n_max, r_max, T,
                frames_bgr=frames_bgr, out_rows=out_rows,
                host_mask2d=host_mask2d)
        return self._run_windows_dynamic(
            rgb, masks_dilated, updated_frames, updated_masks,
            comp_f, comp_b, windows, T)

    def _run_windows_static(self, rgb, masks_dilated, updated_frames,
                            updated_masks, comp_f, comp_b, windows,
                            n_max, r_max, T, frames_bgr=None,
                            out_rows=None, host_mask2d=None) -> List[np.ndarray]:
        """Device-resident window sweep: one jitted program per clip shape,
        single D2H of the composited clip.

        With ``out_rows`` (the dilated mask's row extent) and the original
        host ``frames_bgr``, only those rows are fetched: outside the dilated
        mask the composite equals the source exactly (pred*mask +
        rgb*(1-mask), and the 0.5/0.5 blend of two identical uint8 values is
        the identity), so the host reassembles full frames from the originals
        — the tunnel D2H runs at ~60 MB/s and the band is mostly unmasked
        rows."""
        rgb_u8 = jnp.asarray(rgb)
        masks_dilated = jnp.asarray(masks_dilated)
        H, W = rgb.shape[1:3]
        # encode every clip frame ONCE (the encoder reads only per-frame
        # inputs); windows gather rows of enc_all below. Frees the fp32
        # frame stack before the sweep — the sweep never touches frames.
        enc_all = self._encode_fn(
            self.gen_params, updated_frames[None], masks_dilated[None],
            updated_masks[None])
        del updated_frames
        comp = jnp.zeros((T + 1, H, W, 3), jnp.uint8)
        written = jnp.zeros((T + 1,), bool)
        def window_arrays(neighbor_ids, ref_ids):
            n_pad = n_max - len(neighbor_ids)
            r_pad = r_max - len(ref_ids)
            sel = np.asarray(neighbor_ids + [neighbor_ids[-1]] * n_pad
                             + ref_ids + [0] * r_pad, np.int32)
            valid = np.zeros((len(sel),), bool)
            valid[: len(neighbor_ids)] = True
            valid[n_max : n_max + len(ref_ids)] = True
            pair_ids = np.asarray(
                neighbor_ids[:-1]
                + [neighbor_ids[-1] - 1] * n_pad, np.int32)[: n_max - 1]
            safe_ids = np.asarray(
                neighbor_ids + [T] * n_pad, np.int32)  # pads -> trash row
            return sel, valid, pair_ids, safe_ids

        # static window-skip set (frame-constant masks only — inpaint() and
        # outpaint() both qualify; VSR_PP_NO_WINDOW_SKIP=1 forces the dense
        # A/B path)
        import os as _os

        mw = None
        if host_mask2d is not None and _os.environ.get(
                "VSR_PP_NO_WINDOW_SKIP") != "1":
            mw = self._masked_window_set(host_mask2d)
        mw_dev = None if mw is None else jnp.asarray(mw)

        # WB windows share one batched generator call; the group tail pads
        # with dummy all-invalid windows (every row -> trash row T)
        WB = max(1, int(getattr(self.config, "propainter_window_batch", 2)))
        if self.mesh is not None:
            # one window-batch shard per data-axis device (dummies pad the
            # tail; an all-invalid window writes only the trash row T)
            n_dev = self.mesh.shape["data"]
            WB = max(WB, math.ceil(len(windows) / n_dev))
            WB = math.ceil(WB / n_dev) * n_dev
        dummy = (np.zeros(n_max + r_max, np.int32),
                 np.zeros(n_max + r_max, bool),
                 np.zeros(n_max - 1, np.int32),
                 np.full(n_max, T, np.int32))
        for g in range(0, len(windows), WB):
            group = [window_arrays(*w) for w in windows[g : g + WB]]
            group += [dummy] * (WB - len(group))
            sel, valid, pair_ids, safe_ids = (
                np.stack([gr[i] for gr in group]) for i in range(4))
            comp, written = self._window_compose_fn(
                self.gen_params, enc_all, comp_f, comp_b,
                masks_dilated, updated_masks, rgb_u8, comp, written,
                jnp.asarray(sel), jnp.asarray(pair_ids), jnp.asarray(valid),
                jnp.asarray(safe_ids), mw_dev)
        if out_rows is not None and frames_bgr is not None:
            r0, r1 = out_rows
            rows = np.asarray(comp[:T, r0:r1])  # the stage's single D2H
            res = []
            for j in range(T):
                f = frames_bgr[j].copy()
                f[r0:r1] = rows[j][..., ::-1]
                res.append(f)
            return res
        out = np.asarray(comp[:T])  # the stage's single D2H
        return [f for f in out[..., ::-1]]  # RGB->BGR

    def _run_windows_dynamic(self, rgb, masks_dilated, updated_frames,
                             updated_masks, comp_f, comp_b, windows,
                             T) -> List[np.ndarray]:
        """Ragged reference scheduling (VSR_PP_DYNAMIC_WINDOWS=1, A/B debug):
        host-driven, one compile per distinct window shape."""
        rgb = np.asarray(rgb)
        masks_dilated = np.asarray(masks_dilated)
        updated_frames = np.asarray(updated_frames)
        updated_masks = np.asarray(updated_masks)
        comp_f = np.asarray(comp_f)
        comp_b = np.asarray(comp_b)
        comp_frames: List[Optional[np.ndarray]] = [None] * T
        for neighbor_ids, ref_ids in windows:
            sel_arr = np.asarray(neighbor_ids + ref_ids)
            sel_masks = masks_dilated[sel_arr]
            sel_upd = updated_masks[sel_arr]
            flows_f_sel = comp_f[np.asarray(neighbor_ids[:-1])]
            flows_b_sel = comp_b[np.asarray(neighbor_ids[:-1])]
            l_t = len(neighbor_ids)
            sel_flows = (jnp.asarray(flows_f_sel[None]),
                         jnp.asarray(flows_b_sel[None]))
            pred = self._gen_fn(
                self.gen_params,
                jnp.asarray(updated_frames[sel_arr][None]),
                sel_flows,
                jnp.asarray(sel_masks[None]),
                jnp.asarray(sel_upd[None]),
                l_t,
                None,
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
        shared by inpaint() (both = dilated subtitle mask) and outpaint().

        One uint8 H2D for the clip; normalization and the T-fold mask
        broadcast happen on device (the fp32 frame stack alone is 4x the
        uint8 bytes — never ship it over the tunnel)."""
        T = len(frames_bgr)
        rgb = np.stack([f[..., ::-1] for f in frames_bgr])
        rgb_dev = jnp.asarray(rgb)
        # build the fp32 stack and masks inline (no local bindings) so
        # _run_stages' dels actually release their HBM before the sweep
        return self._run_stages(
            rgb_dev,
            rgb_dev.astype(jnp.float32) / 255.0 * 2.0 - 1.0,
            jnp.broadcast_to(
                jnp.asarray(flow_mask, jnp.float32)[None, :, :, None],
                (T, *flow_mask.shape, 1)),
            jnp.broadcast_to(
                jnp.asarray(mask_dilated, jnp.float32)[None, :, :, None],
                (T, *mask_dilated.shape, 1)),
            frames_bgr=frames_bgr,
            out_rows=self._mask_rows(mask_dilated),
            host_mask2d=mask_dilated)

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
