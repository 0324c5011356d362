"""ProPainter inpainting generator in flax.

Capability parity with backend/inpaint/video/model/propainter.py:259-378 and
modules/sparse_transformer.py: grouped-skip encoder, dual bidirectional
propagation (parameter-free image-level warp with flow-consistency gating;
learnable feature-level with deformable alignment), SoftSplit/SoftComp
tokenization (unfold k7 s3 p3 + linear), 8 temporal sparse window transformer
blocks (window (5,9), 4 heads, hidden 512, pooled global tokens, temporal
dilation 2), and a conv decoder.

TPU-first redesign of the data-dependent parts:
* The reference's SparseWindowAttention walks masked/unmasked windows with
  python indexing per batch item (sparse_transformer.py:230-269) — shapes
  depend on the mask. Here BOTH branches are computed dense for every window
  and the result is selected per window with `where`; the mask only steers
  selection, never shapes. A scalar-prefetch Pallas kernel that skips clean
  windows is the planned optimization.
* The sequential propagation loops run as nn.scan over time.
* Rolled-key sets use static precomputed index vectors (the reference's
  valid_ind_rolled buffer).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from vsr_tpu.ops.deform_conv import modulated_deform_conv
from vsr_tpu.ops.grid_sample import flow_warp
from vsr_tpu.ops.unfold import fold, fold_normalizer, unfold, unfold_output_size
from vsr_tpu.ops.upsample import upsample_bilinear_2x_align_corners

_PAD1 = ((1, 1), (1, 1))


def _lrelu(x, s=0.2):
    return nn.leaky_relu(x, negative_slope=s)


def _conv(f, k=3, s=1, pad=1, groups=1, dtype=jnp.float32, name=None):
    return nn.Conv(f, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)),
                   feature_group_count=groups, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


def length_sq(x):
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def fb_consistency_check(flow_fw, flow_bw, alpha1=0.01, alpha2=0.5):
    """Forward-backward flow agreement -> validity in {0,1}
    (propainter.py:24-33). Flows are [B, H, W, 2]."""
    flow_bw_warped = flow_warp(flow_bw, flow_fw)
    flow_diff_fw = flow_fw + flow_bw_warped
    mag_sq_fw = length_sq(flow_fw) + length_sq(flow_bw_warped)
    occ_thresh_fw = alpha1 * mag_sq_fw + alpha2
    return (length_sq(flow_diff_fw) < occ_thresh_fw).astype(flow_fw.dtype)


def binary_mask(mask, th=0.1):
    return (mask > th).astype(mask.dtype)


# ---------------------------------------------------------------- encoder

class ProPainterEncoder(nn.Module):
    """Conv encoder with grouped skip concats (propainter.py:196-235).

    Production widths (channel=128): 64-64-128-256-384 then grouped convs
    512(g2)/384(g4)/256(g8)/128(g1) over interleaved skip concats. ``channel``
    scales every width proportionally so tests can shrink the net.
    """

    channel: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [N, H, W, 5] -> [N, H/4, W/4, channel]."""
        N = x.shape[0]
        m = self.channel / 128.0
        wdt = lambda base: max(8, int(base * m))
        out = _lrelu(_conv(wdt(64), s=2, dtype=self.dtype, name="c0")(x))
        out = _lrelu(_conv(wdt(64), dtype=self.dtype, name="c1")(out))
        out = _lrelu(_conv(wdt(128), s=2, dtype=self.dtype, name="c2")(out))
        out = _lrelu(_conv(wdt(256), dtype=self.dtype, name="c3")(out))
        x0 = out  # skip, interleaved into later grouped convs
        out = _lrelu(_conv(wdt(384), dtype=self.dtype, name="c4")(x0))
        h, w = x0.shape[1:3]

        def group_cat(skip, feat, g):
            s = skip.reshape(N, h, w, g, -1)
            f = feat.reshape(N, h, w, g, -1)
            return jnp.concatenate([s, f], axis=-1).reshape(N, h, w, -1)

        out = _lrelu(_conv(wdt(512), groups=2, dtype=self.dtype, name="c5")(
            group_cat(x0, out, 2)))
        out = _lrelu(_conv(wdt(384), groups=4, dtype=self.dtype, name="c6")(
            group_cat(x0, out, 4)))
        out = _lrelu(_conv(wdt(256), groups=8, dtype=self.dtype, name="c7")(
            group_cat(x0, out, 8)))
        out = _lrelu(_conv(self.channel, groups=1, dtype=self.dtype, name="c8")(
            group_cat(x0, out, 1)))
        return out


# ------------------------------------------------- image-level propagation

def image_propagation_sweep(
    frames: jnp.ndarray,      # [B, T, H, W, 3]
    masks: jnp.ndarray,       # [B, T, H, W, 1]
    flows_prop: jnp.ndarray,  # [B, T-1, H, W, 2] flows used for warping
    flows_check: jnp.ndarray,
    reverse: bool,
    interpolation: str = "nearest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One direction of the parameter-free image propagation
    (propainter.py:140-173, learnable=False branch). Pure ops -> lax.scan."""
    B, T = frames.shape[:2]
    if reverse:
        seq_f = frames[:, ::-1].transpose(1, 0, 2, 3, 4)
        seq_m = masks[:, ::-1].transpose(1, 0, 2, 3, 4)
        # backward sweep at step i warps with flows_forward[idx], idx = T-1-i
        seq_fp = flows_prop[:, ::-1].transpose(1, 0, 2, 3, 4)
        seq_fc = flows_check[:, ::-1].transpose(1, 0, 2, 3, 4)
    else:
        seq_f = frames.transpose(1, 0, 2, 3, 4)
        seq_m = masks.transpose(1, 0, 2, 3, 4)
        seq_fp = flows_prop.transpose(1, 0, 2, 3, 4)
        seq_fc = flows_check.transpose(1, 0, 2, 3, 4)
    # align flows with steps 1..T-1 (step 0 unused)
    pad_flow = jnp.zeros_like(seq_fp[:1])
    seq_fp = jnp.concatenate([pad_flow, seq_fp], axis=0)
    seq_fc = jnp.concatenate([pad_flow, seq_fc], axis=0)

    def body(carry, xs):
        feat_prop, mask_prop, step = carry
        feat_current, mask_current, flow_prop, flow_check = xs
        valid = fb_consistency_check(flow_prop, flow_check)
        feat_warped = flow_warp(feat_prop, flow_prop, interpolation)
        mask_prop_valid = binary_mask(flow_warp(mask_prop, flow_prop))
        union = binary_mask(mask_current * valid * (1 - mask_prop_valid))
        feat_new = union * feat_warped + (1 - union) * feat_current
        mask_new = binary_mask(
            mask_current * (1 - valid * (1 - mask_prop_valid)))
        first = step == 0
        feat_prop = jnp.where(first, feat_current, feat_new)
        mask_prop = jnp.where(first, mask_current, mask_new)
        return (feat_prop, mask_prop, step + 1), (feat_prop, mask_prop)

    init = (jnp.zeros_like(seq_f[0]), jnp.zeros_like(seq_m[0]),
            jnp.zeros((), jnp.int32))
    _, (feats, masks_out) = jax.lax.scan(
        body, init, (seq_f, seq_m, seq_fp, seq_fc))
    feats = feats.transpose(1, 0, 2, 3, 4)
    masks_out = masks_out.transpose(1, 0, 2, 3, 4)
    if reverse:
        feats = feats[:, ::-1]
        masks_out = masks_out[:, ::-1]
    return feats, masks_out


def image_propagation(frames, masks, flows_f, flows_b, interpolation="nearest"):
    """Bidirectional image propagation (propainter.py:316-319): backward sweep
    over the inputs, then forward sweep over the backward results."""
    feats_b, masks_b = image_propagation_sweep(
        frames, masks, flows_f, flows_b, reverse=True,
        interpolation=interpolation)
    feats_f, masks_f = image_propagation_sweep(
        feats_b, masks_b, flows_b, flows_f, reverse=False,
        interpolation=interpolation)
    return feats_f, masks_f


# ------------------------------------------------ feature-level propagation

class DeformableAlignment(nn.Module):
    """Flow-guided first-order deformable alignment (propainter.py:36-72)."""

    channels: int = 128
    deform_groups: int = 16
    max_residue_magnitude: float = 3.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, flow):
        c, G = self.channels, self.deform_groups
        feat = cond
        for i in range(3):
            feat = _lrelu(_conv(c, dtype=self.dtype, name=f"off{i}")(feat), 0.1)
        out = _conv(27 * G, dtype=self.dtype, name="off3")(feat)
        B, H, W, _ = out.shape
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        offset = offset.reshape(B, H, W, G, 9, 2)
        # add flow per tap as (dy, dx) (flow is (x, y): flip)
        center = flow[..., ::-1]
        offset = offset + center[:, :, :, None, None, :]
        modulation = nn.sigmoid(mask).reshape(B, H, W, G, 9)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # offsets are center (flow) + tanh-bounded residual: the patch path
        # gathers one window per position instead of per (group, tap)
        return modulated_deform_conv(
            x, offset, modulation, kernel.astype(self.dtype),
            bias.astype(self.dtype), center=center,
            residual_bound=self.max_residue_magnitude)


class _FeatSweepStep(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop, step = carry  # step: [B] per-window step counter
        feat_current, mask_current, flow_prop, flow_check, step_valid = xs
        valid = fb_consistency_check(flow_prop, flow_check)
        feat_warped = flow_warp(feat_prop, flow_prop)
        cond = jnp.concatenate(
            [feat_current, feat_warped, flow_prop, valid, mask_current], axis=-1)
        aligned = DeformableAlignment(
            self.channels, dtype=self.dtype, name="align")(
                feat_prop, cond, flow_prop)
        bcast = lambda v: v[:, None, None, None]
        new_prop = jnp.where(bcast(step > 0), aligned, feat_current)
        feat = jnp.concatenate([feat_current, new_prop, mask_current], axis=-1)
        y = _lrelu(_conv(self.channels, dtype=self.dtype, name="bb0")(feat))
        y = _conv(self.channels, dtype=self.dtype, name="bb1")(y)
        new_prop = new_prop + y
        # padded (invalid) steps pass the carry through untouched so they
        # neither pollute the recurrent state nor advance the step counter
        feat_prop_next = jnp.where(bcast(step_valid), new_prop, feat_prop)
        step_next = step + step_valid.astype(step.dtype)
        return (feat_prop_next, step_next), new_prop


class FeaturePropagation(nn.Module):
    """Learnable bidirectional feature propagation (propainter.py:75-193,
    learnable=True). Backward sweep reads encoder features; forward sweep
    reads the backward results; fusion is residual."""

    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, flows_f, flows_b, masks, frame_valid=None):
        """x [B, T, H, W, C]; flows_* [B, T-1, H, W, 2];
        masks [B, T, H, W, 2] (mask_in, mask_updated) — the full 2-channel
        mask feeds the alignment cond, the backbone AND the fuse (ref
        propainter.py:46,90,154,168,186). frame_valid: [B, T] (or [T]) bool —
        padded frames pass that window's recurrent state through untouched
        (per-batch: batched windows pad independently)."""
        B, T, H, W, C = x.shape
        mask_current = masks
        if frame_valid is None:
            frame_valid = jnp.ones((B, T), bool)
        elif frame_valid.ndim == 1:
            frame_valid = jnp.broadcast_to(frame_valid[None], (B, T))

        def run(name, seq_x, seq_m, flows_prop, flows_check, reverse):
            scan = nn.scan(
                _FeatSweepStep,
                variable_broadcast="params", split_rngs={"params": False},
                in_axes=0, out_axes=0,
            )(self.channels, self.dtype, name=name)
            fv = frame_valid
            if reverse:
                seq_x = seq_x[:, ::-1]
                seq_m = seq_m[:, ::-1]
                flows_prop = flows_prop[:, ::-1]
                flows_check = flows_check[:, ::-1]
                fv = fv[:, ::-1]
            sx = seq_x.transpose(1, 0, 2, 3, 4)
            sm = seq_m.transpose(1, 0, 2, 3, 4)
            fp = flows_prop.transpose(1, 0, 2, 3, 4)
            fc = flows_check.transpose(1, 0, 2, 3, 4)
            fv = fv.transpose(1, 0)  # [T, B]
            pad = jnp.zeros_like(fp[:1])
            fp = jnp.concatenate([pad, fp], axis=0)
            fc = jnp.concatenate([pad, fc], axis=0)
            init = (jnp.zeros((B, H, W, C), x.dtype),
                    jnp.zeros((B,), jnp.int32))
            _, out = scan(init, (sx, sm, fp, fc, fv))
            out = out.transpose(1, 0, 2, 3, 4)
            return out[:, ::-1] if reverse else out

        feats_b = run("backward", x, mask_current, flows_f, flows_b, True)
        feats_f = run("forward", feats_b, mask_current, flows_b, flows_f, False)

        fused_in = jnp.concatenate(
            [feats_b, feats_f, masks], axis=-1).reshape(B * T, H, W, -1)
        y = _lrelu(_conv(self.channels, dtype=self.dtype, name="fuse0")(fused_in))
        y = _conv(self.channels, dtype=self.dtype, name="fuse1")(y)
        return y.reshape(B, T, H, W, C) + x


# ------------------------------------------------------ token split / comp

class SoftSplit(nn.Module):
    hidden: int = 512
    kernel: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [N, H, W, C] -> tokens [N, fh, fw, hidden]."""
        patches = unfold(x, self.kernel, self.stride, self.padding)
        return nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                        name="embedding")(patches)


class SoftComp(nn.Module):
    channel: int = 128
    kernel: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
        """tokens [N, fh, fw, hidden] -> [N, H, W, C] (overlap-add fold)."""
        c_out = self.kernel[0] * self.kernel[1] * self.channel
        feat = nn.Dense(c_out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="embedding")(tokens)
        img = fold(feat, out_hw, self.kernel, self.stride, self.padding)
        return _conv(self.channel, dtype=self.dtype, name="bias_conv")(img)


class FusionFeedForward(nn.Module):
    dim: int = 512
    hidden_dim: int = 1960
    kernel: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (3, 3)
    padding: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
        """x [B, T, fh, fw, dim]; fold/renormalize/unfold round trip over the
        token grid (sparse_transformer.py:74-101)."""
        B, T, fh, fw, _ = x.shape
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        c = self.hidden_dim // (self.kernel[0] * self.kernel[1])
        flat = x.reshape(B * T, fh, fw, self.hidden_dim)
        img = fold(flat, out_hw, self.kernel, self.stride, self.padding)
        norm = fold_normalizer(out_hw, self.kernel, self.stride, self.padding,
                               fh, fw, img.dtype)
        img = img / jnp.maximum(norm, 1e-9)
        tokens = unfold(img, self.kernel, self.stride, self.padding)
        tokens = tokens.reshape(B, T, fh, fw, self.hidden_dim)
        tokens = nn.gelu(tokens, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(tokens)


# -------------------------------------------------- sparse window attention

def _rolled_valid_indices(window_size: Tuple[int, int]) -> np.ndarray:
    """Static valid_ind_rolled buffer (sparse_transformer.py:142-153)."""
    wh, ww = window_size
    eh, ew = (wh + 1) // 2, (ww + 1) // 2
    masks = []
    for tl_h, tl_w in ((0, 0), (0, 1), (1, 0), (1, 1)):
        m = np.ones((wh, ww), np.int64)
        hs = slice(eh, None) if tl_h else slice(None, -eh)
        ws = slice(ew, None) if tl_w else slice(None, -ew)
        m[hs, ws] = 0
        masks.append(m)
    flat = np.stack(masks, 0).reshape(-1)
    return np.nonzero(flat)[0].astype(np.int32)


def _window_partition(x: jnp.ndarray, window: Tuple[int, int], n_head: int):
    """[B, T, H, W, C] -> [B, nW, head, T, wh*ww, c_head]."""
    B, T, H, W, C = x.shape
    wh, ww = window
    nwh, nww = H // wh, W // ww
    ch = C // n_head
    x = x.reshape(B, T, nwh, wh, nww, ww, n_head, ch)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # B nwh nww head T wh ww ch
    return x.reshape(B, nwh * nww, n_head, T, wh * ww, ch)


class SparseWindowAttention(nn.Module):
    dim: int = 512
    n_head: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, t_ind: Optional[np.ndarray] = None,
                 frame_valid: Optional[jnp.ndarray] = None,
                 masked_windows: Optional[jnp.ndarray] = None):
        """x [B, T, H, W, C]; mask [B, lt, H, W, 1]; t_ind: static frame
        subset for temporal-dilated keys; frame_valid: [B, T] bool — invalid
        (padded) frames are removed from the masked branch's key set (their
        own outputs are garbage and discarded by the caller).

        masked_windows: optional [nM] window indices — the WINDOW-SKIP path
        (the optimization the round-4 header called "planned"): the expensive
        masked branch (full spatio-temporal attention over T x (win + rolled
        + pooled) keys, ~99% of attention FLOPs) runs only for these windows
        and scatters into the cheap spatial branch's output. For the video
        band path the mask is constant per band, so the wrapper computes the
        hole-bearing window set ON HOST (inpaint/propainter.py) — an XLA
        static-shape gather, no Pallas needed (and none of this build's
        Mosaic lowering hazards). Must equal the occupancy test below for
        every window whose output is kept; pinned by
        tests/test_propainter.py::test_window_skip_matches_dense.
        Returns [B, T, H, W, C]."""
        B, T, H, W, C = x.shape
        wh, ww = self.window_size
        head, ch = self.n_head, C // self.n_head
        nwh = math.ceil(H / wh)
        nww = math.ceil(W / ww)
        pad_b, pad_r = nwh * wh - H, nww * ww - W
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = nwh * wh, nww * ww
        nW = nwh * nww
        S = wh * ww

        dense = lambda name: nn.Dense(self.dim, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        query_layer, key_layer, value_layer = (
            dense("query"), dense("key"), dense("value"))
        q = query_layer(x)
        k = key_layer(x)
        v = value_layer(x)

        win_q = _window_partition(q, self.window_size, head)
        win_k = _window_partition(k, self.window_size, head)
        win_v = _window_partition(v, self.window_size, head)

        # rolled keys/values from the 4 diagonal shifts
        eh, ew = (wh + 1) // 2, (ww + 1) // 2
        valid_idx = jnp.asarray(_rolled_valid_indices(self.window_size))
        rolled_k, rolled_v = [], []
        for sh, sw in ((-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)):
            rk = jnp.roll(k, (sh, sw), axis=(2, 3))
            rv = jnp.roll(v, (sh, sw), axis=(2, 3))
            rolled_k.append(_window_partition(rk, self.window_size, head))
            rolled_v.append(_window_partition(rv, self.window_size, head))
        roll_k = jnp.concatenate(rolled_k, axis=4)[:, :, :, :, valid_idx]
        roll_v = jnp.concatenate(rolled_v, axis=4)[:, :, :, :, valid_idx]

        keys = jnp.concatenate([win_k, roll_k], axis=4)
        vals = jnp.concatenate([win_v, roll_v], axis=4)

        # pooled global tokens: learned depthwise pool initialized to average
        ph_k, pw_k = self.pool_size
        pool_w = self.param(
            "pool_kernel",
            lambda rng, shape, dt: jnp.full(shape, 1.0 / (ph_k * pw_k), dt),
            (ph_k, pw_k, 1, C), jnp.float32)
        pool_b = self.param("pool_bias", nn.initializers.zeros, (C,), jnp.float32)
        flat_x = x.reshape(B * T, Hp, Wp, C)
        pooled = jax.lax.conv_general_dilated(
            flat_x.astype(self.dtype), pool_w.astype(self.dtype),
            window_strides=(ph_k, pw_k), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + pool_b.astype(self.dtype)
        ph, pw = pooled.shape[1:3]
        pooled = pooled.reshape(B, T, ph, pw, C)
        # reuse the SAME key/value projections on pooled tokens (ref :213-218)
        pool_k = key_layer(pooled)
        pool_v = value_layer(pooled)
        pk = pool_k.reshape(B, 1, T, ph * pw, head, ch).transpose(0, 1, 4, 2, 3, 5)
        pv = pool_v.reshape(B, 1, T, ph * pw, head, ch).transpose(0, 1, 4, 2, 3, 5)
        pk = jnp.broadcast_to(pk, (B, nW, head, T, ph * pw, ch))
        pv = jnp.broadcast_to(pv, (B, nW, head, T, ph * pw, ch))
        keys = jnp.concatenate([keys, pk], axis=4)
        vals = jnp.concatenate([vals, pv], axis=4)

        # ---- masked-window branch: full spatio-temporal attention ----
        if t_ind is not None:
            keys_t = keys[:, :, :, jnp.asarray(t_ind)]
            vals_t = vals[:, :, :, jnp.asarray(t_ind)]
            valid_t = (frame_valid[:, jnp.asarray(t_ind)]
                       if frame_valid is not None else None)
        else:
            keys_t = keys
            vals_t = vals
            valid_t = frame_valid
        if masked_windows is not None:  # window-skip: nM of nW windows
            keys_t = keys_t[:, masked_windows]
            vals_t = vals_t[:, masked_windows]
            q_m = win_q[:, masked_windows]
        else:
            q_m = win_q
        nM = keys_t.shape[1]
        n_tok_per_frame = keys_t.shape[4]
        Nk = keys_t.shape[3] * n_tok_per_frame
        kt = keys_t.reshape(B, nM, head, Nk, ch)
        vt = vals_t.reshape(B, nM, head, Nk, ch)
        qt = q_m.reshape(B, nM, head, T * S, ch)
        att = jnp.einsum("bwhnc,bwhmc->bwhnm", qt, kt,
                         preferred_element_type=jnp.float32) / math.sqrt(ch)
        if valid_t is not None:
            key_bias = jnp.where(
                jnp.repeat(valid_t, n_tok_per_frame, axis=1), 0.0, -1e9)
            att = att + key_bias[:, None, None, None, :]
        att = jax.nn.softmax(att, axis=-1).astype(vt.dtype)
        out_masked = jnp.einsum("bwhnm,bwhmc->bwhnc", att, vt,
                                preferred_element_type=jnp.float32)
        out_masked = out_masked.reshape(B, nM, head, T, S, ch)

        # ---- unmasked-window branch: per-frame spatial attention ----
        att_s = jnp.einsum("bwhtsc,bwhtuc->bwhtsu", win_q, win_k,
                           preferred_element_type=jnp.float32) / math.sqrt(ch)
        att_s = jax.nn.softmax(att_s, axis=-1).astype(win_v.dtype)
        out_spatial = jnp.einsum("bwhtsu,bwhtuc->bwhtsc", att_s, win_v,
                                 preferred_element_type=jnp.float32)

        if masked_windows is not None:
            # scatter the masked-branch outputs over the spatial baseline;
            # equals the dense `where` whenever masked_windows matches the
            # occupancy test for every kept output (the band mask is
            # frame-constant, so it does — dummy all-invalid pad windows are
            # the only divergence and their outputs land in the trash row)
            out = (out_spatial.astype(self.dtype)
                   .at[:, masked_windows].set(out_masked.astype(self.dtype)))
        else:
            # ---- per-window selection by mask occupancy (ref :227-269) ----
            lt = mask.shape[1]
            mwin = mask[..., 0].reshape(B, lt, nwh, wh, nww, ww)
            occupancy = mwin.max(axis=(3, 5)).sum(axis=1).reshape(B, nW)
            is_masked = occupancy > 0
            out = jnp.where(is_masked[:, :, None, None, None, None],
                            out_masked, out_spatial).astype(self.dtype)

        # inverse partition
        out = out.reshape(B, nwh, nww, head, T, wh, ww, ch)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(B, T, Hp, Wp, C)
        if pad_b or pad_r:
            out = out[:, :, :H, :W]
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class TemporalSparseTransformer(nn.Module):
    dim: int = 512
    n_head: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold_hw, mask, t_ind=None, frame_valid=None,
                 masked_windows=None):
        B, T, fh, fw, C = x.shape
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        att = SparseWindowAttention(
            self.dim, self.n_head, self.window_size, self.pool_size,
            self.dtype, name="attention")(y, mask, t_ind, frame_valid,
                                          masked_windows)
        x = shortcut + att
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        x = x + FusionFeedForward(self.dim, dtype=self.dtype,
                                  name="mlp")(y, fold_hw)
        return x


# ------------------------------------------------------------- generator

class ProPainterGenerator(nn.Module):
    channel: int = 128
    hidden: int = 512
    depths: int = 8
    n_head: int = 4
    window_size: Tuple[int, int] = (5, 9)
    pool_size: Tuple[int, int] = (4, 4)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ProPainterEncoder(self.channel, self.dtype)
        self.ss = SoftSplit(self.hidden, dtype=self.dtype)
        self.sc = SoftComp(self.channel, dtype=self.dtype)
        self.feat_prop_module = FeaturePropagation(self.channel, self.dtype)
        self.transformers = [
            TemporalSparseTransformer(
                self.hidden, self.n_head, self.window_size, self.pool_size,
                self.dtype, name=f"block{i}")
            for i in range(self.depths)
        ]
        self.dec_deconv0 = _conv(128, dtype=self.dtype, name="dec_deconv0")
        self.dec_conv1 = _conv(64, dtype=self.dtype, name="dec_conv1")
        self.dec_deconv1 = _conv(64, dtype=self.dtype, name="dec_deconv1")
        self.dec_conv2 = _conv(3, dtype=self.dtype, name="dec_conv2")

    def img_propagation(self, masked_frames, flows_f, flows_b, masks,
                        interpolation="nearest"):
        return image_propagation(masked_frames, masks, flows_f, flows_b,
                                 interpolation)

    def decode(self, feat: jnp.ndarray) -> jnp.ndarray:
        x = upsample_bilinear_2x_align_corners(feat)
        x = _lrelu(self.dec_deconv0(x))
        x = _lrelu(self.dec_conv1(x))
        x = upsample_bilinear_2x_align_corners(x)
        x = _lrelu(self.dec_deconv1(x))
        return jnp.tanh(self.dec_conv2(x))

    def encode(self, masked_frames, masks_in, masks_updated):
        """Per-frame conv encoding, window-independent: [B, T, H, W, 3+1+1]
        -> [B, T, H/4, W/4, channel]. Split out of __call__ so the window
        sweep can encode each clip frame ONCE and gather encodings per
        window (the reference re-encodes every window's frame set,
        propainter.py:337 within the :327-358 loop)."""
        B, T, H, W, _ = masked_frames.shape
        x = jnp.concatenate([masked_frames, masks_in, masks_updated], axis=-1)
        enc = self.encoder(x.reshape(B * T, H, W, 5).astype(self.dtype))
        h, w = enc.shape[1:3]
        return enc.reshape(B, T, h, w, self.channel)

    def __call__(self, masked_frames, completed_flows, masks_in, masks_updated,
                 num_local_frames: int, t_dilation: int = 2,
                 frame_valid=None):
        """All video tensors are NHWC time-major:
        masked_frames [B, T, H, W, 3] in [-1, 1]; completed_flows
        ([B, lt-1, H, W, 2] x2); masks_* [B, T, H, W, 1].
        frame_valid: optional [B, T] bool marking padded slots (static-shape
        window scheduling): invalid frames are excluded from attention keys
        and pass propagation state through; their outputs are garbage the
        caller discards. Returns inpainted local frames [B, lt, H, W, 3].
        """
        enc = self.encode(masked_frames, masks_in, masks_updated)
        return self.forward_encoded(enc, completed_flows, masks_in,
                                    masks_updated, num_local_frames,
                                    t_dilation, frame_valid)

    def forward_encoded(self, enc, completed_flows, masks_in, masks_updated,
                        num_local_frames: int, t_dilation: int = 2,
                        frame_valid=None, masked_windows=None):
        """Post-encoder forward: enc [B, T, h, w, channel] from encode().
        Numerically identical to __call__ given matching inputs — the
        encoder is the only stage that reads the frames themselves.
        masked_windows: optional static hole-bearing window set for the
        attention window-skip (see SparseWindowAttention)."""
        l_t = num_local_frames
        B, T, H, W, _ = masks_in.shape
        h, w = enc.shape[2:4]
        local_feat, ref_feat = enc[:, :l_t], enc[:, l_t:]

        # 1/4-scale flows. torch F.interpolate(bilinear, align_corners=False,
        # antialias=False) samples src = 4*i + 1.5 per axis — the mean of taps
        # 1 and 2 in each 4-block. (jax.image.resize antialiases on
        # downsample and does NOT match; caught by
        # tests/test_activation_parity.py::TestProPainterGeneratorParity.)
        flows_f, flows_b = completed_flows

        def ds(f):
            a = (f[:, :, 1::4] + f[:, :, 2::4]) * 0.5
            return (a[:, :, :, 1::4] + a[:, :, :, 2::4]) * 0.5 / 4.0
        ds_flows_f = ds(flows_f).astype(self.dtype)
        ds_flows_b = ds(flows_b).astype(self.dtype)
        ds_mask_in = masks_in[:, :, ::4, ::4]
        ds_mask_updated_local = masks_updated[:, :l_t, ::4, ::4]
        ds_mask_in_local = ds_mask_in[:, :l_t]

        # window-max-pooled mask tokens for the transformer (k7 s3 p3 maxpool)
        mp_in = jnp.pad(
            ds_mask_in_local.reshape(B * l_t, h, w, 1),
            ((0, 0), (3, 3), (3, 3), (0, 0)), constant_values=-jnp.inf)
        mask_pool = jax.lax.reduce_window(
            mp_in, -jnp.inf, jax.lax.max, (1, 7, 7, 1), (1, 3, 3, 1), "VALID")
        fh, fw = mask_pool.shape[1:3]
        mask_pool = mask_pool.reshape(B, l_t, fh, fw, 1).astype(self.dtype)

        prop_mask = jnp.concatenate(
            [ds_mask_in_local, ds_mask_updated_local], axis=-1).astype(self.dtype)
        local_valid = frame_valid[:, :l_t] if frame_valid is not None else None
        local_feat = self.feat_prop_module(
            local_feat, ds_flows_f, ds_flows_b, prop_mask,
            frame_valid=local_valid)
        enc = jnp.concatenate([local_feat, ref_feat], axis=1)

        tokens = self.ss(enc.reshape(B * T, h, w, self.channel))
        tokens = tokens.reshape(B, T, fh, fw, self.hidden)

        t_inds = [np.arange(i, T, t_dilation) for i in range(t_dilation)]
        for i, block in enumerate(self.transformers):
            tokens = block(tokens, (h, w), mask_pool,
                           t_inds[i % t_dilation], frame_valid,
                           masked_windows)

        # soft-comp only the local tokens: the decoder consumes enc[:, :l_t]
        # alone, so sc on reference-frame tokens is dead compute (the
        # reference computes it too, propainter.py:178-180, then discards it)
        comp = self.sc(tokens[:, :l_t].reshape(B * l_t, fh, fw, self.hidden),
                       (h, w))
        local = (enc[:, :l_t] + comp.reshape(B, l_t, h, w, self.channel)
                 ).reshape(B * l_t, h, w, self.channel)
        out = self.decode(local)
        return out.reshape(B, l_t, H, W, 3).astype(jnp.float32)
