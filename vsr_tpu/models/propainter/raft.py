"""RAFT optical flow (things checkpoint config) in flax.

Capability parity with the reference RAFT stack (backend/inpaint/video/raft/
raft.py:24-146, extractor.py, corr.py, update.py): BasicEncoder feature/
context networks, 4-level all-pairs correlation pyramid with radius-4 lookup,
SepConvGRU iterative updates, convex-upsampled 8x flow.

TPU-first notes:
* the GRU iteration runs as lax.scan with a static iteration count — one
  compiled loop body instead of 20 python steps;
* correlation lookup is the gather-based grid sampler over a [B*h1*w1, ...]
  folded batch (the corr volume's natural layout);
* the full corr volume is an MXU matmul [B, h1*w1, C] x [B, C, h2*w2];
  at RAFT's 1/8 resolution this fits VMEM-friendly tiles.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


from vsr_tpu.ops.upsample import upsample_bilinear_align_corners

_PAD1 = ((1, 1), (1, 1))


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d
    affine=False)."""
    mean = x.mean(axis=(-3, -2), keepdims=True)
    var = x.var(axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class _Norm(nn.Module):
    kind: str  # "instance" | "batch" | "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name="bn")(x)
        return x


class _ResidualBlock(nn.Module):
    planes: int
    norm: str
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), strides=(s, s), padding=_PAD1, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        y = nn.relu(_Norm(self.norm, self.dtype, name="norm1")(
            conv(self.planes, self.stride, "conv1")(x), train))
        y = nn.relu(_Norm(self.norm, self.dtype, name="norm2")(
            conv(self.planes, 1, "conv2")(y), train))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _Norm(self.norm, self.dtype, name="norm3")(
                nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="down")(x), train)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 256
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(_Norm(self.norm, self.dtype, name="norm1")(x, train))
        for i, (planes, stride) in enumerate([(64, 1), (64, 1), (96, 2),
                                              (96, 1), (128, 2), (128, 1)]):
            x = _ResidualBlock(planes, self.norm, stride, self.dtype,
                               name=f"layer{i}")(x, train)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv2")(x)


# ---- correlation pyramid ----

def build_corr_pyramid(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4
) -> List[jnp.ndarray]:
    """fmap*: [B, h, w, C] -> pyramid of [B*h1*w1, hl, wl, 1] volumes."""
    B, h, w, C = fmap1.shape
    min_dim = 2 ** (num_levels - 1)
    assert h >= min_dim and w >= min_dim, (
        f"feature map {h}x{w} too small for {num_levels} corr levels "
        f"(needs >= {min_dim}; input must be >= {8 * min_dim} pixels)")
    f1 = fmap1.reshape(B, h * w, C)
    f2 = fmap2.reshape(B, h * w, C)
    corr = jnp.einsum("bnc,bmc->bnm", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(C))
    corr = corr.reshape(B * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        hl, wl = corr.shape[1] // 2, corr.shape[2] // 2
        corr = corr[:, : hl * 2, : wl * 2].reshape(-1, hl, 2, wl, 2, 1).mean((2, 4))
        pyramid.append(corr)
    return pyramid


def _lookup_level_patch(corr: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                        r: int) -> jnp.ndarray:
    """Bilinear window lookup on one pyramid level via contiguous patches.

    corr [N, H, W]; cx/cy [N] pixel centroids -> [N, (2r+1)^2] taps at
    (cx + i - r, cy + j - r), plane k = i*(2r+1) + j (X slowest — the
    reference tap-ordering quirk, raft/corr.py:34-40; converted update-block
    weights expect exactly this order, pinned by
    tests/test_activation_parity.py::TestRAFTParity).

    All taps share one fractional offset (integer tap spacing), so ONE
    [P, P] contiguous slice per query (P = 2r+2) provides every corner and
    the 4*(2r+1)^2 bilinear reads become arithmetic over the patch — the
    per-corner random gather this replaces dominated the RAFT GRU iteration
    on TPU (~2.7 s/iteration profiled at 720p, batch 8).
    """
    N, H, W = corr.shape
    P = 2 * r + 2
    K = 2 * r + 1
    x0f = jnp.floor(cx)
    y0f = jnp.floor(cy)
    wx = (cx - x0f).astype(corr.dtype)[:, None]  # shared by all taps
    wy = (cy - y0f).astype(corr.dtype)[:, None]

    # gather the P*P distinct corner values once (clipped flat indices;
    # out-of-range corners are masked to zero below)
    cx0 = (x0f - r).astype(jnp.int32)  # first corner column
    cy0 = (y0f - r).astype(jnp.int32)
    dy, dx = jnp.meshgrid(jnp.arange(P), jnp.arange(P), indexing="ij")
    gx = jnp.clip(cx0[:, None] + dx.reshape(-1)[None], 0, W - 1)
    gy = jnp.clip(cy0[:, None] + dy.reshape(-1)[None], 0, H - 1)
    patch = jnp.take_along_axis(
        corr.reshape(N, H * W), gy * W + gx, axis=1).reshape(N, P, P)

    # corner positions inside the patch are STATIC per tap: tap (i, j) has
    # corners (i + xo, j + yo) — slicing, not gathering
    def corner(xo, yo):
        vals = patch[:, yo : yo + K, xo : xo + K]       # [N, j, i]
        acx = (cx0 + xo)[:, None, None] + jnp.arange(K)[None, None, :]
        acy = (cy0 + yo)[:, None, None] + jnp.arange(K)[None, :, None]
        inb = ((acx >= 0) & (acx <= W - 1) & (acy >= 0) & (acy <= H - 1))
        # reorder [N, j, i] -> plane k = i*K + j (X slowest)
        return (vals * inb.astype(corr.dtype)).transpose(0, 2, 1
                                                         ).reshape(N, K * K)

    v00 = corner(0, 0)
    v01 = corner(1, 0)          # x+1
    v10 = corner(0, 1)          # y+1
    v11 = corner(1, 1)
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def _lookup_level_onehot(corr: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray,
                         r: int) -> jnp.ndarray:
    """Bilinear window lookup as two one-hot contractions — zero gathers.

    Same contract as _lookup_level_patch (corr [N, H, W]; cx/cy [N] ->
    [N, (2r+1)^2], plane k = i*(2r+1) + j, X slowest). The taps of the
    (2r+1)^2 window are integer-spaced around one fractional centroid, so
    the whole bilinear lookup factorizes per query into
        out[n] = (Wy[n])^T  @  corr[n]  @  Wx[n]
    where Wx[n, w, i] = (1-fx)·[w == x0+i-r] + fx·[w == x0+i-r+1] holds the
    x-weights of tap i (two nonzeros per column) and Wy likewise for rows.
    Out-of-range corners match no index and contribute exactly the zero the
    reference's zero-padding bilinear sampler produces (raft/corr.py:44 via
    utils.bilinear_sampler).

    Why: the row-wise patch gather this replaces is index-overhead-bound on
    TPU (~0.6 s/pair at 240x1280 features, the profiled ProPainter
    bottleneck of round 2); as one-hot weight construction (iota compares)
    plus two dense batched matmuls the same math rides the MXU/VPU with
    perfectly static shapes.
    """
    N, H, W = corr.shape
    K = 2 * r + 1
    dtype = corr.dtype
    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = (cx - x0).astype(dtype)
    fy = (cy - y0).astype(dtype)
    taps = jnp.arange(K) - r

    def onehot(c0f, frac, size):
        # [N, size, K] bilinear selection weights along one axis
        c0 = jnp.clip(c0f, -K - 2, size + K + 2).astype(jnp.int32)
        base = c0[:, None, None] + taps[None, None, :]
        idx = jnp.arange(size)[None, :, None]
        return ((idx == base).astype(dtype) * (1 - frac)[:, None, None]
                + (idx == base + 1).astype(dtype) * frac[:, None, None])

    wx = onehot(x0, fx, W)                      # [N, W, K]
    wy = onehot(y0, fy, H)                      # [N, H, K]
    tmp = jnp.einsum("nhw,nwi->nhi", corr, wx,
                     preferred_element_type=jnp.float32)   # x-interp first
    out = jnp.einsum("nhi,nhj->nij", tmp.astype(dtype), wy,
                     preferred_element_type=jnp.float32)   # [N, K_x, K_y]
    return out.astype(dtype).reshape(N, K * K)


def lookup_corr(
    pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray, radius: int = 4,
    method: str = "onehot",
) -> jnp.ndarray:
    """coords: [B, h1, w1, 2] (x, y) -> [B, h1, w1, num_levels*(2r+1)^2].

    method: "onehot" (default; dense MXU contraction, no gathers) or
    "patch" (contiguous-corner gather + static slicing, the round-2 path).
    Both produce identical math (tests/test_convert_raft.py pins them to
    each other and to the torch reference).
    """
    B, h1, w1, _ = coords.shape
    flat = coords.reshape(B * h1 * w1, 2)
    level_fn = (_lookup_level_onehot if method == "onehot"
                else _lookup_level_patch)
    outs = []
    for i, corr in enumerate(pyramid):
        cx = flat[:, 0] / (2 ** i)
        cy = flat[:, 1] / (2 ** i)
        sampled = level_fn(corr[..., 0], cx, cy, radius)
        outs.append(sampled.reshape(B, h1, w1, -1))
    return jnp.concatenate(outs, axis=-1)


# ---- update block ----


class _SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gru_pass(h, x, ks, pad, suffix):
            conv = lambda name: nn.Conv(
                self.hidden, ks, padding=pad, dtype=self.dtype,
                param_dtype=jnp.float32, name=name)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv(f"convz{suffix}")(hx))
            r = nn.sigmoid(conv(f"convr{suffix}")(hx))
            q = jnp.tanh(conv(f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            return (1 - z) * h + z * q

        h = gru_pass(h, x, (1, 5), ((0, 0), (2, 2)), "1")
        h = gru_pass(h, x, (5, 1), ((2, 2), (0, 0)), "2")
        return h


class _BasicMotionEncoder(nn.Module):
    corr_planes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        conv = lambda f, k, pad, name: nn.Conv(
            f, (k, k), padding=((pad, pad), (pad, pad)), dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        cor = nn.relu(conv(256, 1, 0, "convc1")(corr))
        cor = nn.relu(conv(192, 3, 1, "convc2")(cor))
        flo = nn.relu(conv(128, 7, 3, "convf1")(flow))
        flo = nn.relu(conv(64, 3, 1, "convf2")(flo))
        out = nn.relu(conv(126, 3, 1, "conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class _BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = _BasicMotionEncoder(self.corr_planes, self.dtype,
                                     name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = _SepConvGRU(self.hidden, self.dtype, name="gru")(net, x)
        f = nn.relu(nn.Conv(256, (3, 3), padding=_PAD1, dtype=self.dtype,
                            param_dtype=jnp.float32, name="flow1")(net))
        delta_flow = nn.Conv(2, (3, 3), padding=_PAD1, dtype=self.dtype,
                             param_dtype=jnp.float32, name="flow2")(f)
        m = nn.relu(nn.Conv(256, (3, 3), padding=_PAD1, dtype=self.dtype,
                            param_dtype=jnp.float32, name="mask1")(net))
        mask = 0.25 * nn.Conv(64 * 9, (1, 1), dtype=self.dtype,
                              param_dtype=jnp.float32, name="mask2")(m)
        return net, mask, delta_flow


def _extract_patches_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H, W, 9, C], taps ordered (kh, kw) row-major."""
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    H, W = x.shape[1], x.shape[2]
    taps = [pad[:, i : i + H, j : j + W] for i in range(3) for j in range(3)]
    return jnp.stack(taps, axis=3)


def convex_upsample_flow(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x upsample (raft.py:73-84).

    flow: [B, H, W, 2]; mask: [B, H, W, 576] laid out (k=9, r=8, c=8)
    channel-major. Returns [B, 8H, 8W, 2].
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    patches = _extract_patches_3x3(8.0 * flow)  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkrc,bhwkf->bhwrcf", m, patches)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # B, H, r, W, c, 2
    return up.reshape(B, 8 * H, 8 * W, 2)


class _RAFTStep(nn.Module):
    """One GRU update iteration, shaped for nn.scan (params broadcast across
    iterations). Loop-invariant tensors (corr pyramid, context, coords0) ride
    in the carry untouched."""

    corr_planes: int
    corr_radius: int
    hidden: int
    dtype: jnp.dtype = jnp.float32
    corr_lookup: str = "onehot"

    @nn.compact
    def __call__(self, carry, _):
        net, coords1, mask, pyramid, inp, coords0 = carry
        corr = lookup_corr(list(pyramid), coords1, self.corr_radius,
                           method=self.corr_lookup)
        flow = coords1 - coords0
        net, mask, delta = _BasicUpdateBlock(
            self.corr_planes, self.hidden, self.dtype, name="update"
        )(net, inp, corr.astype(self.dtype), flow.astype(self.dtype))
        coords1 = coords1 + delta.astype(jnp.float32)
        return (net, coords1, mask, pyramid, inp, coords0), None


class RAFT(nn.Module):
    """Full-size RAFT; __call__(image1, image2) -> full-res flow [B, H, W, 2].

    Images in [-1, 1] (the ProPainter pipeline feeds normalized frames
    directly, flow_comp_raft.py:47-50). H and W must be divisible by 8.
    """

    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4
    hidden: int = 128
    context: int = 128
    dtype: jnp.dtype = jnp.float32
    # Storage dtype of the all-pairs correlation pyramid. bf16 halves the
    # lookup's gather bytes (the profiled bottleneck of the whole RAFT
    # forward) and the pyramid's HBM at a ~1e-2 px flow perturbation;
    # float32 restores bit-parity with the torch reference (the default the
    # parity tests pin).
    corr_dtype: jnp.dtype = jnp.float32
    # "onehot": gather-free dense-contraction window lookup (default —
    # the round-3 fix for the index-overhead-bound gather); "patch": the
    # round-2 contiguous-corner gather path.
    corr_lookup: str = "onehot"

    def setup(self):
        self.fnet = BasicEncoder(256, "instance", self.dtype)
        self.cnet = BasicEncoder(self.hidden + self.context, "batch",
                                 self.dtype)
        corr_planes = self.corr_levels * (2 * self.corr_radius + 1) ** 2
        self.step = nn.scan(
            _RAFTStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
            length=self.iters,
        )(corr_planes, self.corr_radius, self.hidden, self.dtype,
          self.corr_lookup)

    def encode(self, images, train: bool = False):
        """Per-frame encodings, pair-independent: [B, H, W, 3] in [-1, 1] ->
        (fmap fp32 [B, H/8, W/8, 256], net, inp [B, H/8, W/8, hidden/ctx]).

        Split out of __call__ so a video clip can encode each frame ONCE:
        in consecutive-pair bidirectional flow (raft_bi_flows / the
        ProPainter wrapper) every interior frame otherwise passes through
        fnet 4x (as image1/image2 of the forward and backward pair) and
        cnet 2x. The reference re-encodes per pair per direction
        (raft/raft.py:103-118 called from flow_comp_raft.py:40-55)."""
        fmap = self.fnet(images, train).astype(jnp.float32)
        ctx = self.cnet(images, train)
        net = jnp.tanh(ctx[..., : self.hidden])
        inp = nn.relu(ctx[..., self.hidden :])
        return fmap, net, inp

    def forward_encoded(self, fmap1, fmap2, net, inp):
        """Iterative flow from precomputed encodings: fmap1/fmap2 from
        encode(); (net, inp) are image1's context. Returns [B, 8h, 8w, 2]."""
        B, h, w, _ = fmap1.shape
        pyramid = tuple(
            c.astype(self.corr_dtype)
            for c in build_corr_pyramid(fmap1, fmap2, self.corr_levels))

        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        coords0 = jnp.stack([xs, ys], -1).astype(jnp.float32)[None].repeat(B, 0)
        mask0 = jnp.zeros((B, h, w, 64 * 9), self.dtype)

        (net, coords1, final_mask, *_), _ = self.step(
            (net, coords0, mask0, pyramid, inp, coords0), None)
        return convex_upsample_flow(
            (coords1 - coords0), final_mask.astype(jnp.float32))

    def __call__(self, image1, image2, train: bool = False):
        fmap1, net, inp = self.encode(image1, train)
        fmap2 = self.fnet(image2, train).astype(jnp.float32)
        return self.forward_encoded(fmap1, fmap2, net, inp)


def raft_bi_flows(raft: RAFT, params, frames: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bidirectional flows for consecutive pairs (flow_comp_raft.py:40-55).

    frames: [B, T, H, W, 3] in [-1, 1] -> (flows_f, flows_b) each
    [B, T-1, H, W, 2].
    """
    B, T, H, W, _ = frames.shape
    fmap, net, inp = raft.apply(
        params, frames.reshape(-1, H, W, 3), method="encode")
    h, w = fmap.shape[1:3]

    def pairs(x):
        x = x.reshape(B, T, h, w, -1)
        return (x[:, :-1].reshape(B * (T - 1), h, w, -1),
                x[:, 1:].reshape(B * (T - 1), h, w, -1))

    (f1, f2), (n1, n2), (i1, i2) = pairs(fmap), pairs(net), pairs(inp)
    flows_f = raft.apply(params, f1, f2, n1, i1, method="forward_encoded")
    flows_b = raft.apply(params, f2, f1, n2, i2, method="forward_encoded")
    return (flows_f.reshape(B, T - 1, H, W, 2),
            flows_b.reshape(B, T - 1, H, W, 2))
