"""Grid-sample and modulated deformable conv tests.

grid_sample is validated against torch F.grid_sample(align_corners=True);
deform_conv (no torchvision in this env) is validated by its defining
properties: zero offsets reduce to a plain conv, integer offsets shift the
receptive field, modulation scales taps linearly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vsr_tpu.ops.deform_conv import modulated_deform_conv
from vsr_tpu.ops.grid_sample import (
    flow_warp,
    grid_sample_bilinear,
    grid_sample_nearest,
)


class TestGridSampleTorchParity:
    def test_bilinear_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        img = rng.standard_normal((2, 9, 13, 4)).astype(np.float32)
        # random pixel coords incl. out-of-range
        coords = rng.uniform(-2, 14, (2, 50, 2)).astype(np.float32)

        mine = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(coords)))

        H, W = 9, 13
        gx = 2 * coords[..., 0] / (W - 1) - 1
        gy = 2 * coords[..., 1] / (H - 1) - 1
        grid = torch.from_numpy(np.stack([gx, gy], -1))[:, :, None, :]  # [B, N, 1, 2]
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2), grid,
            mode="bilinear", padding_mode="zeros", align_corners=True,
        )[:, :, :, 0].permute(0, 2, 1).numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)

    def test_identity_coords(self):
        rng = np.random.default_rng(1)
        img = rng.standard_normal((1, 6, 8, 3)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(6), np.arange(8), indexing="ij")
        coords = np.stack([xs, ys], -1)[None].astype(np.float32)
        out = np.asarray(grid_sample_bilinear(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_nearest(self):
        img = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
        coords = jnp.asarray([[[1.4, 0.6], [3.0, 2.0]]])  # (x, y)
        out = np.asarray(grid_sample_nearest(img, coords))
        assert out[0, 0, 0] == 5.0  # round(1.4)=1, round(0.6)=1 -> idx 1*4+1
        assert out[0, 1, 0] == 11.0


class TestFlowWarp:
    def test_zero_flow_identity(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 5, 7, 2)).astype(np.float32)
        flow = np.zeros((1, 5, 7, 2), np.float32)
        out = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_integer_shift(self):
        x = np.zeros((1, 4, 6, 1), np.float32)
        x[0, 1, 2, 0] = 1.0
        flow = np.full((1, 4, 6, 2), 0.0, np.float32)
        flow[..., 0] = 1.0  # sample from x+1 -> image shifts left
        out = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))
        assert out[0, 1, 1, 0] == pytest.approx(1.0)
        assert out[0, 1, 2, 0] == pytest.approx(0.0)

    def test_matches_torch_flow_warp_semantics(self):
        """Replicates the reference flow_warp (grid+flow, align_corners=True)."""
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 6, 9, 3)).astype(np.float32)
        flow = rng.uniform(-2, 2, (1, 6, 9, 2)).astype(np.float32)

        mine = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

        H, W = 6, 9
        gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        grid = np.stack((gx, gy), axis=2)[None].astype(np.float32) + flow
        gxn = 2.0 * grid[..., 0] / max(W - 1, 1) - 1.0
        gyn = 2.0 * grid[..., 1] / max(H - 1, 1) - 1.0
        tg = torch.from_numpy(np.stack((gxn, gyn), axis=-1))
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2), tg,
            mode="bilinear", padding_mode="zeros", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


class TestModulatedDeformConv:
    def _plain_conv_ref(self, x, w):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        ref = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w.transpose(3, 2, 0, 1)),  # HWIO -> OIHW
            padding=1,
        ).permute(0, 2, 3, 1).numpy()
        return ref

    def test_zero_offset_equals_conv(self):
        rng = np.random.default_rng(4)
        B, H, W, C, G, Cout = 2, 6, 8, 8, 2, 5
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, Cout)).astype(np.float32)
        offset = np.zeros((B, H, W, G, 9, 2), np.float32)
        mod = np.ones((B, H, W, G, 9), np.float32)
        out = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod), jnp.asarray(w)))
        ref = self._plain_conv_ref(x, w)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_modulation_scales_linearly(self):
        rng = np.random.default_rng(5)
        B, H, W, C, G = 1, 5, 5, 4, 1
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, 3)).astype(np.float32)
        offset = np.zeros((B, H, W, G, 9, 2), np.float32)
        full = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset),
            jnp.ones((B, H, W, G, 9), np.float32), jnp.asarray(w)))
        half = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset),
            np.full((B, H, W, G, 9), 0.5, np.float32), jnp.asarray(w)))
        np.testing.assert_allclose(half, full * 0.5, rtol=1e-4, atol=1e-5)

    def test_integer_offset_shifts_taps(self):
        """Uniform (0, +1) x-offset == conv over x shifted by one column."""
        rng = np.random.default_rng(6)
        B, H, W, C, G, Cout = 1, 6, 8, 4, 1, 3
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, Cout)).astype(np.float32)
        offset = np.zeros((B, H, W, G, 9, 2), np.float32)
        offset[..., 1] = 1.0  # (dy, dx): dx = +1
        mod = np.ones((B, H, W, G, 9), np.float32)
        out = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod), jnp.asarray(w)))
        x_shift = np.concatenate([x[:, :, 1:], np.zeros_like(x[:, :, :1])], axis=2)
        ref = self._plain_conv_ref(x_shift, w)
        # interior matches exactly; borders differ by padding semantics
        np.testing.assert_allclose(out[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2],
                                   rtol=1e-4, atol=1e-4)

    def test_group_offsets_independent(self):
        """Different offsets per group only affect that group's channels."""
        rng = np.random.default_rng(7)
        B, H, W, C, G = 1, 6, 6, 8, 2
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        # identity weight-ish: depthwise-style extraction of center tap
        w = np.zeros((3, 3, C, C), np.float32)
        for c in range(C):
            w[1, 1, c, c] = 1.0
        mod = np.ones((B, H, W, G, 9), np.float32)
        off_a = np.zeros((B, H, W, G, 9, 2), np.float32)
        off_b = off_a.copy()
        off_b[:, :, :, 1, :, 1] = 1.0  # group 1 shifts x by +1
        out_a = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off_a), jnp.asarray(mod), jnp.asarray(w)))
        out_b = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off_b), jnp.asarray(mod), jnp.asarray(w)))
        # group 0 channels (0..3) unchanged
        np.testing.assert_allclose(out_a[..., :4], out_b[..., :4], atol=1e-6)
        # group 1 channels shifted
        np.testing.assert_allclose(
            out_b[:, :, :-1, 4:], out_a[:, :, 1:, 4:], atol=1e-5)


class TestDeformPatchPath:
    """Patch-gather sampling (center + bounded residual) must equal the
    generic corner-gather path exactly — it is the production path for both
    ProPainter deform alignments (generator.py, flow_completion.py)."""

    def _run_both(self, x, offset, mod, w, center, bound):
        from vsr_tpu.ops import deform_conv as dc

        generic = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod),
            jnp.asarray(w)))
        assert dc._USE_PATCH  # tests run with the default env
        patch = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod),
            jnp.asarray(w), center=jnp.asarray(center), residual_bound=bound))
        return generic, patch

    @pytest.mark.parametrize("bound", [3.0, 5.0])
    def test_fuzz_matches_generic(self, bound):
        rng = np.random.default_rng(8)
        B, H, W, C, G, Cout = 2, 10, 12, 16, 4, 6
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, Cout)).astype(np.float32)
        # center like a flow field (can be large / push patches off-image)
        center = rng.uniform(-12, 12, (B, H, W, 2)).astype(np.float32)
        res = rng.uniform(-bound, bound, (B, H, W, G, 9, 2)).astype(np.float32)
        offset = res + center[:, :, :, None, None, :]
        mod = rng.uniform(0, 1, (B, H, W, G, 9)).astype(np.float32)
        generic, patch = self._run_both(x, offset, mod, w, center, bound)
        np.testing.assert_allclose(patch, generic, rtol=1e-4, atol=1e-4)

    def test_zero_center_zero_offset_equals_conv(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(9)
        B, H, W, C, G, Cout = 1, 7, 9, 8, 2, 4
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, Cout)).astype(np.float32)
        offset = np.zeros((B, H, W, G, 9, 2), np.float32)
        mod = np.ones((B, H, W, G, 9), np.float32)
        out = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod),
            jnp.asarray(w), center=jnp.zeros((B, H, W, 2), jnp.float32),
            residual_bound=5.0))
        ref = F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w.transpose(3, 2, 0, 1)), padding=1,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_far_out_of_image_centers_are_zero(self):
        """Whole patches outside the image (clamped starts) contribute 0 —
        the zeros-padding semantics of the reference sampler."""
        rng = np.random.default_rng(10)
        B, H, W, C, G = 1, 6, 6, 8, 2
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        w = rng.standard_normal((3, 3, C, 2)).astype(np.float32)
        center = np.full((B, H, W, 2), 100.0, np.float32)
        offset = center[:, :, :, None, None, :] + np.zeros(
            (B, H, W, G, 9, 2), np.float32)
        mod = np.ones((B, H, W, G, 9), np.float32)
        out = np.asarray(modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mod),
            jnp.asarray(w), center=jnp.asarray(center), residual_bound=3.0))
        np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-6)
