"""Kernel-level op tests: torch-parity for upsample/conv conventions and the
padding-mask equivalence that underpins the static-shape window design."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.ops.patch_attention import (
    multi_scale_patch_attention,
    patch_attention_single_scale,
)
from vsr_tpu.ops.upsample import (
    upsample_bilinear_2x_align_corners,
    upsample_bilinear_align_corners,
)


class TestUpsampleTorchParity:
    def test_2x_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 7, 9, 3)).astype(np.float32)
        mine = np.asarray(upsample_bilinear_2x_align_corners(jnp.asarray(x)))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=2, mode="bilinear", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5)

    def test_arbitrary_size(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 5, 6, 2)).astype(np.float32)
        mine = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 13, 17))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, size=(13, 17), mode="bilinear", align_corners=True
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-5)

    def test_leading_batch_dims(self):
        x = jnp.ones((2, 3, 4, 6, 5))
        out = upsample_bilinear_2x_align_corners(x)
        assert out.shape == (2, 3, 8, 12, 5)


class TestConvTorchParity:
    """Validates that flax Conv + explicit ((1,1),(1,1)) padding + OIHW->HWIO
    transposition reproduce torch conv2d — the contract the checkpoint
    converter relies on."""

    @pytest.mark.parametrize("stride", [1, 2])
    def test_conv3x3(self, stride):
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 12, 16, 5)).astype(np.float32)
        w_oihw = rng.standard_normal((7, 5, 3, 3)).astype(np.float32)
        b = rng.standard_normal((7,)).astype(np.float32)

        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w_oihw), torch.from_numpy(b),
            stride=stride, padding=1,
        ).permute(0, 2, 3, 1).numpy()

        conv = fnn.Conv(7, (3, 3), strides=(stride, stride),
                        padding=((1, 1), (1, 1)))
        params = {"params": {"kernel": jnp.asarray(w_oihw.transpose(2, 3, 1, 0)),
                             "bias": jnp.asarray(b)}}
        mine = np.asarray(conv.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-4)

    def test_dilated_conv(self):
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 10, 14, 4)).astype(np.float32)
        w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(w),
            padding=2, dilation=2,
        ).permute(0, 2, 3, 1).numpy()
        conv = fnn.Conv(6, (3, 3), padding=((2, 2), (2, 2)),
                        kernel_dilation=(2, 2), use_bias=False)
        params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
        mine = np.asarray(conv.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-4)


class TestPatchAttention:
    def test_shapes(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((2, 5, 6, 8, 16)).astype(np.float32))
        out = multi_scale_patch_attention(x, x, x, [(4, 3), (2, 2)])
        assert out.shape == x.shape

    def test_padding_mask_equals_subset(self):
        """Core static-shape property: attending over L slots with the last
        ones key-masked == attending over the valid subset only."""
        rng = np.random.default_rng(5)
        L, Lv = 6, 4
        q = rng.standard_normal((1, L, 6, 8, 8)).astype(np.float32)
        kv_valid = q[:, :Lv]

        full = patch_attention_single_scale(
            jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), (4, 3),
            key_valid=jnp.asarray(np.arange(L)[None] < Lv),
        )
        subset = patch_attention_single_scale(
            jnp.asarray(kv_valid), jnp.asarray(kv_valid), jnp.asarray(kv_valid),
            (4, 3),
        )
        np.testing.assert_allclose(
            np.asarray(full[:, :Lv]), np.asarray(subset), rtol=1e-4, atol=1e-5
        )

    def test_patch_mask_blocks_keys(self):
        """A fully-masked frame must not influence other frames' outputs."""
        rng = np.random.default_rng(6)
        base = rng.standard_normal((1, 3, 4, 4, 4)).astype(np.float32)
        variant = base.copy()
        variant[0, 2] += 100.0  # huge perturbation in masked frame
        mask = np.zeros((1, 3, 4, 4), np.float32)
        mask[0, 2] = 1.0  # frame 2 fully masked
        out_a = patch_attention_single_scale(
            jnp.asarray(base), jnp.asarray(base), jnp.asarray(base), (2, 2),
            patch_masked=jnp.asarray(mask),
        )
        out_b = patch_attention_single_scale(
            jnp.asarray(base), jnp.asarray(variant), jnp.asarray(variant), (2, 2),
            patch_masked=jnp.asarray(mask),
        )
        # frames 0/1 see identical key sets (frame 2 masked out of keys)
        np.testing.assert_allclose(
            np.asarray(out_a[:, :2]), np.asarray(out_b[:, :2]), rtol=1e-4, atol=1e-4
        )

    def test_permutation_invariance_of_embedding_order(self):
        """Patch-major vs channel-major flatten must agree (doc'd invariant)."""
        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
        out = patch_attention_single_scale(
            jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), (2, 2))
        # direct dense reference in channel-major token order
        B, L, h, w, dk = x.shape
        ph, pw = 2, 2
        oh, ow = h // ph, w // pw
        t = x.reshape(B, L, oh, ph, ow, pw, dk).transpose(0, 1, 2, 4, 6, 3, 5)
        tok = t.reshape(B, L * oh * ow, dk * ph * pw)
        s = tok @ tok.transpose(0, 2, 1) / np.sqrt(tok.shape[-1])
        a = np.exp(s - s.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        y = (a @ tok).reshape(B, L, oh, ow, dk, ph, pw).transpose(0, 1, 2, 5, 3, 6, 4)
        y = y.reshape(B, L, h, w, dk)
        np.testing.assert_allclose(np.asarray(out), y, rtol=1e-4, atol=1e-5)
