"""Pallas fused patch-attention kernel: interpret-mode equivalence with the
XLA path across shapes, masks, and dtypes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.ops.pallas_patch_attention import patch_attention_pallas
from vsr_tpu.ops.patch_attention import patch_attention_single_scale


def rand_qkv(shape, seed):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        for _ in range(3)
    )


class TestPallasPatchAttention:
    @pytest.mark.parametrize("shape,patch", [
        ((2, 4, 6, 8, 8), (4, 3)),
        ((1, 3, 6, 16, 4), (2, 2)),
        ((1, 5, 9, 10, 8), (5, 3)),
    ])
    def test_matches_xla_path(self, shape, patch):
        q, k, v = rand_qkv(shape, 0)
        got = patch_attention_pallas(q, k, v, patch, interpret=True)
        want = patch_attention_single_scale(q, k, v, patch)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_key_valid_mask(self):
        q, k, v = rand_qkv((2, 4, 6, 8, 8), 1)
        valid = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool))
        got = patch_attention_pallas(q, k, v, (4, 3), key_valid=valid,
                                     interpret=True)
        want = patch_attention_single_scale(q, k, v, (4, 3), key_valid=valid)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = rand_qkv((1, 2, 6, 8, 8), 2)
        q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
        got = patch_attention_pallas(q, k, v, (4, 3), interpret=True)
        want = patch_attention_single_scale(q, k, v, (4, 3))
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_masked_frame_does_not_leak(self):
        q, k, v = rand_qkv((1, 3, 6, 8, 8), 3)
        valid = jnp.asarray(np.array([[1, 1, 0]], bool))
        k2 = k.at[:, 2].add(100.0)
        v2 = v.at[:, 2].add(100.0)
        a = patch_attention_pallas(q, k, v, (4, 3), key_valid=valid,
                                   interpret=True)
        b = patch_attention_pallas(q, k2, v2, (4, 3), key_valid=valid,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
