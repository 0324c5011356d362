"""Pallas flash token-attention kernel (ops/pallas_token_attention.py):
interpret-mode equivalence with the XLA path across shapes, masks, dtypes,
and through the patch_attention_single_scale(use_pallas=True) route."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


class TestFlashTokenAttention:
    """The round-2 kernel: flash attention over pre-tokenized patch tokens
    (ops/pallas_token_attention.py), interpret-mode equivalence."""

    def _xla_reference(self, q, k, v, bias=None):
        import math

        scale = 1.0 / math.sqrt(q.shape[-1])
        scores = jnp.einsum("bnd,bmd->bnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            scores = scores + bias[:, None, :]
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", attn.astype(v.dtype), v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    @pytest.mark.parametrize("shape,qb,kb", [
        ((2, 64, 128), 16, 32),     # divides evenly
        ((1, 40, 256), 16, 8),      # N % block via divisor snapping
        ((1, 24, 96), 256, 512),    # blocks larger than N -> whole array
    ])
    def test_matches_xla(self, shape, qb, kb):
        from vsr_tpu.ops.pallas_token_attention import flash_token_attention

        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                   for _ in range(3))
        got = flash_token_attention(q, k, v, q_block=qb, k_block=kb,
                                    interpret=True)
        want = self._xla_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_key_bias_excludes_tokens(self):
        from vsr_tpu.ops.pallas_token_attention import flash_token_attention

        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.standard_normal((2, 32, 64)).astype(np.float32))
                   for _ in range(3))
        bias = jnp.where(jnp.arange(32)[None, :] < 20, 0.0, -1e9)
        bias = jnp.broadcast_to(bias, (2, 32)).astype(jnp.float32)
        got = flash_token_attention(q, k, v, key_bias=bias, q_block=16,
                                    k_block=16, interpret=True)
        want = self._xla_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # masked-out keys must not affect output: perturb them wildly
        k2 = k.at[:, 20:].set(100.0)
        v2 = v.at[:, 20:].set(-50.0)
        got2 = flash_token_attention(q, k2, v2, key_bias=bias, q_block=16,
                                     k_block=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                                   rtol=2e-5, atol=2e-5)

    def test_all_keys_masked_matches_xla(self):
        """ADVICE r2: when EVERY real key carries the -1e9 mask (det variant,
        all key patches over the hole threshold) the kernel must distribute
        softmax over the real keys like the XLA path — not leak Nk/nk_pad of
        the weight onto zero-valued padded rows (Nk=40 pads to 128 here)."""
        from vsr_tpu.ops.pallas_token_attention import flash_token_attention

        rng = np.random.default_rng(3)
        q, k, v = (jnp.asarray(
            rng.standard_normal((2, 40, 64)).astype(np.float32))
            for _ in range(3))
        bias = jnp.full((2, 40), -1e9, jnp.float32)
        got = flash_token_attention(q, k, v, key_bias=bias, q_block=16,
                                    k_block=128, interpret=True)
        want = self._xla_reference(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16(self):
        from vsr_tpu.ops.pallas_token_attention import flash_token_attention

        rng = np.random.default_rng(2)
        q, k, v = (jnp.asarray(rng.standard_normal((1, 48, 128)).astype(np.float32),
                               dtype=jnp.bfloat16) for _ in range(3))
        got = flash_token_attention(q, k, v, q_block=16, k_block=16,
                                    interpret=True)
        want = self._xla_reference(q, k, v)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=2e-2)

    def test_single_scale_pallas_route_matches(self, monkeypatch):
        """patch_attention_single_scale(use_pallas=True) == XLA path, with
        the availability probe stubbed to interpret mode."""
        import vsr_tpu.ops.patch_attention as pa
        from vsr_tpu.ops import pallas_token_attention as pta

        monkeypatch.setattr(pa, "_pallas_ok", True)
        real = pta.flash_token_attention
        monkeypatch.setattr(
            pa, "_pallas_available", lambda: True)
        import functools
        monkeypatch.setattr(
            pta, "flash_token_attention",
            functools.partial(real, interpret=True))

        rng = np.random.default_rng(3)
        shape = (2, 4, 6, 8, 8)
        q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
                   for _ in range(3))
        valid = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 0, 0]], bool))
        got = pa.patch_attention_single_scale(q, k, v, (4, 3),
                                              key_valid=valid,
                                              use_pallas=True)
        want = pa.patch_attention_single_scale(q, k, v, (4, 3),
                                               key_valid=valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
