"""STTN generator tests: shapes, window-masking equivalence, det-variant mask."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.models.sttn import STTNGenerator

# Tiny geometry divisible by these patch sizes: feature map 6x8
TINY_PATCHES = ((4, 3), (2, 2))
TINY_H, TINY_W = 24, 32  # /4 -> 6x8


def make_model(variant="auto", **kw):
    return STTNGenerator(
        variant=variant, channel=16, stack_num=2,
        patchsizes_override=TINY_PATCHES, **kw,
    )


@pytest.fixture(scope="module")
def auto_model_params():
    model = make_model()
    x = jnp.zeros((1, 3, TINY_H, TINY_W, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


class TestShapes:
    def test_full_forward(self, auto_model_params):
        model, params = auto_model_params
        x = jnp.zeros((2, 3, TINY_H, TINY_W, 3))
        out = model.apply(params, x)
        assert out.shape == (2, 3, TINY_H, TINY_W, 3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0)

    def test_encode_transform_decode(self, auto_model_params):
        model, params = auto_model_params
        frames = jnp.zeros((5, TINY_H, TINY_W, 3))
        feats = model.apply(params, frames, method=model.encode)
        assert feats.shape == (5, TINY_H // 4, TINY_W // 4, 16)
        w = feats[None]  # one window of 5 slots
        out = model.apply(params, w, None, None, method=model.transform)
        assert out.shape == w.shape
        dec = model.apply(params, out[0], method=model.decode)
        assert dec.shape == (5, TINY_H, TINY_W, 3)


class TestWindowMaskingEquivalence:
    """The padded static window must reproduce the ragged computation."""

    def test_padded_transform_equals_subset(self, auto_model_params):
        model, params = auto_model_params
        rng = np.random.default_rng(0)
        feats = jnp.asarray(
            rng.standard_normal((7, TINY_H // 4, TINY_W // 4, 16)).astype(np.float32))

        # ragged run: only 5 valid frames
        subset = model.apply(params, feats[None, :5], None, None,
                             method=model.transform)

        # padded run: 7 slots, last 2 key-masked with garbage features
        padded_feats = feats.at[5:].set(999.0)
        key_valid = jnp.asarray(np.arange(7)[None] < 5)
        padded = model.apply(params, padded_feats[None], key_valid, None,
                             method=model.transform)

        np.testing.assert_allclose(
            np.asarray(padded[0, :5]), np.asarray(subset[0]),
            rtol=2e-4, atol=2e-4,
        )

    def test_window_batching_matches_sequential(self, auto_model_params):
        """Stacking windows on the batch axis == looping windows one by one."""
        model, params = auto_model_params
        rng = np.random.default_rng(1)
        w1 = rng.standard_normal((4, TINY_H // 4, TINY_W // 4, 16)).astype(np.float32)
        w2 = rng.standard_normal((4, TINY_H // 4, TINY_W // 4, 16)).astype(np.float32)
        batched = model.apply(
            params, jnp.asarray(np.stack([w1, w2])), None, None,
            method=model.transform)
        for i, w in enumerate([w1, w2]):
            solo = model.apply(params, jnp.asarray(w)[None], None, None,
                               method=model.transform)
            np.testing.assert_allclose(
                np.asarray(batched[i]), np.asarray(solo[0]), rtol=1e-4, atol=1e-4)


class TestDetVariant:
    def test_forward_with_masks(self):
        model = make_model(variant="det")
        x = jnp.zeros((1, 3, TINY_H, TINY_W, 3))
        m = jnp.zeros((1, 3, TINY_H, TINY_W, 1))
        params = model.init(jax.random.PRNGKey(0), x, m)
        out = model.apply(params, x, m)
        assert out.shape == x.shape

    def test_attention_mask_changes_output(self):
        """With apply_attention_mask=True a masked region cannot leak its own
        content through attention keys; flipping the flag must change the
        result (documents the reference's no-op-mask bug)."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 3, TINY_H, TINY_W, 3)).astype(np.float32))
        m = np.zeros((1, 3, TINY_H, TINY_W, 1), np.float32)
        m[:, :, TINY_H // 2:, :, :] = 1.0
        m = jnp.asarray(m)
        masked = make_model(variant="det", apply_attention_mask=True)
        nomask = make_model(variant="det", apply_attention_mask=False)
        params = masked.init(jax.random.PRNGKey(1), x, m)
        a = masked.apply(params, x, m)
        b = nomask.apply(params, x, m)
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
