"""STTN-det inpainter tests: masked engine semantics and wrapper contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config
from vsr_tpu.inpaint.engine import STTNWindowEngine
from vsr_tpu.inpaint.sttn_det import STTNDetInpainter
from vsr_tpu.models.sttn import STTNGenerator

TINY_PATCHES = ((4, 3), (2, 2))
H, W = 24, 32


@pytest.fixture(scope="module")
def det_model():
    model = STTNGenerator(variant="det", channel=16, stack_num=2,
                          patchsizes_override=TINY_PATCHES)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, H, W, 3)),
        jnp.zeros((1, 1, H, W, 1)))
    return model, params


class TestMaskedEngine:
    def test_non_hole_pixels_pass_through(self, det_model):
        model, params = det_model
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
        masks = np.zeros((10, H, W), np.float32)
        masks[:, 12:20, 8:24] = 1.0
        engine = STTNWindowEngine(
            model, params, clip_len=10, input_hw=(H, W),
            stride=3, ref_length=5, window_batch=2, masked=True,
        )
        out = engine.process_chunk(frames, masks)
        assert out.shape == frames.shape
        hole = masks[0].astype(bool)
        # outside the hole the composite equals the source exactly
        np.testing.assert_array_equal(out[:, ~hole], frames[:, ~hole])
        # inside the hole the model rewrote pixels
        assert np.abs(out[:, hole].astype(int) - frames[:, hole].astype(int)).mean() > 1

    def test_requires_mask_when_masked(self, det_model):
        model, params = det_model
        engine = STTNWindowEngine(
            model, params, clip_len=4, input_hw=(H, W),
            stride=2, ref_length=4, masked=True,
        )
        with pytest.raises(AssertionError):
            engine.process_chunk(np.zeros((4, H, W, 3), np.uint8))


class TestDetInpainter:
    def _make(self, monkeypatch):
        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.sttn_max_load_num = 8
        cfg.sttn_reference_length = 4
        cfg.sttn_neighbor_stride = 2
        cfg.window_batch = 2
        from vsr_tpu.inpaint import sttn_det as mod

        orig = mod.STTNGenerator
        monkeypatch.setattr(
            mod, "STTNGenerator",
            lambda **kw: orig(**{**kw, "channel": 16, "stack_num": 2,
                                 "patchsizes_override": TINY_PATCHES}),
        )
        return STTNDetInpainter(config=cfg, input_size=(64, 48))

    def test_call_contract(self, monkeypatch):
        inp = self._make(monkeypatch)
        rng = np.random.default_rng(1)
        frames = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
                  for _ in range(6)]
        mask = np.zeros((120, 160), np.uint8)
        mask[90:110, 30:130] = 255
        out = inp(frames, mask)
        assert len(out) == 6
        assert out[0].shape == (120, 160, 3)
        # band solver: W*5/18 = 44 px band; pixels far above untouched
        np.testing.assert_array_equal(out[2][:40], frames[2][:40])
        # inside the mask things changed
        assert np.abs(out[2][90:110, 30:130].astype(int)
                      - frames[2][90:110, 30:130].astype(int)).mean() > 1

    def test_empty_mask_identity(self, monkeypatch):
        inp = self._make(monkeypatch)
        frames = [np.full((120, 160, 3), 99, np.uint8) for _ in range(3)]
        out = inp(frames, np.zeros((120, 160), np.uint8))
        for a, b in zip(out, frames):
            np.testing.assert_array_equal(a, b)


def test_clamped_band_ultrawide(monkeypatch):
    """Ultra-wide frame: split_h exceeds H, the solver clamps the band to the
    image, and paste-back must resize to the actual band height."""
    cfg = Config()
    cfg.compute_dtype = "float32"
    cfg.sttn_max_load_num = 4
    cfg.sttn_reference_length = 2
    cfg.sttn_neighbor_stride = 1
    cfg.window_batch = 2
    from vsr_tpu.inpaint import sttn_det as mod

    orig = mod.STTNGenerator
    monkeypatch.setattr(
        mod, "STTNGenerator",
        lambda **kw: orig(**{**kw, "channel": 16, "stack_num": 1,
                             "patchsizes_override": TINY_PATCHES}),
    )
    inp = STTNDetInpainter(config=cfg, input_size=(64, 48))
    rng = np.random.default_rng(3)
    # H=96 < split_h = 400*5/18 = 111 -> clamped band of height 96
    frames = [rng.integers(0, 256, (96, 400, 3), dtype=np.uint8)
              for _ in range(3)]
    mask = np.zeros((96, 400), np.uint8)
    mask[40:60, 100:300] = 255
    out = inp(frames, mask)
    assert len(out) == 3 and out[0].shape == (96, 400, 3)
