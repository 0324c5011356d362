"""Native host-op tests: build, cv2-parity of resize/blend, threading."""

import cv2
import numpy as np
import pytest

from vsr_tpu.native import crop_resize, get_lib, paste_band_blend


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


class TestCropResize:
    def test_matches_cv2_within_1lsb(self):
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)
        out = crop_resize(frame, y0=480, crop_h=240, out_w=640, out_h=120)
        ref = cv2.resize(frame[480:720], (640, 120))
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02

    def test_upscale(self):
        rng = np.random.default_rng(1)
        frame = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
        out = crop_resize(frame, 0, 120, out_w=320, out_h=240)
        ref = cv2.resize(frame, (320, 240))
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


class TestPasteBandBlend:
    def test_matches_cv2_pipeline(self):
        rng = np.random.default_rng(2)
        H, W = 720, 1280
        band_h, y0 = 240, 480
        frame_a = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        frame_b = frame_a.copy()
        comp = rng.integers(0, 256, (120, 640, 3), dtype=np.uint8)
        mask = np.zeros((band_h, W), np.uint8)
        mask[50:200, 100:1100] = 1

        ok = paste_band_blend(frame_a, comp, mask, y0, band_h)
        assert ok

        resized = cv2.resize(comp, (W, band_h))
        region = mask[..., None]
        frame_b[y0:y0 + band_h] = (region * resized
                                   + (1 - region) * frame_b[y0:y0 + band_h])
        diff = np.abs(frame_a.astype(int) - frame_b.astype(int))
        assert diff.max() <= 1
        # untouched outside the band
        np.testing.assert_array_equal(frame_a[:y0], frame_b[:y0])

    def test_zero_mask_leaves_frame(self):
        rng = np.random.default_rng(3)
        frame = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
        orig = frame.copy()
        comp = rng.integers(0, 256, (25, 50, 3), dtype=np.uint8)
        mask = np.zeros((40, 200), np.uint8)
        assert paste_band_blend(frame, comp, mask, 30, 40)
        np.testing.assert_array_equal(frame, orig)

    def test_thread_counts_agree(self):
        rng = np.random.default_rng(4)
        frame1 = rng.integers(0, 256, (360, 640, 3), dtype=np.uint8)
        frame8 = frame1.copy()
        comp = rng.integers(0, 256, (120, 640, 3), dtype=np.uint8)
        mask = np.ones((120, 640), np.uint8)
        paste_band_blend(frame1, comp, mask, 200, 120, threads=1)
        paste_band_blend(frame8, comp, mask, 200, 120, threads=8)
        np.testing.assert_array_equal(frame1, frame8)
