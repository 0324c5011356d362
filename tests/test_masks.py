"""Tests for mask construction and the inpaint-band solver."""

import numpy as np

from vsr_tpu.masks.mask import binarize_mask, create_mask
from vsr_tpu.masks.solver import get_inpaint_area_by_mask


class TestCreateMask:
    def test_empty_coords(self):
        mask = create_mask((100, 200), [])
        assert mask.shape == (100, 200)
        assert mask.sum() == 0

    def test_single_box_dilated(self):
        # box (xmin=50, xmax=100, ymin=20, ymax=40), deviation 10
        mask = create_mask((200, 300), [(50, 100, 20, 40)], deviation_pixel=10)
        assert mask[10, 40] == 255  # dilated corner
        assert mask[50, 110] == 255  # inclusive far corner (cv2.rectangle semantics)
        assert mask[9, 40] == 0
        assert mask[10, 39] == 0
        assert mask[51, 110] == 0

    def test_clamped_to_canvas(self):
        mask = create_mask((50, 50), [(0, 100, 0, 100)])
        assert mask.all()

    def test_multiple_boxes(self):
        mask = create_mask((300, 300), [(20, 40, 20, 40), (200, 240, 200, 240)])
        assert mask[30, 30] == 255
        assert mask[220, 220] == 255
        assert mask[120, 120] == 0

    def test_binarize(self):
        mask = create_mask((50, 50), [(10, 20, 10, 20)])
        b = binarize_mask(mask)
        assert b.shape == (50, 50, 1)
        assert set(np.unique(b)) <= {0, 1}


class TestInpaintBandSolver:
    def test_blank_mask(self):
        mask = np.zeros((720, 1280), np.uint8)
        assert get_inpaint_area_by_mask(1280, 720, 240, mask) == []

    def test_single_band_exact_height(self):
        mask = np.zeros((720, 1280), np.uint8)
        mask[600:650, 200:1000] = 255
        bands = get_inpaint_area_by_mask(1280, 720, 240, mask)
        assert len(bands) == 1
        ymin, ymax, xmin, xmax = bands[0]
        assert ymax - ymin == 240
        assert (xmin, xmax) == (0, 1280)
        assert ymin <= 600 and ymax >= 650  # covers the mask

    def test_band_clamped_to_bottom(self):
        mask = np.zeros((720, 1280), np.uint8)
        mask[700:719, 200:1000] = 255
        bands = get_inpaint_area_by_mask(1280, 720, 240, mask)
        (ymin, ymax, _, _) = bands[0]
        assert ymax == 720 and ymax - ymin == 240

    def test_two_distant_islands_two_bands(self):
        mask = np.zeros((720, 1280), np.uint8)
        mask[50:90, 100:1200] = 255     # top watermark
        mask[620:680, 100:1200] = 255   # bottom subtitle
        bands = get_inpaint_area_by_mask(1280, 720, 135, mask)
        assert len(bands) == 2
        for ymin, ymax, _, _ in bands:
            assert ymax - ymin == 135

    def test_close_islands_merged(self):
        mask = np.zeros((720, 1280), np.uint8)
        mask[600:620, 100:1200] = 255
        mask[630:650, 100:1200] = 255  # 10px apart but no bridging pixels
        # no connection between the gaps -> groups stay separate unless mask
        # bridges them; add a bridge
        mask[620:630, 500:520] = 255
        bands = get_inpaint_area_by_mask(1280, 720, 240, mask)
        assert len(bands) == 1
        ymin, ymax, _, _ = bands[0]
        assert ymin <= 600 and ymax >= 650

    def test_noise_speck_ignored(self):
        mask = np.zeros((720, 1280), np.uint8)
        mask[100, 100] = 255  # 1px speck < area threshold
        assert get_inpaint_area_by_mask(1280, 720, 240, mask) == []

    def test_multiple_of_eight(self):
        mask = np.zeros((715, 1280), np.uint8)
        mask[600:650, 200:1000] = 255
        bands = get_inpaint_area_by_mask(1280, 715, 241, mask, multiple=8)
        for ymin, ymax, xmin, xmax in bands:
            assert (ymax - ymin) % 8 == 0
            assert (xmax - xmin) % 8 == 0
            assert 0 <= ymin and ymax <= 715

    def test_mask_with_channel_axis(self):
        mask = np.zeros((720, 1280, 1), np.uint8)
        mask[600:650, 200:1000, 0] = 1
        bands = get_inpaint_area_by_mask(1280, 720, 240, mask)
        assert len(bands) == 1
