"""Scene detection tests: scoring math, cut decisions, min-scene-len gate."""

import cv2
import numpy as np
import pytest

from vsr_tpu.scenes.content import (
    ContentDetectorParams,
    compute_downscale_factor,
    detect_scene_cuts,
    frame_scores,
    get_scene_div_frame_no,
)


class TestScoring:
    def test_identical_frames_zero(self):
        hsv = np.zeros((3, 8, 8, 3), np.uint8)
        np.testing.assert_allclose(frame_scores(hsv), [0.0, 0.0])

    def test_uniform_shift(self):
        hsv = np.zeros((2, 8, 8, 3), np.int32)
        hsv[1] = 30  # all three channels shift by 30
        np.testing.assert_allclose(frame_scores(hsv), [30.0])

    def test_weighting(self):
        hsv = np.zeros((2, 8, 8, 3), np.int32)
        hsv[1, ..., 2] = 90  # only lum changes
        score = frame_scores(hsv, weights=(1.0, 1.0, 1.0))
        np.testing.assert_allclose(score, [30.0])

    def test_downscale_factor(self):
        assert compute_downscale_factor(100) == 1
        assert compute_downscale_factor(1280) == 5
        assert compute_downscale_factor(256) == 1


@pytest.fixture(scope="module")
def cutty_video(tmp_path_factory):
    """60 frames: scene A (0-29, dark), hard cut to scene B (30-59, bright)."""
    path = str(tmp_path_factory.mktemp("scene") / "cuts.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 240))
    for i in range(60):
        level = 20 if i < 30 else 230
        frame = np.full((240, 320, 3), level, np.uint8)
        w.write(frame)
    w.release()
    return path


class TestDetection:
    def test_single_cut_found(self, cutty_video):
        cuts = detect_scene_cuts(cutty_video)
        assert cuts == [30]

    def test_div_frame_no_is_one_based(self, cutty_video):
        assert get_scene_div_frame_no(cutty_video) == [31]

    def test_high_threshold_no_cuts(self, cutty_video):
        cuts = detect_scene_cuts(
            cutty_video, ContentDetectorParams(threshold=250.0))
        assert cuts == []

    def test_min_scene_len_gates_early_cut(self, tmp_path):
        # cut at frame 5 < min_scene_len 15 -> suppressed
        path = str(tmp_path / "early.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        for i in range(20):
            level = 20 if i < 5 else 230
            w.write(np.full((64, 64, 3), level, np.uint8))
        w.release()
        assert detect_scene_cuts(path) == []

    def test_batch_boundary_consistency(self, cutty_video):
        # tiny batches must give the same cuts as one big batch
        assert detect_scene_cuts(cutty_video, batch=7) == [30]
