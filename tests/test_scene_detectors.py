"""Adaptive/threshold scene detectors + stats CSV: unit behavior plus
differential fuzz vs the EXECUTED reference detectors
(backend/scenedetect/detectors/{adaptive,threshold}_detector.py)."""

import sys

import numpy as np
import pytest

from vsr_tpu.scenes.content import ContentDetectorParams, frame_scores
from vsr_tpu.scenes.detectors import (
    AdaptiveDetector,
    FadeMethod,
    StatsManager,
    ThresholdDetector,
    compute_frame_average,
)


def ref_detectors():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from backend.scenedetect.detectors.adaptive_detector import (
        AdaptiveDetector as RefAdaptive,
    )
    from backend.scenedetect.detectors.threshold_detector import (
        ThresholdDetector as RefThreshold,
    )

    return RefAdaptive, RefThreshold


def fade_video_frames(rng, t=80, h=24, w=32):
    """Random piecewise-constant brightness with occasional fades/cuts."""
    frames = []
    level = 120.0
    for i in range(t):
        r = rng.random()
        if r < 0.08:
            level = rng.uniform(0, 255)  # hard cut
        elif r < 0.25:
            level = np.clip(level + rng.uniform(-40, 40), 0, 255)  # drift
        noise = rng.normal(0, 2, (h, w, 3))
        frames.append(np.clip(level + noise, 0, 255).astype(np.uint8))
    return frames


class TestThresholdDetector:
    def test_fade_cut_midpoint(self):
        det = ThresholdDetector(threshold=12, min_scene_len=5,
                                add_final_scene=False)
        cuts = []
        for i in range(60):
            level = 5 if 20 <= i < 30 else 100
            cuts += det.process_frame(i, np.full((8, 8, 3), level, np.uint8))
        cuts += det.post_process(59)
        assert cuts == [25]  # midway between fade-out (20) and fade-in (30)

    def test_add_final_scene(self):
        det = ThresholdDetector(threshold=12, min_scene_len=5,
                                add_final_scene=True)
        cuts = []
        for i in range(40):
            level = 5 if i >= 20 else 100  # ends faded out
            cuts += det.process_frame(i, np.full((8, 8, 3), level, np.uint8))
        cuts += det.post_process(39)
        assert cuts == [20]

    def test_ceiling_method(self):
        det = ThresholdDetector(threshold=200, min_scene_len=5,
                                method=FadeMethod.CEILING)
        cuts = []
        for i in range(40):
            level = 250 if 10 <= i < 20 else 100  # fade to WHITE
            cuts += det.process_frame(i, np.full((8, 8, 3), level, np.uint8))
        assert cuts == [15]

    def test_fade_bias(self):
        # bias +1.0 places the cut at the fade-in frame
        det = ThresholdDetector(threshold=12, min_scene_len=5, fade_bias=1.0)
        cuts = []
        for i in range(60):
            level = 5 if 20 <= i < 30 else 100
            cuts += det.process_frame(i, np.full((8, 8, 3), level, np.uint8))
        assert cuts == [30]

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_differential_vs_reference(self, seed):
        RefAdaptive, RefThreshold = ref_detectors()
        rng = np.random.default_rng(seed)
        frames = fade_video_frames(rng)
        for kw in [dict(threshold=60, min_scene_len=5, add_final_scene=True),
                   dict(threshold=100, min_scene_len=15, fade_bias=-0.5),
                   dict(threshold=150, min_scene_len=3, fade_bias=1.0)]:
            ref = RefThreshold(**kw)
            ours = ThresholdDetector(**kw)
            ref_cuts, our_cuts = [], []
            for i, f in enumerate(frames):
                ref_cuts += ref.process_frame(i, f)
                our_cuts += ours.process_frame(i, f)
            ref_cuts += ref.post_process(len(frames) - 1)
            our_cuts += ours.post_process(len(frames) - 1)
            assert our_cuts == ref_cuts, (seed, kw)

    def test_frame_average(self):
        f = np.zeros((4, 4, 3), np.uint8)
        f[0, 0] = (255, 255, 255)
        assert compute_frame_average(f) == pytest.approx(255 * 3 / 48)


class TestAdaptiveDetector:
    def scores_of(self, frames):
        import cv2

        hsv = np.stack([cv2.cvtColor(f, cv2.COLOR_BGR2HSV) for f in frames])
        return [0.0] + list(frame_scores(hsv))  # frame 0 scores 0 upstream

    def test_isolated_spike_cut(self):
        det = AdaptiveDetector(adaptive_threshold=3.0, min_scene_len=5,
                               window_width=2, min_content_val=10.0)
        cuts = []
        scores = [0.0, 2.0, 2.0, 2.0, 2.0, 2.0, 40.0, 2.0, 2.0, 2.0, 2.0]
        for i, s in enumerate(scores):
            cuts += det.process_score(i, s)
        assert cuts == [6]

    def test_sustained_motion_suppressed(self):
        # camera pan: every frame scores high -> ratio stays ~1, no cut
        det = AdaptiveDetector(adaptive_threshold=3.0, min_scene_len=5,
                               window_width=2, min_content_val=10.0)
        cuts = []
        for i in range(30):
            cuts += det.process_score(i, 30.0 + (i % 3))
        assert cuts == []

    def test_zero_window_saturates(self):
        det = AdaptiveDetector(adaptive_threshold=3.0, min_scene_len=1,
                               window_width=1, min_content_val=10.0)
        cuts = []
        for i, s in enumerate([0.0, 50.0, 0.0]):
            cuts += det.process_score(i, s)
        assert cuts == [1]  # ratio saturates at 255 when the window is zero

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_differential_vs_reference(self, seed):
        """Same frames through the reference AdaptiveDetector (which scores
        internally via its ContentDetector base) and through our
        score-stream API fed by our content scorer."""
        RefAdaptive, _ = ref_detectors()
        rng = np.random.default_rng(100 + seed)
        frames = []
        img = rng.integers(0, 255, (24, 32, 3), np.uint8)
        for i in range(60):
            if rng.random() < 0.1:
                img = rng.integers(0, 255, (24, 32, 3), np.uint8)  # cut
            else:
                img = np.clip(img.astype(int) + rng.integers(-4, 5, img.shape),
                              0, 255).astype(np.uint8)
            frames.append(img)
        kw = dict(adaptive_threshold=2.5, min_scene_len=5, window_width=2,
                  min_content_val=12.0)
        ref = RefAdaptive(**kw)
        ref_cuts = []
        for i, f in enumerate(frames):
            ref_cuts += ref.process_frame(i, f)
        ours = AdaptiveDetector(**kw)
        our_cuts = []
        for i, s in enumerate(self.scores_of(frames)):
            our_cuts += ours.process_score(i, float(s))
        assert our_cuts == ref_cuts


class TestStatsManager:
    def test_csv_round_trip(self, tmp_path):
        sm = StatsManager()
        sm.set_metrics(0, {"content_val": 1.5})
        sm.set_metrics(1, {"content_val": 2.0, "average_rgb": 99.0})
        path = str(tmp_path / "stats.csv")
        sm.save_to_csv(path)
        sm2 = StatsManager()
        assert sm2.load_from_csv(path) == 2
        assert sm2.get_metrics(1, ["content_val", "average_rgb"]) == [2.0, 99.0]
        assert sm2.get_metrics(0, ["average_rgb"]) == [None]
        assert sm2.metrics_exist(0, ["content_val"])
        assert not sm2.metrics_exist(0, ["average_rgb"])

    def test_detectors_populate_stats(self):
        sm = StatsManager()
        det = AdaptiveDetector(stats_manager=sm, window_width=1)
        for i, s in enumerate([0.0, 5.0, 1.0, 2.0]):
            det.process_score(i, s)
        assert sm.metrics_exist(1, ["content_val", "adaptive_ratio (w=1)"])
        tdet = ThresholdDetector(stats_manager=sm)
        tdet.process_frame(0, np.full((4, 4, 3), 80, np.uint8))
        assert sm.get_metrics(0, ["average_rgb"]) == [80.0]
