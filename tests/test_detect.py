"""Detection stack tests: DBNet shapes, postprocess decoding on synthetic prob
maps, preprocessing geometry, and the end-to-end detector on a tiny video."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.detect.boxes import get_coordinates
from vsr_tpu.detect.dbnet import DBNet
from vsr_tpu.detect.postprocess import db_postprocess
from vsr_tpu.detect.preprocess import det_resize_shape, preprocess_frame, scale_factors


class TestPreprocess:
    def test_resize_shape_long_side(self):
        rh, rw = det_resize_shape(720, 1280, 960)
        assert rw == 960 and rh % 32 == 0
        assert abs(rh - 720 * 960 / 1280) <= 32

    def test_resize_divisible(self):
        for h, w in [(720, 1280), (1080, 1920), (480, 640), (33, 1000)]:
            rh, rw = det_resize_shape(h, w)
            assert rh % 32 == 0 and rw % 32 == 0

    def test_preprocess_normalization(self):
        frame = np.full((64, 128, 3), 255, np.uint8)
        out = preprocess_frame(frame)
        # 255 -> 1.0 -> (1 - mean)/std per channel
        np.testing.assert_allclose(
            out[0, 0], (1.0 - np.array([0.485, 0.456, 0.406]))
            / np.array([0.229, 0.224, 0.225]), rtol=1e-5)


class TestGetCoordinates:
    def test_quad_to_bbox(self):
        quad = [[10.2, 20.7], [100.9, 21.0], [100.0, 50.0], [10.0, 49.0]]
        assert get_coordinates([quad]) == [(10, 100, 20, 50)]


class TestDBPostprocess:
    def make_prob(self, h=160, w=320):
        prob = np.zeros((h, w), np.float32)
        prob[100:130, 40:280] = 0.9  # a confident text bar
        return prob

    def test_finds_box(self):
        prob = self.make_prob()
        boxes = db_postprocess(prob, (160, 320))
        assert len(boxes) == 1
        box = boxes[0]
        xs, ys = box[:, 0], box[:, 1]
        # unclipped box contains the original region
        assert xs.min() <= 40 and xs.max() >= 280
        assert ys.min() <= 100 and ys.max() >= 130

    def test_low_confidence_rejected(self):
        prob = np.zeros((160, 320), np.float32)
        prob[100:130, 40:280] = 0.4  # above thresh but below box_thresh
        assert db_postprocess(prob, (160, 320)) == []

    def test_scales_to_dest(self):
        prob = self.make_prob()
        boxes = db_postprocess(prob, (320, 640))  # 2x dest
        xs = boxes[0][:, 0]
        assert xs.max() >= 560  # 280 * 2

    def test_tiny_noise_ignored(self):
        prob = np.zeros((160, 320), np.float32)
        prob[50, 50] = 0.99
        assert db_postprocess(prob, (160, 320)) == []

    def test_empty_map(self):
        assert db_postprocess(np.zeros((64, 64), np.float32), (64, 64)) == []


# tiny PPHGNetV2 stage config for fast server-preset tests
# (in, mid, out, blocks, downsample, light, kernel, layer_num)
TINY_HG_STAGES = (
    (16, 8, 16, 1, False, False, 3, 2),
    (16, 8, 32, 1, True, False, 3, 2),
    (32, 8, 48, 1, True, True, 3, 2),
    (48, 8, 64, 1, True, True, 3, 2),
)


def tiny_dbnet(preset: str) -> DBNet:
    if preset == "server":
        return DBNet(preset="server", hg_stages=TINY_HG_STAGES,
                     fpn_channels=32)
    return DBNet(preset="mobile", lcnet_scale=0.25, fpn_channels=32)


class TestDBNetModel:
    @pytest.mark.parametrize("preset", ["server", "mobile"])
    def test_forward_shapes(self, preset):
        model = tiny_dbnet(preset)
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        prob = model.apply(params, x)
        assert prob.shape == (1, 64, 96, 1)
        assert 0.0 <= float(prob.min()) and float(prob.max()) <= 1.0

    def test_train_mode_outputs(self):
        model = tiny_dbnet("mobile")
        x = jnp.zeros((1, 64, 96, 3))
        params = model.init(jax.random.PRNGKey(0), x, train=True)
        outs = model.apply(params, x, train=True)
        maps, base, cbn, thresh, binary = outs
        for o in (maps, base, cbn, thresh, binary):
            assert o.shape == (1, 64, 96, 1)


class TestDetectorEndToEnd:
    @pytest.fixture(scope="class")
    def tiny_video(self, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("det") / "v.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (128, 96))
        for i in range(12):
            frame = np.full((96, 128, 3), 30, np.uint8)
            w.write(frame)
        w.release()
        return path

    def test_find_subtitle_frame_no_with_stub_model(self, tiny_video, monkeypatch):
        """Stub the device forward with a synthetic prob map to test the
        sampling/batching/interpolation plumbing deterministically."""
        from vsr_tpu.detect.detector import SubtitleDetector

        det = SubtitleDetector(tiny_video, batch_size=4)

        def fake_detect_batch(frames):
            boxes = [(20, 110, 70, 90)]
            return [list(boxes) for _ in frames]

        monkeypatch.setattr(det, "_detect_batch", fake_detect_batch)
        result = det.find_subtitle_frame_no()
        assert result
        # sampling step for 24fps video is 2; gaps interpolated -> contiguous
        keys = sorted(result.keys())
        assert keys[0] == 1
        assert keys == list(range(keys[0], keys[-1] + 1))
        assert result[keys[0]] == [(20, 110, 70, 90)]

    def test_area_filter(self, tiny_video, monkeypatch):
        from vsr_tpu.detect.detector import SubtitleDetector

        det = SubtitleDetector(tiny_video, sub_areas=[(60, 96, 0, 128)],
                               batch_size=4)
        monkeypatch.setattr(
            det, "_detect_batch",
            lambda frames: [[(20, 110, 70, 90), (20, 110, 5, 30)] for _ in frames],
        )
        boxes = det.detect_subtitle(np.zeros((96, 128, 3), np.uint8))
        assert boxes == [(20, 110, 70, 90)]  # top box outside the area dropped

    def test_real_model_smoke(self, tiny_video):
        """Full path with the real (random-weight) DBNet on one small frame."""
        from vsr_tpu.detect.detector import SubtitleDetector

        det = SubtitleDetector(tiny_video, batch_size=2)
        det._model = tiny_dbnet("mobile")
        out = det.detect_subtitle(np.zeros((96, 128, 3), np.uint8))
        assert isinstance(out, list)
