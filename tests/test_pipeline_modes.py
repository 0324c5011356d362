"""Pipeline-mode integration tests: detection-driven video modes and picture
mode, with the detector stubbed (deterministic boxes) and tiny models."""

import os

import cv2
import numpy as np
import pytest

from vsr_tpu.config import Config, InpaintMode
from vsr_tpu.pipeline import SubtitleRemover


@pytest.fixture(scope="module")
def subtitle_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "sub.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (160, 120))
    rng = np.random.default_rng(0)
    base = rng.integers(40, 200, (120, 160, 3), np.uint8)
    for i in range(30):
        frame = np.roll(base, i, axis=1).copy()
        cv2.putText(frame, "SUB", (50, 112), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (255, 255, 255), 1)
        w.write(frame)
    w.release()
    return path


class StubDetector:
    """Deterministic detector: a subtitle box on frames 5..20."""

    def __init__(self, box=(40, 120, 100, 116), frames=range(5, 21)):
        self.box = box
        self.frames = frames

    def find_subtitle_frame_no(self, sub_remover=None):
        return {f: [self.box] for f in self.frames}

    def detect_subtitle(self, img):
        return [self.box]


def base_config(mode):
    cfg = Config()
    cfg.compute_dtype = "float32"
    cfg.inpaint_mode = mode
    cfg.sttn_max_load_num = 10
    cfg.sttn_reference_length = 4
    cfg.sttn_neighbor_stride = 2
    cfg.window_batch = 2
    return cfg


def make_remover(video, out, mode, monkeypatch=None):
    cfg = base_config(mode)
    remover = SubtitleRemover(video, output_path=out, config=cfg)
    remover._detector = StubDetector()
    return remover


def read_back(path):
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return n, frames


def test_opencv_mode_end_to_end(subtitle_video, tmp_path):
    out = str(tmp_path / "cv.mp4")
    remover = make_remover(subtitle_video, out, InpaintMode.OPENCV)
    remover.run()
    n, frames = read_back(out)
    assert n == 30
    assert remover.is_finished


def test_lama_mode_end_to_end(subtitle_video, tmp_path, monkeypatch):
    from vsr_tpu.inpaint import lama as lama_mod

    orig = lama_mod.LamaGenerator
    monkeypatch.setattr(
        lama_mod, "LamaGenerator",
        lambda **kw: orig(**{**kw, "ngf": 8, "n_downsampling": 2, "n_blocks": 1}),
    )
    out = str(tmp_path / "lama.mp4")
    remover = make_remover(subtitle_video, out, InpaintMode.LAMA)
    remover.run()
    n, _ = read_back(out)
    assert n == 30


def test_sttn_det_mode_end_to_end(subtitle_video, tmp_path, monkeypatch):
    from vsr_tpu.inpaint import sttn_det as det_mod

    orig = det_mod.STTNGenerator
    monkeypatch.setattr(
        det_mod, "STTNGenerator",
        lambda **kw: orig(**{**kw, "channel": 16, "stack_num": 1,
                             "patchsizes_override": ((4, 3), (2, 2))}),
    )
    out = str(tmp_path / "det.mp4")
    cfg = base_config(InpaintMode.STTN_DET)
    remover = SubtitleRemover(subtitle_video, output_path=out, config=cfg)
    remover._detector = StubDetector()
    remover._sttn_det = det_mod.STTNDetInpainter(config=cfg, input_size=(64, 48))
    remover.run()
    n, frames = read_back(out)
    assert n == 30


def test_picture_mode_end_to_end(tmp_path, monkeypatch):
    from vsr_tpu.inpaint import lama as lama_mod

    orig = lama_mod.LamaGenerator
    monkeypatch.setattr(
        lama_mod, "LamaGenerator",
        lambda **kw: orig(**{**kw, "ngf": 8, "n_downsampling": 2, "n_blocks": 1}),
    )
    img_path = str(tmp_path / "pic.png")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    cv2.imwrite(img_path, img)
    out = str(tmp_path / "pic_out.png")
    cfg = base_config(InpaintMode.LAMA)
    remover = SubtitleRemover(img_path, output_path=out, config=cfg)
    remover._detector = StubDetector(box=(30, 90, 40, 60))
    remover.run()
    assert os.path.exists(out)
    back = cv2.imread(out)
    assert back.shape == (80, 120, 3)
    # LaMa (like the reference blob) returns the full model output — with
    # random weights the whole image is rewritten; just assert validity
    assert back.dtype == np.uint8


def test_no_subtitles_raises(subtitle_video, tmp_path):
    out = str(tmp_path / "none.mp4")
    remover = make_remover(subtitle_video, out, InpaintMode.OPENCV)

    class EmptyDetector:
        def find_subtitle_frame_no(self, sub_remover=None):
            return {}

    remover._detector = EmptyDetector()
    with pytest.raises(RuntimeError, match="no subtitles"):
        remover.run()


def test_propainter_mode_end_to_end(subtitle_video, tmp_path, monkeypatch):
    """Full propainter-mode pipeline with tiny models, stubbed detector and
    scene cuts; exercises range splitting, lama singleton fallback, batching."""
    from vsr_tpu.inpaint import lama as lama_mod
    from vsr_tpu.inpaint.propainter import PropainterInpainter
    import vsr_tpu.pipeline as pipeline_mod

    orig_lama = lama_mod.LamaGenerator
    monkeypatch.setattr(
        lama_mod, "LamaGenerator",
        lambda **kw: orig_lama(**{**kw, "ngf": 8, "n_downsampling": 2,
                                  "n_blocks": 1}),
    )
    out = str(tmp_path / "pp.mp4")
    cfg = base_config(InpaintMode.PROPAINTER)
    cfg.propainter_max_load_num = 8
    cfg.propainter_raft_iters = 2
    remover = SubtitleRemover(subtitle_video, output_path=out, config=cfg)
    remover._detector = StubDetector()
    remover._propainter = PropainterInpainter(
        config=cfg,
        generator_kwargs=dict(channel=16, hidden=32, depths=2, n_head=2,
                              window_size=(3, 4), pool_size=(2, 2)),
        raft_kwargs=dict(corr_levels=2, corr_radius=2),
    )
    # stub scene detection (tiny video has no cuts anyway; keeps it fast)
    monkeypatch.setattr(
        "vsr_tpu.scenes.content.get_scene_div_frame_no", lambda path: [12])
    remover.run()
    n, frames = read_back(out)
    assert n == 30
    assert remover.is_finished
