"""End-to-end pipeline tests on synthetic video (sttn-auto mode, tiny model).

Uses a patched-down STTN (tiny channels/patches still at 640x120 input) so the
full streaming path — prefetch, chunking, band solve, engine, paste-back,
encode — runs in seconds on CPU.
"""

import os

import cv2
import numpy as np
import pytest

from vsr_tpu.config import Config, InpaintMode
from vsr_tpu.pipeline import SubtitleRemover, is_image_file


@pytest.fixture(scope="module")
def subtitle_video(tmp_path_factory):
    """48-frame 320x240 video with a high-contrast 'subtitle' bar at the bottom."""
    path = str(tmp_path_factory.mktemp("vid") / "sub.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (320, 240))
    rng = np.random.default_rng(0)
    base = rng.integers(40, 200, (240, 320, 3), np.uint8)
    for i in range(48):
        frame = np.roll(base, i, axis=1).copy()
        cv2.putText(frame, "SUBTITLE", (60, 225), cv2.FONT_HERSHEY_SIMPLEX,
                    0.8, (255, 255, 255), 2)
        w.write(frame)
    w.release()
    return path


def tiny_config():
    cfg = Config()
    cfg.compute_dtype = "float32"
    cfg.sttn_max_load_num = 12
    cfg.sttn_reference_length = 5
    cfg.sttn_neighbor_stride = 3
    cfg.window_batch = 2
    return cfg


def patch_tiny_sttn(monkeypatch):
    """Shrink the STTN to 2 blocks / 16ch for CPU-speed e2e tests."""
    from vsr_tpu.inpaint import sttn_auto as mod

    orig = mod.STTNGenerator

    def tiny(*, variant, dtype, **kw):
        return orig(variant=variant, dtype=dtype, channel=16, stack_num=2)

    monkeypatch.setattr(mod, "STTNGenerator", tiny)


def test_is_image_file():
    assert is_image_file("a.png") and is_image_file("b.JPG")
    assert not is_image_file("c.mp4")


def test_sttn_auto_end_to_end(subtitle_video, tmp_path, monkeypatch):
    patch_tiny_sttn(monkeypatch)
    out = str(tmp_path / "out.mp4")
    cfg = tiny_config()
    cfg.inpaint_mode = InpaintMode.STTN_AUTO
    remover = SubtitleRemover(
        subtitle_video, output_path=out,
        sub_areas=[(200, 240, 40, 280)],  # ymin ymax xmin xmax
        config=cfg,
    )
    progress = []
    remover.add_progress_listener(lambda p, done: progress.append(p))
    remover.run()

    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok, frame = cap.read()
    cap.release()
    assert n == 48 and ok
    assert frame.shape == (240, 320, 3)
    assert remover.is_finished
    assert progress and progress[-1] >= 99
    # masked band was rewritten by the (random-weight) model: frames differ
    # from source inside the band
    src = cv2.VideoCapture(subtitle_video)
    _, src_frame = src.read()
    src.release()
    band_diff = np.abs(
        frame[200:240].astype(int) - src_frame[200:240].astype(int)
    ).mean()
    assert band_diff > 1.0


def test_sttn_auto_no_mask_passthrough(subtitle_video, tmp_path, monkeypatch):
    """Empty mask (zero-area selection) must stream frames through untouched."""
    patch_tiny_sttn(monkeypatch)
    out = str(tmp_path / "pass.mp4")
    cfg = tiny_config()
    remover = SubtitleRemover(
        subtitle_video, output_path=out,
        sub_areas=[(0, 0, 0, 0)],
        config=cfg,
    )
    remover.run()
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 48
    cap.release()


def test_opencv_inpainter_contract():
    from vsr_tpu.inpaint.opencv import OpenCVInpainter

    frames = [np.full((64, 64, 3), 128, np.uint8) for _ in range(3)]
    mask = np.zeros((64, 64), np.uint8)
    mask[20:40, 20:40] = 255
    out = OpenCVInpainter()(frames, mask)
    assert len(out) == 3 and out[0].shape == (64, 64, 3)


def test_frame_count_cap(subtitle_video, tmp_path, monkeypatch):
    """process_video must not write more frames than frame_count even when
    the reader yields extras (metadata undercount)."""
    patch_tiny_sttn(monkeypatch)
    cfg = tiny_config()
    remover = SubtitleRemover(
        subtitle_video, output_path=str(tmp_path / "cap.mp4"),
        sub_areas=[(200, 240, 40, 280)], config=cfg,
    )
    remover.frame_count = 20  # pretend metadata says fewer frames
    remover.run()
    cap = cv2.VideoCapture(str(tmp_path / "cap.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    cap.release()
