"""I/O layer tests: reader/writer round trip, prefetcher, audio remux fallback."""

import os

import cv2
import numpy as np
import pytest

from vsr_tpu.io.video import (
    FramePrefetcher,
    VideoReader,
    VideoWriter,
    read_all_frames,
    read_video_info,
)
from vsr_tpu.io.audio import merge_audio_to_video


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    """Synthesize a 32-frame 160x120 gradient video."""
    path = str(tmp_path_factory.mktemp("vid") / "tiny.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (160, 120))
    for i in range(32):
        frame = np.full((120, 160, 3), i * 8 % 256, np.uint8)
        frame[:, :40, 0] = 255
        w.write(frame)
    w.release()
    return path


def test_video_info(tiny_video):
    info = read_video_info(tiny_video)
    assert (info.width, info.height) == (160, 120)
    assert info.frame_count == 32
    assert info.fps == pytest.approx(25, abs=0.5)


def test_reader_reads_all(tiny_video):
    frames = read_all_frames(tiny_video)
    assert len(frames) == 32
    assert frames[0].shape == (120, 160, 3)
    assert frames[0].dtype == np.uint8


def test_prefetcher_matches_reader(tiny_video):
    direct = read_all_frames(tiny_video)
    pf = FramePrefetcher(VideoReader(tiny_video), buffer_size=4)
    fetched = []
    while True:
        ok, frame = pf.read()
        if not ok:
            break
        fetched.append(frame)
    pf.release()
    assert len(fetched) == len(direct)
    for a, b in zip(direct, fetched):
        np.testing.assert_array_equal(a, b)


def test_prefetcher_early_stop(tiny_video):
    pf = FramePrefetcher(VideoReader(tiny_video), buffer_size=2)
    ok, _ = pf.read()
    assert ok
    pf.release()  # must not hang with a full queue


def test_writer_round_trip(tmp_path, tiny_video):
    frames = read_all_frames(tiny_video)
    out = str(tmp_path / "out.mp4")
    writer = VideoWriter(out, 25, (160, 120))
    for f in frames:
        writer.write(f)
    writer.release()
    assert writer.frames_written == 32
    back = read_all_frames(out)
    assert len(back) == 32
    # lossy codec: just check gross structure survived
    assert np.abs(back[5].astype(int) - frames[5].astype(int)).mean() < 16


def test_writer_accepts_float_frames(tmp_path):
    out = str(tmp_path / "f.mp4")
    writer = VideoWriter(out, 25, (64, 48), force_cv2=True)
    writer.write(np.full((48, 64, 3), 300.0))  # clipped to 255
    writer.release()
    assert os.path.getsize(out) > 0


def _fake_ffmpeg(tmp_path, script_body: str) -> str:
    fake = tmp_path / "fake_ffmpeg"
    fake.write_text(f"#!/bin/sh\n{script_body}\n")
    fake.chmod(0o755)
    return str(fake)


def test_writer_raises_when_encoder_dies_midstream(tmp_path, monkeypatch):
    """An encoder that dies mid-run must surface as an error, not a silently
    truncated file (VERDICT weak #6)."""
    import vsr_tpu.io.video as vio

    fake = _fake_ffmpeg(tmp_path, "head -c 1000 > /dev/null\nexit 1")
    monkeypatch.setattr(vio, "find_ffmpeg", lambda: fake)
    writer = vio.VideoWriter(str(tmp_path / "dead.mp4"), 25, (64, 48))
    frame = np.zeros((48, 64, 3), np.uint8)
    with pytest.raises(IOError):
        for _ in range(300):  # >> pipe buffer, forces EPIPE
            writer.write(frame)
        writer.release()


def test_writer_release_checks_returncode(tmp_path, monkeypatch):
    import vsr_tpu.io.video as vio

    fake = _fake_ffmpeg(tmp_path, "cat > /dev/null\nexit 3")
    monkeypatch.setattr(vio, "find_ffmpeg", lambda: fake)
    writer = vio.VideoWriter(str(tmp_path / "rc.mp4"), 25, (64, 48))
    writer.write(np.zeros((48, 64, 3), np.uint8))
    with pytest.raises(IOError):
        writer.release()


def test_audio_merge_falls_back_without_audio(tmp_path, tiny_video):
    # tiny_video has no audio stream; with or without ffmpeg the call must
    # produce the output and report merged=False.
    out = str(tmp_path / "merged.mp4")
    merged = merge_audio_to_video(tiny_video, tiny_video, out)
    assert os.path.exists(out)
    assert merged is False


def test_ffmpeg_reader_gated(tiny_video):
    """FFmpegVideoReader matches cv2 decode when ffmpeg exists; otherwise the
    factory falls back cleanly."""
    from vsr_tpu.io.ffmpeg import find_ffmpeg
    from vsr_tpu.io.video import FFmpegVideoReader, open_reader

    reader = open_reader(tiny_video, prefer_ffmpeg=True)
    if find_ffmpeg() is None:
        assert isinstance(reader, VideoReader)
        reader.release()
        with pytest.raises(RuntimeError):
            FFmpegVideoReader(tiny_video)
        return
    direct = read_all_frames(tiny_video)
    got = []
    while True:
        ok, f = reader.read()
        if not ok:
            break
        got.append(f)
    reader.release()
    assert len(got) == len(direct)
    assert got[0].shape == direct[0].shape
