"""Auxiliary subsystem tests: tracing, process manager, remote call channel,
task queue, i18n."""

import multiprocessing
import os
import subprocess
import sys
import time

import cv2
import numpy as np
import pytest

from vsr_tpu.i18n import Translator, tr
from vsr_tpu.utils.process_manager import ProcessManager
from vsr_tpu.utils.remote_call import Command, RemoteCallChannel, RemoteCallClient
from vsr_tpu.utils.tracing import StageTimer, device_trace


class TestStageTimer:
    def test_spans_accumulate(self):
        timer = StageTimer()
        with timer.span("work"):
            time.sleep(0.01)
        with timer.span("work"):
            time.sleep(0.01)
        s = timer.summary()
        assert s["work"]["count"] == 2
        assert s["work"]["total_s"] >= 0.02
        assert "work" in timer.report()

    def test_device_trace_noop_without_env(self, monkeypatch):
        monkeypatch.delenv("VSR_TRACE_DIR", raising=False)
        with device_trace("x"):
            pass  # must not require jax or a trace dir


class TestProcessManager:
    def test_terminate_subprocess(self):
        pm = ProcessManager.instance()
        proc = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
        pm.add_process(proc)
        assert pm.alive_count() >= 1
        pm.terminate_all(timeout=2)
        assert proc.poll() is not None
        assert pm.alive_count() == 0


class TestRemoteCall:
    def test_round_trip(self):
        channel = RemoteCallChannel()
        got = {}
        channel.register(Command.PROGRESS, lambda p: got.update(progress=p))
        channel.register(Command.LOG, lambda p: got.update(log=p))
        channel.register(Command.FINISH, lambda p: got.update(finish=p))
        channel.start()
        client = RemoteCallClient(channel.queue)
        client.progress(42)
        client.log("hello")
        client.finish("/tmp/out.mp4")
        time.sleep(0.5)
        channel.stop()
        assert got["progress"]["percent"] == 42
        assert got["log"]["message"] == "hello"
        assert got["finish"]["output"] == "/tmp/out.mp4"


class TestI18n:
    def test_english_default(self):
        assert "finished" in tr.text("Main", "FinishedProcessing", "x")
        assert tr["InpaintMode"]["LAMA"] == "LaMa"

    def test_format_args(self):
        assert tr.text("Main", "NoSubtitleDetected", "v.mp4") == (
            "no subtitles detected in v.mp4")

    def test_missing_key_falls_back(self):
        assert tr.text("Main", "NoSuchKey") == "NoSuchKey"

    def test_locale_override(self, tmp_path):
        ini = tmp_path / "xx.ini"
        ini.write_text("[Main]\nFinishedProcessing = fertig: {}\n")
        t = Translator("xx", locale_dir=str(tmp_path))
        assert t.text("Main", "FinishedProcessing", "f") == "fertig: f"
        # untranslated keys fall back to English
        assert t.text("InpaintMode", "LAMA") == "LaMa"


class TestTaskModel:
    def test_default_output_paths(self):
        from vsr_tpu.tasks import Task

        t = Task(path="/data/movie.mp4")
        assert t.default_output_path() == "/data/movie_no_sub.mp4"
        t2 = Task(path="/data/pic.png")
        assert t2.default_output_path() == "/data/no_sub/pic.png"

    def test_task_runner_opencv_end_to_end(self, tmp_path, monkeypatch):
        """Full subprocess task: tiny video through the passthrough path."""
        monkeypatch.setenv("VSR_TPU_PLATFORM", "cpu")
        from vsr_tpu.config import Config, InpaintMode
        from vsr_tpu.tasks import TaskOptions, TaskRunner, TaskStatus

        video = str(tmp_path / "v.mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 80))
        for i in range(12):
            w.write(np.full((80, 96, 3), 100 + i, np.uint8))
        w.release()

        cfg = Config()
        cfg.inpaint_mode = InpaintMode.STTN_AUTO
        cfg.compute_dtype = "float32"
        cfg.sttn_max_load_num = 6
        cfg.sttn_reference_length = 3
        cfg.sttn_neighbor_stride = 2
        # zero-area selection -> passthrough (no model weights needed in the
        # subprocess; exercises the full IPC/task lifecycle quickly)
        runner = TaskRunner(config=cfg)
        out = str(tmp_path / "out.mp4")
        task = runner.add(video, TaskOptions(sub_areas=[(0, 0, 0, 0)]),
                          output_path=out)
        runner.run_all()
        assert task.status == TaskStatus.COMPLETED, task.error
        assert task.progress == 100
        assert os.path.exists(out)


class TestCommonUtils:
    def test_file_type_checks(self):
        from vsr_tpu.utils.common import is_image_file, is_video_file, is_video_or_image

        assert is_image_file("x.PNG") and not is_video_file("x.png")
        assert is_video_file("a.mkv") and is_video_or_image("a.mkv")
        assert not is_video_or_image("a.txt")

    def test_unicode_safe_image_io(self, tmp_path):
        from vsr_tpu.utils.common import read_image, write_image

        path = str(tmp_path / "图片_тест.png")
        img = np.full((20, 30, 3), 77, np.uint8)
        assert write_image(path, img)
        back = read_image(path)
        np.testing.assert_array_equal(back, img)

    def test_merge_side_by_side(self, tmp_path):
        from vsr_tpu.utils.common import merge_videos_side_by_side

        def mk(path, level):
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
            for _ in range(6):
                w.write(np.full((48, 64, 3), level, np.uint8))
            w.release()

        a, b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
        mk(a, 50)
        mk(b, 200)
        out = str(tmp_path / "sbs.mp4")
        n = merge_videos_side_by_side(a, b, out)
        assert n == 6
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 128
        cap.release()


def test_packaged_chinese_locale():
    t = Translator("ch")
    assert t.text("Main", "FinishedProcessing", "x") == "完成: x"
    assert t.text("InpaintMode", "LAMA") == "LaMa"
