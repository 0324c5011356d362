"""Browser-GUI tests: HTTP API surface + full task lifecycle.

Covers the reference GUI behaviors the web app replaces (see
vsr_tpu/gui/__init__.py): task queue CRUD, per-task sub-area/AB options
(video_display_component selection persistence), settings read/write with
range metadata, frame/video-info endpoints for the preview canvas, and an
end-to-end run through a real spawned worker subprocess (zero-area
passthrough, the same trick as tests/test_aux.py's TaskRunner test).
"""

import json
import os
import time
import urllib.request

import cv2
import numpy as np
import pytest

from vsr_tpu.config import Config, InpaintMode
from vsr_tpu.gui.server import GuiServer


_TOKEN = [""]  # per-session API token, set by the server fixture


def _req(base, path, body=None, token=None, origin=None):
    headers = {"Content-Type": "application/json",
               "X-VSR-Token": _TOKEN[0] if token is None else token}
    if origin is not None:
        headers["Origin"] = origin
    req = urllib.request.Request(
        base + path,
        data=None if body is None else json.dumps(body).encode(),
        headers=headers,
        method="GET" if body is None else "POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        data = r.read()
        if r.headers.get("Content-Type", "").startswith("application/json"):
            return json.loads(data)
        return data


@pytest.fixture()
def server(tmp_path):
    cfg = Config()
    cfg.compute_dtype = "float32"
    srv = GuiServer(port=0, config=cfg,
                    config_path=str(tmp_path / "config.json"))
    srv.start()
    _TOKEN[0] = srv.token
    yield srv
    srv.stop()


@pytest.fixture()
def video(tmp_path):
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 80))
    for i in range(12):
        w.write(np.full((80, 96, 3), 100 + i, np.uint8))
    w.release()
    return path


def test_index_and_config_roundtrip(server, tmp_path):
    base = server.address
    html = _req(base, "/")
    assert b"vsr_tpu" in html and b"frameCanvas" in html

    got = _req(base, "/api/config")
    assert got["config"]["inpaint_mode"] == "sttn-auto"
    assert got["meta"]["sttn_max_load_num"] == {"min": 1, "max": 300}

    _req(base, "/api/config", {"inpaint_mode": "lama",
                               "sttn_max_load_num": 60})
    got = _req(base, "/api/config")
    assert got["config"]["inpaint_mode"] == "lama"
    assert got["config"]["sttn_max_load_num"] == 60
    # persisted like the reference's qconfig.save
    saved = Config.load(str(tmp_path / "config.json"))
    assert saved.inpaint_mode == InpaintMode.LAMA


def test_api_rejects_cross_origin_and_missing_token(server):
    """CSRF hardening: /api/* requires the per-session token, and requests
    bearing a foreign Origin are rejected even with it."""
    base = server.address
    html = _req(base, "/")
    assert server.token.encode() in html  # page receives the session token

    for path, body in [("/api/state", None), ("/api/config", None),
                       ("/api/tasks", {"paths": ["/etc/hostname"]}),
                       ("/api/run", {}),
                       ("/api/video_info?path=/etc/hostname", None)]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(base, path, body, token="")
        assert e.value.code == 403
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(base, "/api/state", origin="http://evil.example")
    assert e.value.code == 403
    # same-origin with the token still works
    host = base.split("//", 1)[1]
    assert "tasks" in _req(base, "/api/state", origin=f"http://{host}")
    # <img> URLs pass the token as a query parameter
    req = urllib.request.Request(f"{base}/api/state?token={server.token}")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 200


def test_preview_follows_task_after_removal(server, video):
    """Previews are keyed by task identity, not queue position: removing a
    lower-index task must not remap a live preview onto the wrong task."""
    base = server.address
    _req(base, "/api/tasks", {"paths": [video, video]})
    uid1 = server.manager.tasks[1].uid
    server.manager._previews[uid1] = b"jpegbytes"
    assert _req(base, "/api/state")["tasks"][1]["has_preview"]
    assert _req(base, "/api/task/0/remove", {})["removed"]
    st = _req(base, "/api/state")
    assert st["tasks"][0]["has_preview"]  # shifted task kept its preview
    assert _req(base, "/api/preview/0") == b"jpegbytes"


def test_i18n_endpoint(server):
    base = server.address
    labels = _req(base, "/api/i18n")
    assert labels["Tasks"] == "Tasks"
    meta = _req(base, "/api/config")["meta"]
    assert "ch" in meta["interface"]["choices"]
    _req(base, "/api/config", {"interface": "ch"})
    labels = _req(base, "/api/i18n")
    assert labels["Tasks"] == "任务"


def test_task_crud_and_options(server, video):
    base = server.address
    added = _req(base, "/api/tasks", {"paths": [video, video]})
    assert added["added"] == [0, 1]

    st = _req(base, "/api/state")
    assert len(st["tasks"]) == 2
    assert st["tasks"][0]["status"] == "pending"
    assert st["tasks"][0]["output_path"].endswith("clip_no_sub.mp4")

    ok = _req(base, f"/api/task/0/options",
              {"sub_areas": [[60, 78, 10, 90]], "ab_sections": [[2, 9]]})
    assert ok["updated"]
    st = _req(base, "/api/state")
    assert st["tasks"][0]["sub_areas"] == [[60, 78, 10, 90]]
    assert st["tasks"][0]["ab_sections"] == [[2, 9]]

    assert _req(base, "/api/task/1/remove", {})["removed"]
    st = _req(base, "/api/state")
    assert len(st["tasks"]) == 1


def test_video_info_and_frame(server, video):
    base = server.address
    info = _req(base, f"/api/video_info?path={video}")
    assert (info["frames"], info["width"], info["height"]) == (12, 96, 80)
    jpeg = _req(base, f"/api/frame?path={video}&frame=3")
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (80, 96, 3)
    # missing preview -> 404
    with pytest.raises(urllib.error.HTTPError):
        _req(base, "/api/preview/0")


class _ThreadProc:
    """Process-shim running the worker in-process so the tiny-model
    monkeypatch reaches it (the real subprocess spawn path is covered by
    tests/test_aux.py's TaskRunner test — same RemoteCall machinery)."""

    def __init__(self, target, args):
        import threading

        self.exitcode = None
        self.pid = os.getpid()

        def run():
            target(*args)
            self.exitcode = 0

        self._t = threading.Thread(target=run, daemon=True)

    def start(self):
        self._t.start()

    def join(self, timeout=None):
        self._t.join(timeout)

    def is_alive(self):
        return self._t.is_alive()

    def terminate(self):
        pass


def test_end_to_end_run(server, video, monkeypatch, tmp_path):
    """Add -> run -> completed -> preview bytes, with a 2-block STTN."""
    from tests.test_pipeline import patch_tiny_sttn

    patch_tiny_sttn(monkeypatch)
    from vsr_tpu.gui import manager as mgr_mod

    def thread_spawn(task, output, queue):
        proc = _ThreadProc(
            mgr_mod._gui_worker,
            (task.path, output, task.options,
             server.manager.config.to_json(), queue))
        proc.start()
        return proc

    monkeypatch.setattr(server.manager, "_spawn", thread_spawn)
    monkeypatch.setattr(mgr_mod, "PREVIEW_MIN_INTERVAL_S", 0.0)

    base = server.address
    cfg_updates = {"compute_dtype": "float32", "sttn_max_load_num": 6,
                   "sttn_reference_length": 3, "sttn_neighbor_stride": 2}
    _req(base, "/api/config", cfg_updates)
    out = str(tmp_path / "out.mp4")
    _req(base, "/api/tasks", {"paths": [video]})
    _req(base, "/api/task/0/options",
         {"sub_areas": [[60, 78, 10, 90]], "output_path": out})
    assert _req(base, "/api/run", {})["started"]

    deadline = time.time() + 120
    status = None
    while time.time() < deadline:
        st = _req(base, "/api/state")
        status = st["tasks"][0]["status"]
        if status in ("completed", "failed"):
            break
        time.sleep(0.5)
    assert status == "completed", st["tasks"][0].get("error")
    assert st["tasks"][0]["progress"] == 100
    assert os.path.exists(out)
    # the live preview stream produced a decodable side-by-side jpeg
    jpeg = _req(base, "/api/preview/0")
    img = cv2.imdecode(np.frombuffer(jpeg, np.uint8), cv2.IMREAD_COLOR)
    assert img is not None and img.shape[1] > img.shape[0]  # hconcat pair


def test_image_task_locked_to_lama(server, tmp_path):
    """Image tasks force inpaint_mode=lama for the worker and surface the
    lock in /api/state, mirroring the reference GUI's image-mode lock
    (ui/home_interface.py:619-631)."""
    from vsr_tpu.config import InpaintMode

    img_path = str(tmp_path / "pic.png")
    cv2.imwrite(img_path, np.full((40, 60, 3), 90, np.uint8))

    base = server.address
    _req(base, "/api/config", {"inpaint_mode": "sttn-auto"})
    _req(base, "/api/tasks", {"paths": [img_path]})
    st = _req(base, "/api/state")
    assert st["tasks"][0]["is_image"] is True
    assert st["tasks"][0]["inpaint_mode"] == "lama"

    mgr = server.manager
    task = mgr.tasks[0]
    # the config handed to the worker subprocess is the locked one ...
    eff = mgr.effective_config(task)
    assert eff.inpaint_mode == InpaintMode.LAMA
    # ... the user's global selection is untouched ...
    assert mgr.config.inpaint_mode == InpaintMode.STTN_AUTO
    # ... and a video task keeps the user's mode (no lock)
    vid = str(tmp_path / "clip2.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 24, (96, 80))
    w.write(np.zeros((80, 96, 3), np.uint8))
    w.release()
    _req(base, "/api/tasks", {"paths": [vid]})
    st = _req(base, "/api/state")
    assert st["tasks"][1]["is_image"] is False
    assert st["tasks"][1]["inpaint_mode"] == "sttn-auto"
