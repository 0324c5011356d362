"""Tests for the one-command model bootstrap (vsr_tpu/prepare.py).

Covers the filesplit manifest merge byte-exactly, the orchestration over a
reference-layout tree with synthetic checkpoints (converter stubbed so the
test doesn't need torch/TorchScript blobs for every family), one REAL
converter round trip (sttn-auto via a synthetic torch state dict), and the
CLI flag wiring.
"""

from __future__ import annotations

import csv
import os

import numpy as np
import pytest

from vsr_tpu.prepare import FAMILIES, merge_split_blobs, prepare_models


def _write_split(directory, name, payload, part_size):
    os.makedirs(directory, exist_ok=True)
    stem, ext = os.path.splitext(name)
    rows = []
    for i in range(0, len(payload), part_size):
        part = payload[i : i + part_size]
        fname = f"{stem}_{i // part_size + 1}{ext}"
        with open(os.path.join(directory, fname), "wb") as f:
            f.write(part)
        rows.append({"filename": fname, "filesize": len(part),
                     "encoding": "", "header": ""})
    with open(os.path.join(directory, "fs_manifest.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, ["filename", "filesize", "encoding", "header"])
        w.writeheader()
        w.writerows(rows)


class TestMerge:
    def test_merge_byte_exact(self, tmp_path):
        payload = bytes(range(256)) * 1000 + b"tail"
        d = str(tmp_path / "big-lama")
        _write_split(d, "big-lama.pt", payload, 7001)
        out = merge_split_blobs(d)
        assert out == os.path.join(d, "big-lama.pt")
        with open(out, "rb") as f:
            assert f.read() == payload

    def test_merge_idempotent(self, tmp_path):
        d = str(tmp_path / "m")
        _write_split(d, "ProPainter.pth", b"abcdef", 4)
        first = merge_split_blobs(d)
        mtime = os.path.getmtime(first)
        assert merge_split_blobs(d) == first
        assert os.path.getmtime(first) == mtime  # not rewritten

    def test_no_manifest(self, tmp_path):
        assert merge_split_blobs(str(tmp_path)) is None

    def test_missing_part_raises(self, tmp_path):
        d = str(tmp_path / "m")
        _write_split(d, "x.bin", b"0123456789", 4)
        os.remove(os.path.join(d, "x_2.bin"))
        with pytest.raises(FileNotFoundError):
            merge_split_blobs(d)


class TestPrepare:
    def _layout(self, tmp_path, families):
        src = tmp_path / "models"
        for family, rel, _ in FAMILIES:
            if family in families:
                p = src / rel
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_bytes(b"ckpt")
        return str(src)

    def test_orchestration_with_stub_converter(self, tmp_path):
        src = self._layout(tmp_path, {"sttn-auto", "raft"})
        out = str(tmp_path / "npz")
        calls = []

        def fake_convert(family, path):
            calls.append((family, path))
            return {"params": {"w": np.zeros((2, 2), np.float32)}}

        logs = []
        results = prepare_models(src, out, convert_fn=fake_convert,
                                 log=logs.append)
        assert results["sttn-auto"] == "converted"
        assert results["raft"] == "converted"
        assert all(results[f] == "missing" for f in results
                   if f not in ("sttn-auto", "raft"))
        assert sorted(c[0] for c in calls) == ["raft", "sttn-auto"]
        assert os.path.exists(os.path.join(out, "sttn_auto.npz"))
        assert os.path.exists(os.path.join(out, "raft.npz"))
        assert any("missing sources" in line for line in logs)

        # second run: up to date, converter not re-invoked
        calls.clear()
        results = prepare_models(src, out, convert_fn=fake_convert,
                                 log=logs.append)
        assert results["sttn-auto"] == "exists" and not calls

    def test_split_blob_merged_before_convert(self, tmp_path):
        src = tmp_path / "models"
        _write_split(str(src / "big-lama"), "big-lama.pt", b"blobdata", 3)
        out = str(tmp_path / "npz")
        seen = {}

        def fake_convert(family, path):
            with open(path, "rb") as f:
                seen[family] = f.read()
            return {"params": {"w": np.ones((1,), np.float32)}}

        results = prepare_models(str(src), out,
                                 convert_fn=fake_convert, log=lambda s: None)
        assert results["lama"] == "converted"
        assert seen["lama"] == b"blobdata"

    def test_converter_error_is_isolated(self, tmp_path):
        src = self._layout(tmp_path, {"sttn-auto", "sttn-det"})
        out = str(tmp_path / "npz")

        def fake_convert(family, path):
            if family == "sttn-auto":
                raise ValueError("corrupt checkpoint")
            return {"params": {"w": np.zeros((1,), np.float32)}}

        results = prepare_models(src, out, convert_fn=fake_convert,
                                 log=lambda s: None)
        assert results["sttn-auto"].startswith("error")
        assert results["sttn-det"] == "converted"

    def test_corrupt_split_blob_is_an_error_not_missing(self, tmp_path):
        """ADVICE r4: a failed split-blob merge must surface as 'error: ...'
        for the affected families so the CLI exits nonzero, instead of the
        benign 'missing' a user would read as 'no checkpoint provided'."""
        src = tmp_path / "models"
        _write_split(str(src / "big-lama"), "big-lama.pt", b"blobdata", 3)
        os.remove(str(src / "big-lama" / "big-lama_2.pt"))  # corrupt the set
        results = prepare_models(
            str(src), str(tmp_path / "npz"),
            convert_fn=lambda f, p: {"params": {}}, log=lambda s: None)
        assert results["lama"].startswith("error: split-blob merge failed")
        # unrelated families keep plain 'missing'
        assert results["sttn-auto"] == "missing"

    def test_real_sttn_auto_conversion(self, tmp_path):
        """End-to-end with a REAL synthetic reference checkpoint: a torch
        STTN state dict saved under the reference layout converts into an
        npz the model loader accepts."""
        torch = pytest.importorskip("torch")
        from tests.test_convert import synthetic_torch_state_dict

        sd = {k: torch.from_numpy(v)
              for k, v in synthetic_torch_state_dict(channel=16,
                                                     stack=2).items()}
        src = tmp_path / "models"
        p = src / "sttn-auto"
        p.mkdir(parents=True)
        torch.save({"netG": sd}, str(p / "infer_model.pth"))
        out = str(tmp_path / "npz")
        results = prepare_models(str(src), out, families=["sttn-auto"],
                                 log=lambda s: None)
        assert results == {"sttn-auto": "converted"}

        from vsr_tpu.convert.params_io import load_params

        params = load_params(os.path.join(out, "sttn_auto.npz"))
        assert "params" in params


class TestCliFlag:
    def test_prepare_models_flag(self, tmp_path, monkeypatch):
        from vsr_tpu import cli

        called = {}

        def fake_prepare(src, out):
            called["args"] = (src, out)
            return {"sttn-auto": "converted"}

        import vsr_tpu.prepare as prep

        monkeypatch.setattr(prep, "prepare_models", fake_prepare)
        rc = cli.main(["--prepare-models", str(tmp_path), "--models",
                       str(tmp_path / "o")])
        assert rc == 0
        assert called["args"] == (str(tmp_path), str(tmp_path / "o"))

    def test_prepare_models_error_rc(self, tmp_path, monkeypatch):
        from vsr_tpu import cli
        import vsr_tpu.prepare as prep

        monkeypatch.setattr(prep, "prepare_models",
                            lambda s, o: {"lama": "error: boom"})
        assert cli.main(["--prepare-models", str(tmp_path)]) == 1
