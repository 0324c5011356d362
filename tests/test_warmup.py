"""Warmup precompile path (``vsr_tpu --warmup``): each mode's standard
programs compile and execute at the requested geometry (VERDICT r2 item 5 —
the exec-cache pre-population that kills the cold-start wall).

The warmers construct the production inpainter classes; the tests shrink
them to tiny geometries/models via monkeypatched constructors (the warmers
late-import from the inpaint modules) so CI stays fast — production wall is
dominated by TPU compiles the CPU suite can't represent anyway.
"""

import functools

import numpy as np
import pytest

from vsr_tpu.config import Config
from vsr_tpu.warmup import warmup


def small_config():
    cfg = Config()
    cfg.compute_dtype = "float32"
    cfg.sttn_neighbor_stride = 2
    cfg.sttn_reference_length = 2
    cfg.propainter_neighbor_length = 4
    cfg.propainter_ref_stride = 4
    cfg.propainter_subvideo_length = 8
    cfg.propainter_raft_iters = 2
    return cfg


def test_warmup_sttn_and_lama(monkeypatch):
    import vsr_tpu.inpaint.lama as lama_mod
    import vsr_tpu.inpaint.sttn_auto as auto_mod
    import vsr_tpu.inpaint.sttn_det as det_mod

    # auto's production patchsizes don't divide a tiny feature map — shrink
    # them the way test_engine's tiny_model does
    monkeypatch.setattr(
        auto_mod, "STTNGenerator",
        functools.partial(auto_mod.STTNGenerator,
                          patchsizes_override=((4, 3), (2, 2))))
    monkeypatch.setattr(
        auto_mod, "STTNAutoInpainter",
        functools.partial(auto_mod.STTNAutoInpainter, input_size=(32, 24)))
    monkeypatch.setattr(
        det_mod, "STTNGenerator",
        functools.partial(det_mod.STTNGenerator,
                          patchsizes_override=((4, 3), (2, 2))))
    monkeypatch.setattr(
        det_mod, "STTNDetInpainter",
        functools.partial(det_mod.STTNDetInpainter, input_size=(64, 48)))
    monkeypatch.setattr(
        lama_mod, "LamaInpainter",
        functools.partial(lama_mod.LamaInpainter, n_blocks=2))
    done = warmup(
        modes=["sttn-auto", "sttn-det", "lama", "opencv"],
        sizes=[(48, 64)],
        config=small_config(),
        clip_len=6,
    )
    # opencv is host-only: nothing to compile, skipped from the done list
    assert done == ["sttn-auto", "sttn-det", "lama"]


def test_warmup_propainter(monkeypatch):
    import vsr_tpu.inpaint.propainter as pp_mod

    monkeypatch.setattr(
        pp_mod, "PropainterInpainter",
        functools.partial(
            pp_mod.PropainterInpainter,
            generator_kwargs=dict(channel=16, hidden=32, depths=1, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2)))
    # w=344 -> band split_h 64: tall enough for the corr pyramid
    done = warmup(
        modes=["propainter"],
        sizes=[(80, 344)],
        config=small_config(),
        clip_len=8,
    )
    assert done == ["propainter"]


def test_cli_warmup_flag(monkeypatch):
    """--warmup routes through cli.main and exits 0."""
    import vsr_tpu.cli as cli

    calls = {}

    def fake_warmup(**kw):
        calls.update(kw)
        return list(kw["modes"])

    monkeypatch.setattr("vsr_tpu.warmup.warmup", fake_warmup)
    rc = cli.main(["--warmup", "lama", "--warmup-sizes", "48", "64"])
    assert rc == 0
    assert calls["modes"] == ["lama"]
    assert calls["sizes"] == [(48, 64)]
