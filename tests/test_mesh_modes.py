"""Multi-chip (mesh) modes for the non-STTN inpainters (VERDICT r4 #5).

SURVEY §2c names temporal-window sharding as THE scaling path for the whole
tool, not one mode; round 4 had it only in the STTN engine. These tests pin
the round-5 generalization on the 8-virtual-device CPU mesh:

  * ProPainter: the static transformer-window sweep shards its window-batch
    axis over 'data' (inpaint/propainter.py _window_compose);
  * LaMa: the band path's frame mini-batch shards over 'data'
    (inpaint/lama.py _build_forward/_inpaint_band).

Each must reproduce the single-device composite (<=1 uint8, same bar as
tests/test_engine.py::TestMeshSharding — cross-device reduction order can
flip the last rounding bit)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vsr_tpu.config import Config


def _diff_ok(a, b, frac=0.01):
    d = np.abs(np.asarray(a).astype(int) - np.asarray(b).astype(int))
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() <= frac, (d > 0).mean()


class TestPropainterMesh:
    def test_sharded_window_sweep_matches_single_device(self, cpu_mesh):
        from vsr_tpu.inpaint.propainter import PropainterInpainter

        cfg = Config()
        cfg.compute_dtype = "float32"
        cfg.propainter_raft_iters = 2
        kw = dict(
            config=cfg,
            generator_kwargs=dict(channel=16, hidden=32, depths=1, n_head=2,
                                  window_size=(3, 4), pool_size=(2, 2)),
            raft_kwargs=dict(corr_levels=2, corr_radius=2),
        )
        rng = np.random.default_rng(31)
        frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(8)]
        mask = np.zeros((48, 64), np.uint8)
        mask[16:32, 16:48] = 255

        single = PropainterInpainter(**kw)
        # share weights so the comparison is purely about sharding
        sharded = PropainterInpainter(mesh=cpu_mesh, **kw)
        sharded.raft_params = single.raft_params
        sharded.flow_params = single.flow_params
        sharded.gen_params = single.gen_params

        a = single.inpaint([f.copy() for f in frames], mask)
        b = sharded.inpaint([f.copy() for f in frames], mask)
        for fa, fb in zip(a, b):
            _diff_ok(fa, fb)


class TestLamaMesh:
    def test_sharded_band_batch_matches_single_device(self, cpu_mesh,
                                                      monkeypatch):
        from vsr_tpu.inpaint.lama import LamaInpainter
        from vsr_tpu.models.lama import LamaGenerator

        cfg = Config()
        cfg.compute_dtype = "float32"

        def build(mesh):
            inp = LamaInpainter(config=cfg, n_blocks=2, mesh=mesh)
            inp.model = LamaGenerator(ngf=8, n_downsampling=2, n_blocks=2)
            inp.params = inp.model.init(
                jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)),
                jnp.zeros((1, 64, 64, 1)))
            inp._build_forward()
            return inp

        single = build(None)
        sharded = build(cpu_mesh)
        sharded.params = single.params

        rng = np.random.default_rng(32)
        frames = [rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
                  for _ in range(9)]  # 9 frames: exercises the padded tail
        mask = np.zeros((96, 128), np.uint8)
        mask[80:92, 20:110] = 255
        monkeypatch.setenv("VSR_LAMA_BAND_BATCH", "6")  # forces rounding to 8

        a = single([f.copy() for f in frames], mask)
        b = sharded([f.copy() for f in frames], mask)
        hole = mask > 0
        for src, fa, fb in zip(frames, a, b):
            np.testing.assert_array_equal(fb[~hole], src[~hole])
            _diff_ok(fa, fb, frac=0.05)
