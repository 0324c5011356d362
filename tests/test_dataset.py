"""Training dataset tests: mask statistics, zip/dir readers, batch shapes."""

import os
import zipfile

import cv2
import numpy as np
import pytest

from vsr_tpu.train.dataset import (
    FrameSequenceDataset,
    create_random_moving_masks,
    random_shape_mask,
)


class TestMaskGeneration:
    def test_shape_mask_nonempty(self):
        rng = np.random.default_rng(0)
        patch, (ph, pw) = random_shape_mask(rng, 120, 216)
        assert patch.shape == (ph, pw)
        assert patch.sum() > 0
        assert set(np.unique(patch)) <= {0, 1}

    def test_moving_masks_shape_and_values(self):
        rng = np.random.default_rng(1)
        masks = create_random_moving_masks(rng, 5, 120, 216)
        assert masks.shape == (5, 120, 216)
        assert all(m.sum() > 0 for m in masks)

    def test_static_and_moving_both_occur(self):
        static = moving = 0
        for seed in range(20):
            rng = np.random.default_rng(seed)
            masks = create_random_moving_masks(rng, 4, 60, 108)
            if all((m == masks[0]).all() for m in masks):
                static += 1
            else:
                moving += 1
        assert static > 0 and moving > 0


def make_video_tree(root, as_zip: bool):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(3)
    for v in range(2):
        frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
                  for _ in range(8)]
        if as_zip:
            with zipfile.ZipFile(os.path.join(root, f"vid{v}.zip"), "w") as zf:
                for i, f in enumerate(frames):
                    ok, buf = cv2.imencode(".jpg", f)
                    zf.writestr(f"{i:05d}.jpg", buf.tobytes())
        else:
            d = os.path.join(root, f"vid{v}")
            os.makedirs(d, exist_ok=True)
            for i, f in enumerate(frames):
                cv2.imwrite(os.path.join(d, f"{i:05d}.png"), f)


class TestFrameSequenceDataset:
    @pytest.mark.parametrize("as_zip", [True, False])
    def test_sample_shapes(self, tmp_path, as_zip):
        root = str(tmp_path / ("z" if as_zip else "d"))
        make_video_tree(root, as_zip)
        ds = FrameSequenceDataset(root, frame_w=64, frame_h=48, sample_length=4)
        frames, masks = ds.sample()
        assert frames.shape == (4, 48, 64, 3)
        assert masks.shape == (4, 48, 64, 1)
        assert -1.0 <= frames.min() and frames.max() <= 1.0
        assert set(np.unique(masks)) <= {0.0, 1.0}

    def test_batches(self, tmp_path):
        root = str(tmp_path / "b")
        make_video_tree(root, as_zip=True)
        ds = FrameSequenceDataset(root, frame_w=64, frame_h=48, sample_length=3)
        frames, masks = next(ds.batches(2))
        assert frames.shape == (2, 3, 48, 64, 3)
        assert masks.shape == (2, 3, 48, 64, 1)

    def test_short_video_padded(self, tmp_path):
        root = str(tmp_path / "s")
        os.makedirs(root)
        d = os.path.join(root, "tiny")
        os.makedirs(d)
        for i in range(2):
            cv2.imwrite(os.path.join(d, f"{i}.png"),
                        np.zeros((48, 64, 3), np.uint8))
        ds = FrameSequenceDataset(root, frame_w=64, frame_h=48, sample_length=5)
        frames, _ = ds.sample()
        assert frames.shape[0] == 5

    def test_empty_root_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            FrameSequenceDataset(str(tmp_path / "nope"))


def test_train_cli_smoke(tmp_path, monkeypatch):
    """One training step end to end through the CLI main()."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    import jax

    root = str(tmp_path / "data")
    make_video_tree(root, as_zip=True)
    cfg = {
        "frame_w": 32, "frame_h": 24, "sample_length": 2, "batch_size": 2,
        "iterations": 1, "save_freq": 10**9, "log_freq": 1,
        "save_dir": str(tmp_path / "ckpt"),
    }
    cfg_path = str(tmp_path / "cfg.json")
    import json

    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    # shrink the models via the trainer defaults? Full STTN at 32x24 with
    # det patchsizes won't fit; patch the trainer's default generator.
    from vsr_tpu.train import train_sttn as cli
    from vsr_tpu.train import sttn_trainer as trainer_mod
    from vsr_tpu.models.sttn import STTNGenerator
    from vsr_tpu.models.discriminator import VideoDiscriminator

    orig_trainer = trainer_mod.STTNTrainer

    class TinyTrainer(orig_trainer):
        def __init__(self, cfg, mesh=None, **kw):
            super().__init__(
                cfg, mesh=mesh,
                generator=STTNGenerator(
                    variant="det", channel=16, stack_num=1,
                    patchsizes_override=((4, 3), (2, 2))),
                discriminator=VideoDiscriminator(nf=8),
            )

    monkeypatch.setattr(cli, "STTNTrainer", TinyTrainer, raising=False)
    # cli imports STTNTrainer inside main() from sttn_trainer module
    monkeypatch.setattr(trainer_mod, "STTNTrainer", TinyTrainer)

    rc = cli.main(["--data", root, "--config", cfg_path])
    assert rc == 0
    assert os.path.isdir(str(tmp_path / "ckpt"))
