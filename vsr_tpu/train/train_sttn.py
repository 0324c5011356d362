"""STTN training CLI (parity with backend/tools/train/train_sttn.py:16-96).

Single-process multi-device by default: the train step shards the batch over
every local device through the ('data','model') mesh — the jax equivalent of
the reference's one-process-per-GPU DDP. Multi-host extends via
jax.distributed.initialize() (env-based — replaces the reference's
MPI/PMI/Azure env sniffing, utils_sttn.py:216-258).

Usage:
  python -m vsr_tpu.train.train_sttn --data <frames_root> [--config cfg.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Optional


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train STTN on a device mesh")
    parser.add_argument("--data", required=True,
                        help="Root of training videos (zips or frame dirs)")
    parser.add_argument("--config", default=None, help="TrainConfig JSON")
    parser.add_argument("--steps", type=int, default=None,
                        help="Override iteration count")
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--resume", default=None,
                        help="Checkpoint path to resume from")
    parser.add_argument("--distributed", action="store_true",
                        help="Call jax.distributed.initialize() (multi-host)")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.distributed:
        import jax

        jax.distributed.initialize()

    from vsr_tpu.parallel.mesh import create_mesh
    from vsr_tpu.train.dataset import FrameSequenceDataset
    from vsr_tpu.train.sttn_trainer import STTNTrainer, TrainConfig

    cfg = TrainConfig()
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
        cfg = dataclasses.replace(cfg, **overrides)
    if args.steps is not None:
        cfg = dataclasses.replace(cfg, iterations=args.steps)
    if args.save_dir:
        cfg = dataclasses.replace(cfg, save_dir=args.save_dir)

    dataset = FrameSequenceDataset(
        args.data, frame_w=cfg.frame_w, frame_h=cfg.frame_h,
        sample_length=cfg.sample_length)

    mesh = create_mesh()
    trainer = STTNTrainer(cfg, mesh=mesh)
    if args.resume:
        trainer.restore(args.resume)

    def log(step, metrics):
        line = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        print(f"[{step}] {line}", flush=True)

    remaining = cfg.iterations - int(trainer.state.step)
    trainer.train(dataset.batches(cfg.batch_size), remaining, log_cb=log)
    path = trainer.save()
    print(f"final checkpoint: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
