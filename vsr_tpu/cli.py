"""Command-line interface, flag-compatible with the reference CLI
(backend/tools/args_handler.py:6-31 wired at backend/main.py:473-488):

    python -m vsr_tpu -i in.mp4 [-o out.mp4] [-c YMIN YMAX XMIN XMAX ...]
                      [--inpaint-mode {sttn-auto,sttn-det,lama,propainter,opencv}]
"""

from __future__ import annotations

import argparse
from typing import List, Optional

from vsr_tpu.config import Config, InpaintMode


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="vsr_tpu",
        description="TPU-native video subtitle remover",
    )
    parser.add_argument("--input", "-i", required=True, type=str,
                        help="Input video/image file path")
    parser.add_argument("--output", "-o", type=str, default=None,
                        help="Output file path (optional)")
    parser.add_argument(
        "--subtitle-area-coords", "-c", action="append", nargs=4, type=int,
        metavar=("YMIN", "YMAX", "XMIN", "XMAX"),
        help="Subtitle area (repeatable for multiple areas)",
    )
    parser.add_argument(
        "--inpaint-mode", type=str, default="sttn-auto",
        choices=[m.value for m in InpaintMode],
        help="Inpaint mode (default: sttn-auto)",
    )
    parser.add_argument("--models", type=str, default=None,
                        help="Directory with converted model checkpoints (.npz)")
    parser.add_argument("--config", type=str, default=None,
                        help="Path to a config JSON")
    return parser


DEFAULT_CONFIG_PATH = "config/config.json"  # reference convention


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    # --config wins; otherwise the reference's config/config.json convention
    cfg = Config.load(args.config or DEFAULT_CONFIG_PATH)
    cfg.inpaint_mode = InpaintMode(args.inpaint_mode)

    from vsr_tpu.pipeline import SubtitleRemover

    remover = SubtitleRemover(
        args.input,
        output_path=args.output,
        sub_areas=[tuple(c) for c in (args.subtitle_area_coords or [])],
        config=cfg,
        checkpoint_dir=args.models,
    )
    remover.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
