"""Distributed-training alias (`/root/reference/ddp_train.py` parity).

On TPU there is no torchrun: the same train CLI is GSPMD-distributed over
all visible devices automatically.  This alias exists so reference users
find the familiar entry point; it adds `--auto-resume` (continue from the
last checkpoint at save-path if present — the elastic-restart pattern the
reference approximates with --resume, ddp_train.py:142-150).

  python -m medical_image_classification_tpu.cli.ddp_train \
      --epochs N --batch-size B --data-path P [--resume CKPT] [--tp N]
"""

from __future__ import annotations

import argparse
import os

from medical_image_classification_tpu.cli.train import main
from medical_image_classification_tpu.utils.config import (
    TrainConfig, add_args, from_args)

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    add_args(parser, TrainConfig())
    parser.add_argument("--auto-resume", action="store_true",
                        help="resume from save-path checkpoint if it exists")
    args = parser.parse_args()
    cfg = from_args(TrainConfig, args)
    if args.auto_resume and not cfg.resume and os.path.isdir(cfg.save_path):
        cfg.resume = cfg.save_path
    main(cfg)
