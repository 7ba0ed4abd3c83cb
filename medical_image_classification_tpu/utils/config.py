"""One dataclass config layer feeding CLI and model constructors.

Replaces the reference's mix of hard-coded script constants
(`/root/reference/train.py:29,40,60`) and per-script argparse
(`ddp_train.py:53-68`) with a single source of truth (SURVEY §5 config note).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class TrainConfig:
    # data
    data_path: str = "data/train"
    val_path: Optional[str] = None          # default: sibling 'val' of train
    image_size: int = 224
    num_workers: int = 8
    # model
    model: str = "medmamba"
    num_classes: int = 8
    use_checkpoint: bool = False            # remat
    scan_impl: str = "auto"
    # optimization (reference defaults: train.py:40,59-60)
    batch_size: int = 32
    epochs: int = 100
    lr: float = 1e-4
    optimizer: str = "adam"
    schedule: str = "constant"
    weight_decay: float = 0.0
    warmup_epochs: int = 0
    label_smoothing: float = 0.0
    grad_clip: Optional[float] = None
    seed: int = 0
    # parallelism
    tp: int = 1
    sp: int = 1                             # sequence-parallel mesh axis size
    # io
    save_path: str = "runs/model.ckpt"
    resume: Optional[str] = None
    log_every: int = 50
    # kan
    kan_update_grid_every: int = 0          # epochs between re-gridding; 0=off


def add_args(parser: argparse.ArgumentParser, cfg) -> None:
    for f in dataclasses.fields(cfg):
        name = "--" + f.name.replace("_", "-")
        default = getattr(cfg, f.name)
        if f.type in ("bool", bool):
            parser.add_argument(name, action="store_true", default=default)
        elif default is None:
            parser.add_argument(name, default=None)
        else:
            parser.add_argument(name, type=type(default), default=default)


def from_args(cls, args: argparse.Namespace):
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(cls)
          if hasattr(args, f.name)}
    # argparse gives strings for Optional fields
    for k in ("grad_clip",):
        if k in kw and isinstance(kw[k], str):
            kw[k] = float(kw[k])
    return cls(**kw)
