"""Process-0-gated logging (file + console).

Replaces the reference's rank-0 print monkeypatch and file logger
(`/root/reference/ddp_train.py:24-48`, `FusionMamba/logger.py:13-21`) with a
stdlib logger gated on ``jax.process_index()``.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def get_logger(name: str = "mic_tpu", log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    import jax
    is_main = jax.process_index() == 0
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if is_main:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file:
            os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
    return logger
