"""Misc utilities: determinism + file logging (reference utils.py:10-20,
train.py:291-297)."""
from __future__ import annotations

import logging
import os
import random

import numpy as np


def setup_seed(seed: int):
    """Host-side determinism. Device-side randomness in JAX is explicit
    (jax.random keys derived from this seed), so nothing else is needed —
    the reference's cudnn/CUBLAS knobs have no analogue."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def setup_logger(save_path: str, filename: str) -> logging.Logger:
    os.makedirs(save_path, exist_ok=True)
    logger = logging.getLogger(f"aa_clip_iqm_tpu.{filename}")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(save_path, filename), encoding="utf-8")
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
    logger.addHandler(fh)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(sh)
    return logger
