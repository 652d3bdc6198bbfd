"""General runtime helpers: seeding, timestamped stdout, workspace setup."""

from __future__ import annotations

import os
import random
import shutil
import sys
from datetime import datetime

import numpy as np

DEFAULT_SEED = 2024  # determinism aid, matching the reference's fixed seed


def set_seed(seed: int = DEFAULT_SEED) -> None:
    random.seed(seed)
    np.random.seed(seed)


def inverse_sigmoid_np(x: np.ndarray) -> np.ndarray:
    return np.log(x / (1 - x))


class _TimestampedStream:
    """Wrap a stream so each line is suffixed with a wall-clock stamp
    (reference ``utils/general_utils.py:153-177`` ``safe_state``)."""

    def __init__(self, stream, silent: bool):
        self.stream = stream
        self.silent = silent

    def write(self, text):
        if self.silent:
            return
        if text.endswith("\n"):
            stamp = datetime.now().strftime("%d/%m %H:%M:%S")
            text = text.replace("\n", f" [{stamp}]\n")
        self.stream.write(text)

    def flush(self):
        self.stream.flush()


def safe_state(quiet: bool = False, seed: int = DEFAULT_SEED) -> None:
    sys.stdout = _TimestampedStream(sys.stdout, quiet)
    set_seed(seed)


def create_workspace(save_path: str, wipe: bool = True) -> None:
    """Create the run directory layout (reference ``mapper.py:914-926``)."""
    if wipe and os.path.exists(save_path):
        shutil.rmtree(save_path)
    for sub in ("", "eval_render", "save_model", "save_traj", "eval_metric"):
        os.makedirs(os.path.join(save_path, sub), exist_ok=True)
