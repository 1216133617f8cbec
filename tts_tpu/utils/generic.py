"""Generic training utilities: run dirs, running averages, timers.

Capability parity with /root/reference/TTS/utils/generic_utils.py:37-136
(experiment folders with date+git-hash, crash cleanup, KeepAverage).
"""

from __future__ import annotations

import datetime
import glob
import os
import shutil
import subprocess
import time
from typing import Dict, Optional


def get_git_branch() -> str:
    try:
        out = subprocess.check_output(["git", "rev-parse", "--abbrev-ref", "HEAD"],
                                      stderr=subprocess.DEVNULL)
        return out.decode().strip()
    except Exception:
        return "unknown"


def get_commit_hash() -> str:
    try:
        out = subprocess.check_output(["git", "rev-parse", "--short", "HEAD"],
                                      stderr=subprocess.DEVNULL)
        return out.decode().strip()
    except Exception:
        return "0000000"


def create_experiment_folder(root_path: str, model_name: str,
                             debug: bool = False) -> str:
    """<root>/<model>-<date>-<githash>/ (≙ generic_utils.py:37-49)."""
    date_str = datetime.datetime.now().strftime("%B-%d-%Y_%I+%M%p")
    commit = "debug" if debug else get_commit_hash()
    output_folder = os.path.join(root_path, f"{model_name}-{date_str}-{commit}")
    os.makedirs(output_folder, exist_ok=True)
    return output_folder


def remove_experiment_folder(experiment_path: str) -> None:
    """Delete run dirs that produced no checkpoint (crash cleanup,
    ≙ generic_utils.py:52-60)."""
    checkpoints = glob.glob(os.path.join(experiment_path, "*.ckpt"))
    if not checkpoints:
        if os.path.isdir(experiment_path):
            shutil.rmtree(experiment_path, ignore_errors=True)


def copy_config_file(config_path: str, out_path: str) -> None:
    shutil.copyfile(config_path, out_path)


class KeepAverage:
    """Running averages of a loss dict (≙ generic_utils.py:100-136)."""

    def __init__(self):
        self.avg_values: Dict[str, float] = {}
        self.iters: Dict[str, int] = {}

    def __getitem__(self, key: str) -> float:
        return self.avg_values[key]

    def items(self):
        return self.avg_values.items()

    def add_value(self, name: str, init_val: float = 0, init_iter: int = 0) -> None:
        self.avg_values[name] = init_val
        self.iters[name] = init_iter

    def update_value(self, name: str, value: float,
                     weighted_avg: bool = False) -> None:
        if name not in self.avg_values:
            self.add_value(name)
        if weighted_avg:
            self.avg_values[name] = 0.99 * self.avg_values[name] + 0.01 * value
            self.iters[name] += 1
        else:
            self.avg_values[name] = (
                self.avg_values[name] * self.iters[name] + value
            ) / (self.iters[name] + 1)
            self.iters[name] += 1

    def update_values(self, value_dict: Dict[str, float]) -> None:
        for key, value in value_dict.items():
            self.update_value(key, float(value))


class StepTimer:
    """step_time / loader_time measurement (≙ train_tts.py:145-149)."""

    def __init__(self):
        self._t = time.time()

    def lap(self) -> float:
        now = time.time()
        dt = now - self._t
        self._t = now
        return dt
