"""Console + TensorBoard logging.

Capability parity with /root/reference/TTS/utils/console_logger.py:17-102
(colored per-key deltas vs previous epoch) and tensorboard_logger.py:5-81
(scalars, figures, audio, histograms via tensorboardX).
"""

from __future__ import annotations

import datetime
from typing import Dict, Optional


class _Colors:
    BOLD = "\033[1m"
    RED = "\033[91m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    BLUE = "\033[94m"
    END = "\033[0m"


def _tcolor_delta(value: float, prev: Optional[float]) -> str:
    if prev is None:
        return f"{value:.5f}"
    diff = value - prev
    color = _Colors.GREEN if diff <= 0 else _Colors.RED
    return f"{value:.5f} {color}({diff:+.5f}){_Colors.END}"


class ConsoleLogger:
    def __init__(self):
        self.old_train_loss_dict: Optional[Dict[str, float]] = None
        self.old_eval_loss_dict: Optional[Dict[str, float]] = None

    @staticmethod
    def _time() -> str:
        return datetime.datetime.now().strftime("%H:%M:%S")

    def print_epoch_start(self, epoch: int, max_epoch: int) -> None:
        print(f"\n{_Colors.BOLD} > EPOCH: {epoch}/{max_epoch}{_Colors.END}")

    def print_train_start(self) -> None:
        print(f"\n{_Colors.BOLD} > TRAINING ({self._time()}) {_Colors.END}")

    def print_train_step(self, batch_steps: int, step: int, global_step: int,
                         loss_dict: Dict[str, float],
                         avg_loss_dict: Dict[str, float]) -> None:
        indent = "     | > "
        print(f"\n   --> STEP: {step}/{batch_steps} -- GLOBAL_STEP: {global_step}")
        for key, value in loss_dict.items():
            avg = avg_loss_dict.get(f"avg_{key}")
            extra = f" ({avg:.5f})" if avg is not None else ""
            print(f"{indent}{key}: {float(value):.5f}{extra}")

    def print_train_epoch_end(self, global_step: int, epoch: int, epoch_time: float,
                              avg_loss_dict: Dict[str, float]) -> None:
        print(f"   --> TRAIN PERFORMANCE -- EPOCH TIME: {epoch_time:.2f} sec "
              f"-- GLOBAL_STEP: {global_step}")
        for key, value in avg_loss_dict.items():
            prev = (self.old_train_loss_dict or {}).get(key)
            print(f"     | > {key}: {_tcolor_delta(float(value), prev)}")
        self.old_train_loss_dict = {k: float(v) for k, v in avg_loss_dict.items()}

    def print_eval_start(self) -> None:
        print(f"\n{_Colors.BOLD} > EVALUATION {_Colors.END}\n")

    def print_eval_step(self, step: int, loss_dict: Dict[str, float],
                        avg_loss_dict: Dict[str, float]) -> None:
        print(f"   --> EVAL STEP: {step}")
        for key, value in loss_dict.items():
            print(f"     | > {key}: {float(value):.5f}")

    def print_epoch_end(self, epoch: int, avg_loss_dict: Dict[str, float]) -> None:
        print(f"\n  --> EVAL PERFORMANCE")
        for key, value in avg_loss_dict.items():
            prev = (self.old_eval_loss_dict or {}).get(key)
            print(f"     | > {key}: {_tcolor_delta(float(value), prev)}")
        self.old_eval_loss_dict = {k: float(v) for k, v in avg_loss_dict.items()}


class TensorboardLogger:
    """tensorboardX writer wrapper; mirrors the reference's scalar/figure/audio
    surface but tolerates a missing tensorboardX install."""

    def __init__(self, log_dir: str, model_name: str = "TTS"):
        self.model_name = model_name
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        except Exception:
            self.writer = None

    def _scalars(self, scope: str, stats: Dict, step: int) -> None:
        if self.writer is None:
            return
        for key, value in stats.items():
            if hasattr(value, "shape") and getattr(value, "size", 1) != 1:
                continue
            self.writer.add_scalar(f"{scope}/{key}", float(value), step)

    def tb_train_iter_stats(self, step: int, stats: Dict) -> None:
        self._scalars(f"{self.model_name}_TrainIterStats", stats, step)

    def tb_train_epoch_stats(self, step: int, stats: Dict) -> None:
        self._scalars(f"{self.model_name}_TrainEpochStats", stats, step)

    def tb_eval_stats(self, step: int, stats: Dict) -> None:
        self._scalars(f"{self.model_name}_EvalStats", stats, step)

    def tb_train_figures(self, step: int, figures: Dict) -> None:
        if self.writer is None:
            return
        for key, fig in figures.items():
            self.writer.add_figure(f"{self.model_name}_TrainFigures/{key}", fig, step)

    def tb_eval_figures(self, step: int, figures: Dict) -> None:
        if self.writer is None:
            return
        for key, fig in figures.items():
            self.writer.add_figure(f"{self.model_name}_EvalFigures/{key}", fig, step)

    def tb_train_audios(self, step: int, audios: Dict, sample_rate: int) -> None:
        if self.writer is None:
            return
        for key, wav in audios.items():
            self.writer.add_audio(f"{self.model_name}_TrainAudios/{key}", wav,
                                  step, sample_rate=sample_rate)

    def tb_eval_audios(self, step: int, audios: Dict, sample_rate: int) -> None:
        if self.writer is None:
            return
        for key, wav in audios.items():
            self.writer.add_audio(f"{self.model_name}_EvalAudios/{key}", wav,
                                  step, sample_rate=sample_rate)

    def tb_model_weights(self, params, step: int) -> None:
        if self.writer is None:
            return
        import jax
        import numpy as np
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = jax.tree_util.keystr(path).replace("'", "").replace("][", "/")
            name = name.strip("[]")
            arr = np.asarray(leaf)
            self.writer.add_scalar(f"layer_stats/{name}/max", arr.max(), step)
            self.writer.add_scalar(f"layer_stats/{name}/min", arr.min(), step)
            self.writer.add_scalar(f"layer_stats/{name}/mean", arr.mean(), step)
            self.writer.add_histogram(f"layer_weights/{name}", arr, step)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()
