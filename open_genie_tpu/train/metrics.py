"""Metrics logging: JSONL + optional TensorBoard.

Replaces Lightning's `log_dict`/TensorBoardLogger
(`/root/reference/genie/tokenizer.py:396-431`,
`config/tokenize.yaml:87-92`). Metrics come back from the jitted step as a
small dict; the logger writes JSONL always and TensorBoard events when a
writer is available.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, log_dir: str = "logs", name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}_metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            try:
                import tensorflow as tf  # type: ignore

                self._tb = _TFWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, v, step)
                except Exception:
                    pass
        line = " ".join(
            f"{k}={v:.4g}" for k, v in metrics.items() if isinstance(v, float)
        )
        print(f"[step {step}] {line}", flush=True)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            try:
                self._tb.close()
            except Exception:
                pass


class _TFWriter:
    """Minimal tensorboard writer backed by tf.summary."""

    def __init__(self, log_dir: str):
        import tensorflow as tf

        self._tf = tf
        self._writer = tf.summary.create_file_writer(log_dir)

    def add_scalar(self, name: str, value: float, step: int) -> None:
        with self._writer.as_default():
            self._tf.summary.scalar(name, value, step=step)

    def close(self) -> None:
        self._writer.close()
