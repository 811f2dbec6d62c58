"""Logging + TensorBoard setup.

Rebuild of the reference's logger init (``logging`` → ``train_log.txt`` in
the checkpoint dir + stdout) and ``tensorboardX.SummaryWriter`` usage
(reference: tools/train_source.py top/bottom, SURVEY.md C17/§5.5). Scalar
names match the reference for easy A/B in TensorBoard.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def setup_logger(
    checkpoint_dir: str, name: str = "maxsquareloss_tpu", file: bool = True
) -> logging.Logger:
    """``file=False`` gives a console-only logger (non-lead processes in
    multi-host runs share the checkpoint dir; only process 0 owns the file)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    if file:
        fh = logging.FileHandler(os.path.join(checkpoint_dir, "train_log.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    return logger


class SummaryWriter:
    """tensorboardX SummaryWriter with a JSONL fallback.

    Always mirrors scalars into ``scalars.jsonl`` in the log dir so runs are
    machine-readable without TB.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter as TBWriter

            self._tb = TBWriter(logdir)
        except Exception:  # pragma: no cover
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step), "ts": time.time()})
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_image(self, tag: str, img_hwc, step: int):
        """img_hwc: (H, W, 3) float [0,1] or uint8."""
        if self._tb is not None:
            import numpy as np

            arr = np.asarray(img_hwc)
            if arr.dtype != "uint8":
                arr = (arr * 255).clip(0, 255).astype("uint8")
            self._tb.add_image(tag, arr, step, dataformats="HWC")

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """No-op writer for non-lead processes in multi-host runs (metrics are
    replicated, so only process 0 records them)."""

    def add_scalar(self, tag: str, value, step: int):
        pass

    def add_image(self, tag: str, img_hwc, step: int):
        pass

    def flush(self):
        pass

    def close(self):
        pass
