"""Synthetic in-memory dataset: tests, benchmarks, and trajectory oracles.

Generates deterministic structured (image, label) pairs with the same sample
interface as SegDataset — no files on disk needed. Used by the §4
integration tests (fixed tiny synthetic dataset vs recorded traces) and by
``bench.py`` when no real dataset roots exist on the machine.
"""

from __future__ import annotations

import numpy as np


class SyntheticSegDataset:
    """Deterministic random segmentation pairs, normalized like the pipeline."""

    def __init__(
        self,
        length: int = 64,
        hw: tuple[int, int] = (64, 64),
        num_classes: int = 19,
        ignore_frac: float = 0.05,
        seed: int = 0,
    ):
        self.length = length
        self.hw = hw
        self.num_classes = num_classes
        self.ignore_frac = ignore_frac
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def get(self, index: int, rng: np.random.Generator | None = None):
        del rng  # samples are fully deterministic by index
        g = np.random.default_rng((self.seed, index))
        h, w = self.hw
        # smooth-ish blobs so losses see non-degenerate class structure
        x = g.normal(0.0, 60.0, size=(h, w, 3)).astype(np.float32)
        y = g.integers(0, self.num_classes, size=(h, w)).astype(np.int32)
        ignore = g.random((h, w)) < self.ignore_frac
        y[ignore] = -1
        return x, y, f"synthetic_{index:05d}"
