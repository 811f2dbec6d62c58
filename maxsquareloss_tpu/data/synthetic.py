"""Synthetic in-memory dataset: tests, benchmarks, and trajectory oracles.

Generates deterministic structured (image, label) pairs with the same sample
interface as SegDataset — no files on disk needed. Used by the §4
integration tests (fixed tiny synthetic dataset vs recorded traces) and by
``bench.py`` when no real dataset roots exist on the machine.
"""

from __future__ import annotations

import os

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


# --------------------------------------------------------------------------
# Synthetic DOMAIN-SHIFT pair (adaptation-efficacy benchmark)
#
# The reference's reason to exist is that max-square adaptation on unlabeled
# target images IMPROVES target mIoU over source-only training (reference
# paper Tab. 1: 36.6 -> 44.3/45.2/46.4 — SURVEY.md §6). That table is
# unreproducible on this box (no datasets, zero egress), so this generator
# builds the smallest dataset pair on which the same mechanism must work:
#
# - Pixel color encodes class: 19 classes on a 3x3x3 RGB lattice (spacing
#   `spacing` per channel), so inter-class decision boundaries are the
#   midplanes between lattice colors.
# - Both domains share the label-geometry distribution (blocky rectangle
#   fields with a dominant background class, so class frequencies are
#   imbalanced — the regime the IW variants exist for).
# - The TARGET domain is the source renderer plus a constant global color
#   offset `shift` (an illumination-style covariate shift). Within-class
#   noise is LOW-FREQUENCY (constant over `patch`-sized tiles) so the
#   convnet cannot average it away spatially: after the shift, the noise
#   tail of each target cluster crosses its nearest source-trained decision
#   midplane and the source-only model misclassifies those tiles.
# - Max-square / entropy minimization on unlabeled target pixels pushes the
#   boundary out of the (shifted) cluster — the cluster-assumption
#   mechanism the paper relies on — which is exactly what recovers those
#   tiles. The margin between clusters (spacing/2 = 2.2 sigma by default)
#   keeps the majority of every cluster on the correct side, so
#   sharpening snaps clusters to the RIGHT label.
#
# Everything is written as real files in the GTA5/Cityscapes on-disk
# layouts so the benchmark drives the REAL CLIs (tools/train_source.py,
# tools/solve_gta5.py, tools/evaluate.py) end to end. The labeled target
# val split is held out for measurement only; UDA never reads target
# labels (the target loader ships images; labels on disk are eval-only).
# --------------------------------------------------------------------------

# Cityscapes raw label ids that map to trainIds 0..18 (data/cityscapes.py
# CITYSCAPES_ID_TO_TRAINID)
MAPPED_RAW_IDS = (
    7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31, 32, 33,
)


def lattice_colors(spacing: float = 80.0) -> np.ndarray:
    """(19, 3) float32 class colors on a 3x3x3 RGB lattice.

    Channel levels are centered in [0, 255] with `spacing` between adjacent
    levels; the 27 lattice points are deterministically shuffled and the
    first 19 assigned to trainIds 0..18, so neighboring trainIds are NOT
    neighboring colors (class confusions under shift are scattered, like a
    real domain gap, not a single systematic swap).
    """
    lo = 127.5 - spacing
    levels = np.asarray([lo, 127.5, lo + 2 * spacing], np.float32)
    grid = np.stack(
        np.meshgrid(levels, levels, levels, indexing="ij"), axis=-1
    ).reshape(27, 3)
    order = np.random.default_rng(12345).permutation(27)[:19]
    return grid[order]


class DomainShiftRenderer:
    """Shared label geometry; per-domain photometric rendering."""

    def __init__(
        self,
        hw: tuple[int, int] = (64, 128),
        spacing: float = 80.0,
        sigma: float = 18.0,
        shift: tuple[float, float, float] = (24.0, -24.0, 24.0),
        patch: int = 16,
        seed: int = 0,
    ):
        self.hw = hw
        self.colors = lattice_colors(spacing)
        self.sigma = sigma
        self.shift = np.asarray(shift, np.float32)
        self.patch = patch
        self.seed = seed

    def label_field(self, g: np.random.Generator) -> np.ndarray:
        """Blocky 19-class trainId field with a dominant background class."""
        h, w = self.hw
        lab = np.full((h, w), int(g.integers(0, 19)), np.int32)  # background
        for _ in range(6):
            c = int(g.integers(0, 19))
            y0 = int(g.integers(0, max(1, h - 12)))
            x0 = int(g.integers(0, max(1, w - 12)))
            y1 = y0 + int(g.integers(12, h // 2 + 1))
            x1 = x0 + int(g.integers(12, w // 2 + 1))
            lab[y0:y1, x0:x1] = c
        return lab

    def render(self, lab: np.ndarray, g: np.random.Generator, target: bool) -> np.ndarray:
        """uint8 HWC image: class color + low-frequency noise (+ shift)."""
        h, w = self.hw
        p = self.patch
        gh, gw = -(-h // p), -(-w // p)
        # per-tile noise, nearest-upsampled: constant over patch x patch
        # tiles so receptive-field averaging cannot cancel it
        noise = g.normal(0.0, self.sigma, size=(gh, gw, 3)).astype(np.float32)
        noise = np.repeat(np.repeat(noise, p, axis=0), p, axis=1)[:h, :w]
        img = self.colors[lab] + noise
        if target:
            img = img + self.shift
        return np.clip(np.rint(img), 0, 255).astype(np.uint8)

    def sample(self, domain: str, index: int) -> tuple[np.ndarray, np.ndarray]:
        """(uint8 image, int32 trainId label) — deterministic by (seed, domain, index)."""
        import zlib  # stable across processes (str hash() is salted)

        g = np.random.default_rng((self.seed, zlib.crc32(domain.encode()), index))
        lab = self.label_field(g)
        return self.render(lab, g, target=domain.startswith("target")), lab


def write_domain_shift_pair(
    base: str,
    n_source: int = 32,
    n_target_train: int = 32,
    n_target_val: int = 16,
    **renderer_kw,
) -> DomainShiftRenderer:
    """Materialize the pair on disk in the GTA5 + Cityscapes layouts.

    - ``<base>/GTA5``: labeled SOURCE domain (train.txt)
    - ``<base>/Cityscapes`` train split: UNLABELED-use TARGET domain (labels
      are written because the loader interface reads pairs, but the UDA
      trainer never consumes them as supervision)
    - ``<base>/Cityscapes`` val split: held-out labeled TARGET data — the
      measurement set for source-only vs adapted mIoU.
    """
    from PIL import Image

    r = DomainShiftRenderer(**renderer_kw)
    trainid_to_raw = np.asarray(MAPPED_RAW_IDS, np.uint8)

    g5 = os.path.join(base, "GTA5")
    os.makedirs(os.path.join(g5, "images"), exist_ok=True)
    os.makedirs(os.path.join(g5, "labels"), exist_ok=True)
    items = []
    for i in range(n_source):
        img, lab = r.sample("source", i)
        name = f"{i:05d}.png"
        Image.fromarray(img).save(os.path.join(g5, "images", name))
        Image.fromarray(trainid_to_raw[lab]).save(os.path.join(g5, "labels", name))
        items.append(name)
    with open(os.path.join(g5, "train.txt"), "w") as f:
        f.write("\n".join(items))

    cs = os.path.join(base, "Cityscapes")
    for split, n in (("train", n_target_train), ("val", n_target_val)):
        rels = []
        for i in range(n):
            rel = f"leftImg8bit/{split}/synth/synth_{i:06d}_leftImg8bit.png"
            lrel = rel.replace("leftImg8bit", "gtFine", 1).replace(
                "_leftImg8bit.png", "_gtFine_labelIds.png"
            )
            os.makedirs(os.path.dirname(os.path.join(cs, rel)), exist_ok=True)
            os.makedirs(os.path.dirname(os.path.join(cs, lrel)), exist_ok=True)
            img, lab = r.sample(f"target_{split}", i)
            Image.fromarray(img).save(os.path.join(cs, rel))
            Image.fromarray(trainid_to_raw[lab]).save(os.path.join(cs, lrel))
            rels.append(rel)
        with open(os.path.join(cs, f"{split}.txt"), "w") as f:
            f.write("\n".join(rels))
    return r
