"""SYNTHIA-RAND-CITYSCAPES dataset (SURVEY.md C3).

Rebuild of ``datasets/synthia_Dataset.py``: labels are 16-bit PNGs — the
reference reads them via ``imageio.imread(..., format='PNG-FI')[:, :, 0]``;
we decode on host with OpenCV ``IMREAD_UNCHANGED`` (same pixel values, no
FreeImage plugin dependency) and take channel 0. SYNTHIA ids remap to the 16
shared Cityscapes trainIds (no terrain/truck/train).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from maxsquareloss_tpu.data.cityscapes import SegDataset

# SYNTHIA id → Cityscapes trainId (16 shared classes)
SYNTHIA_ID_TO_TRAINID = {
    3: 0,    # road
    4: 1,    # sidewalk
    2: 2,    # building
    21: 3,   # wall
    5: 4,    # fence
    7: 5,    # pole
    15: 6,   # traffic light
    9: 7,    # traffic sign
    6: 8,    # vegetation
    1: 10,   # sky
    10: 11,  # person
    17: 12,  # rider
    8: 13,   # car
    19: 15,  # bus
    12: 17,  # motorcycle
    11: 18,  # bicycle
}


class SynthiaDataset(SegDataset):
    id_to_trainid = SYNTHIA_ID_TO_TRAINID

    def _pair_paths(self, item: str) -> tuple[str, str]:
        if " " in item:
            return super()._pair_paths(item)
        name = os.path.basename(item)
        return (
            os.path.join(self.root, "RGB", name),
            os.path.join(self.root, "GT", "LABELS", name),
        )

    def _decode_mask(self, path: str):
        """→ PIL 'I' of RAW SYNTHIA class ids (remapped late, in get()).

        Raw-sidecar roots never reach here — SegDataset._load_mask resolves
        ``<path>.npy`` first and only delegates decode to this hook."""
        from maxsquareloss_tpu.data import hostops

        if hostops.available():
            # native libpng path: raw 16-bit channels in file order, so
            # channel 0 is the class id (same convention as imageio PNG-FI)
            with open(path, "rb") as f:
                raw = hostops.decode_png(f.read(), False)
            if raw.ndim == 3:
                raw = raw[:, :, 0]
            return Image.fromarray(raw.astype(np.int32), mode="I")
        try:
            import cv2

            raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if raw is None:
                raise OSError(f"cv2 failed to read {path}")
            if raw.ndim == 3:
                # The class id lives in the file's FIRST channel (R — what
                # the reference's imageio PNG-FI [:, :, 0] reads). cv2
                # returns BGR/BGRA, so R is index 2 in both layouts.
                raw = raw[:, :, 2]
        except ImportError:  # pragma: no cover - cv2 is baked into this image
            import imageio

            raw = np.asarray(imageio.imread(path, format="PNG-FI"))
            if raw.ndim == 3:
                raw = raw[:, :, 0]  # RGB(A) order: R is index 0
        # mode 'I' keeps exact ids through the NEAREST resize.
        return Image.fromarray(raw.astype(np.int32), mode="I")
