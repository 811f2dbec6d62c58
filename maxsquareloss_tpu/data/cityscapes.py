"""Cityscapes dataset + the shared dataset base class.

Rebuild of ``datasets/cityscapes_Dataset.py`` (SURVEY.md C1): split list
files of ``leftImg8bit`` image paths with ``gtFine`` labelId PNGs, the
19-class id→trainId remap (unmapped → -1 ignore), shared train/val paired
transforms, caffe/torchvision normalization, and the ``class_16``/
``class_13`` label filtering used by the SYNTHIA / cross-city protocols.

Host-side only (PIL/numpy); batching + device prefetch live in
``data/loader.py``.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Sequence

import numpy as np
from PIL import Image

from maxsquareloss_tpu.data.transforms import (
    IGNORE_LABEL,
    TransformConfig,
    img_transform,
    mask_transform,
    remap_lut,
    train_sync_transform,
    val_sync_transform,
)

# 19-class Cityscapes labelId → trainId (reference: cityscapes_Dataset.py
# id_to_trainid, SURVEY.md C1 — verbatim protocol constant)
CITYSCAPES_ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}

# trainId subsets for the SYNTHIA (16) and cross-city (13) protocols:
# classes NOT in the subset are mapped to ignore when class_16/class_13 is set.
TRAINID_SET_16 = [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 15, 17, 18]
TRAINID_SET_13 = [0, 1, 2, 6, 7, 8, 10, 11, 12, 13, 15, 17, 18]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_size(path: str) -> tuple[int, int] | None:
    """(W, H) from the PNG IHDR header — 24 bytes read, no decode."""
    try:
        with open(path, "rb") as f:
            head = f.read(24)
    except OSError:
        return None
    if len(head) == 24 and head[:8] == _PNG_MAGIC and head[12:16] == b"IHDR":
        w, h = struct.unpack(">II", head[16:24])
        return (int(w), int(h))
    return None


def _raw_path(path: str) -> str:
    """Raw-format sidecar for a dataset file: ``<path>.npy`` holding the
    decoded pixels (uint8 HWC image / uint8-or-uint16 raw label ids) at
    base_size. Written by ``tools/prepare_dataset.py --format raw``; skips
    libpng inflate entirely — the dominant remaining per-sample host cost
    on prepared data (BASELINE.md "Host data pipeline")."""
    return path + ".npy"


def _raw_meta(path: str):
    """(shape, dtype) from an .npy header without reading the data
    (mmap open touches only the header page); (None, None) if absent."""
    try:
        a = np.load(path, mmap_mode="r")
        return a.shape, a.dtype
    except (OSError, ValueError):
        return None, None


def _subset_filter_lut(keep: Sequence[int], relabel: bool) -> np.ndarray:
    """LUT over trainIds (+1 shifted for the -1 ignore slot).

    relabel=True compacts kept classes to 0..len(keep)-1 (13-class cross-city
    protocol trains a 13-class head); relabel=False keeps original trainIds
    and ignores the rest (16-class SYNTHIA eval on a 19-class head).
    """
    lut = np.full((20,), IGNORE_LABEL, dtype=np.int32)  # index = trainid + 1
    for new, tid in enumerate(sorted(keep)):
        lut[tid + 1] = new if relabel else tid
    return lut


class SegDataset:
    """Shared base: list-file driven paired (image, label) dataset.

    Subclasses set ``id_to_trainid`` and implement ``_pair_paths`` /
    ``_load_mask``. List files contain one relative image path per line, or
    an explicit "image_path label_path" pair.
    """

    id_to_trainid: dict[int, int] = CITYSCAPES_ID_TO_TRAINID

    def __init__(
        self,
        root: str,
        list_path: str,
        split: str = "train",
        transform_cfg: TransformConfig | None = None,
        class_16: bool = False,
        class_13: bool = False,
        relabel_13: bool = False,
        full_res_labels: bool = False,
        cache_dir: str | None = None,
    ):
        self.root = root
        self.split = split
        self.cfg = transform_cfg or TransformConfig()
        self.training = split == "train"
        self.full_res_labels = full_res_labels
        # decoded-sample cache: stores (image, raw mask) resized to base_size
        # as .npz so steady-state epochs skip PNG decode + the big resize —
        # the host-side hot spot (SURVEY.md §3.4 / hard part #5). Only the
        # deterministic prefix is cached; augmentation stays per-epoch
        # (h-flip commutes with resize, so semantics are unchanged).
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)
        self.lut = remap_lut(self.id_to_trainid, max_id=self.max_label_id())
        self.class_filter = None
        if class_13:
            self.class_filter = _subset_filter_lut(TRAINID_SET_13, relabel_13)
        elif class_16:
            self.class_filter = _subset_filter_lut(TRAINID_SET_16, relabel=False)
        with open(list_path) as f:
            self.items = [ln.strip() for ln in f if ln.strip()]

    def max_label_id(self) -> int:
        return 256

    def __len__(self) -> int:
        return len(self.items)

    # -- path resolution -------------------------------------------------

    def _pair_paths(self, item: str) -> tuple[str, str]:
        if " " in item:
            img_rel, lab_rel = item.split()[:2]
            return os.path.join(self.root, img_rel), os.path.join(self.root, lab_rel)
        img_rel = item
        lab_rel = img_rel.replace("leftImg8bit", "gtFine", 1).replace(
            "_leftImg8bit.png", "_gtFine_labelIds.png"
        )
        return os.path.join(self.root, img_rel), os.path.join(self.root, lab_rel)

    # -- raw loading -----------------------------------------------------
    # Decode through the native libpng extension when built (GIL-released,
    # one pass — native/hostops.cpp); PIL otherwise. The PIL wrapper around
    # the decoded array keeps the paired-aug API unchanged.

    def _load_image(self, path: str) -> Image.Image:
        from maxsquareloss_tpu.data import hostops

        if os.path.exists(_raw_path(path)):  # raw-prepared root: no decode
            return Image.fromarray(np.load(_raw_path(path)))
        if path.endswith(".png") and hostops.available():
            with open(path, "rb") as f:
                return Image.fromarray(hostops.decode_png(f.read(), True))
        return Image.open(path).convert("RGB")

    def _load_mask(self, path: str) -> Image.Image:
        """→ PIL image of RAW label ids (remapped late, in get()).

        Raw uint8 stays cheap through the PIL NEAREST resize; remap-early
        (int32 'I' masks through the transforms) measured ~15% slower on
        the train pipeline. The fused decode+remap native pass is used
        where no resize follows — see _fused_val_sample."""
        # Raw sidecars are resolved HERE, once for every dataset class —
        # subclasses override _decode_mask only (a SYNTHIA override that
        # re-implemented _load_mask would silently miss raw roots).
        if os.path.exists(_raw_path(path)):  # raw-prepared root: no decode
            arr = np.load(_raw_path(path))
            if arr.dtype != np.uint8:
                return Image.fromarray(arr.astype(np.int32), mode="I")
            return Image.fromarray(arr)
        return self._decode_mask(path)

    def _decode_mask(self, path: str) -> Image.Image:
        from maxsquareloss_tpu.data import hostops

        if path.endswith(".png") and hostops.available():
            with open(path, "rb") as f:
                arr = hostops.decode_png(f.read(), False)
            if arr.ndim == 3:
                arr = arr[..., 0]
            if arr.dtype != np.uint8:
                return Image.fromarray(arr.astype(np.int32), mode="I")
            return Image.fromarray(arr)
        return Image.open(path)

    # -- sample assembly -------------------------------------------------

    def _load_pair(self, index: int) -> tuple[Image.Image, Image.Image]:
        """(image, mask) PIL pair — through the base-size cache when enabled."""
        item = self.items[index]
        img_path, lab_path = self._pair_paths(item)
        if self.cache_dir is None or (not self.training and self.full_res_labels):
            return self._load_image(img_path), self._load_mask(lab_path)
        w, h = self.cfg.base_size
        # Key on the resolved paths, not just the index: a regenerated or
        # edited split list reusing the same cache_dir must not serve stale
        # (image, label) pairs (ADVICE r1, low).
        digest = hashlib.sha1(
            f"{img_path}\0{lab_path}".encode()
        ).hexdigest()[:12]
        key = f"{index:06d}_{digest}_{w}x{h}.npz"
        path = os.path.join(self.cache_dir, key)
        if os.path.exists(path):
            z = np.load(path)
            img = Image.fromarray(z["img"])
            m = z["mask"]
            mask = Image.fromarray(m) if m.dtype == np.uint8 else Image.fromarray(
                m.astype(np.int32), mode="I"
            )
            return img, mask
        img = self._load_image(img_path).resize(self.cfg.base_size, Image.BICUBIC)
        mask = self._load_mask(lab_path).resize(self.cfg.base_size, Image.NEAREST)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, img=np.asarray(img), mask=np.asarray(mask))
        os.replace(tmp, path)
        return img, mask

    def _load_raw_pair(self, img_path: str, lab_path: str):
        """(uint8 HWC image, raw label ids) from raw-prepared ``.npy``
        sidecars at exactly base_size, or None. No libpng, no C++ needed —
        the pixels ARE the bytes on disk. One open per file: missing
        sidecars fail fast inside np.load, and on eligible roots (the
        steady state) the loaded arrays are the ones used, so a separate
        header peek would only add opens to the hot loop (round-4
        review)."""
        try:
            img = np.load(_raw_path(img_path))
            ids = np.load(_raw_path(lab_path))
        except (OSError, ValueError):
            return None
        w, h = self.cfg.base_size
        if img.shape != (h, w, 3) or img.dtype != np.uint8 or ids.shape != (h, w):
            return None
        return img, ids

    def _fused_val_sample(self, img_path: str, lab_path: str):
        """Exact fully-fused val fast path.

        Raw-prepared roots (``prepare_dataset.py --format raw``): the
        sample is a 2.7 MB ``np.load`` + the exact shared normalize/remap
        functions — no decode at all. Otherwise, when the PNGs are already
        at base_size (checked via an IHDR header peek — no decode), the
        val transform is the identity, so the sample is exactly
        decode+normalize (image) and decode+remap (label), each one fused
        C++ pass. Returns (x, y) or None to take the general path.
        """
        from maxsquareloss_tpu.data import hostops
        from maxsquareloss_tpu.data.palette import IMG_MEAN

        if self.training or self.full_res_labels:
            return None
        pair = self._load_raw_pair(img_path, lab_path)
        if pair is not None:
            x_u8, ids = pair
            x = (
                x_u8 if self.cfg.device_normalize
                else img_transform(x_u8, self.cfg.numpy_transform)
            )
            return x, mask_transform(ids, self.lut)
        if (
            not self.cfg.numpy_transform
            or not hostops.available()
            or not img_path.endswith(".png")
            or not lab_path.endswith(".png")
        ):
            return None
        size = tuple(self.cfg.base_size)
        if _png_size(img_path) != size or _png_size(lab_path) != size:
            return None
        with open(img_path, "rb") as f:
            if self.cfg.device_normalize:
                x = hostops.decode_png(f.read(), True)  # raw uint8 RGB
            else:
                x = hostops.decode_normalize_bgr(f.read(), IMG_MEAN)
        with open(lab_path, "rb") as f:
            y = hostops.decode_remap(f.read(), self.lut)
        return x, y

    def _fused_train_sample(self, img_path, lab_path, rng: np.random.Generator):
        """Exact fused TRAIN fast path for base-size inputs (VERDICT r3 #6).

        Eligible when the PNGs are already at base_size (IHDR peek — e.g.
        after ``tools/prepare_dataset.py`` pre-resized the dataset once) and
        random_crop is off: the deterministic resize is then the identity,
        so the sample reduces to one fused C++ decode pass per file plus the
        random mirror as a numpy view flip. EXACT vs the general path:

        - rng draws happen in the general path's order (mirror gate, blur
          gate, blur radius) so data order is bitwise-reproducible either way;
        - mirror ∘ normalize == normalize ∘ mirror (both elementwise per
          pixel: BGR swap is channel-wise, the flip is width-wise), and
          mirror ∘ LUT-remap == LUT-remap ∘ mirror;
        - when the per-sample blur gate FIRES, the image leg keeps the
          general order (flip → blur → normalize; PIL's Gaussian kernel is
          not guaranteed flip-equivariant at the bit level) but runs the
          blur through the native byte-exact-vs-PIL kernel
          (hostops.gaussian_blur, ~5.8x faster) — PIL only when the
          extension predates it. The label leg stays fused either way.

        Returns (x, y) or None to take the general path.
        """
        from maxsquareloss_tpu.data import hostops
        from maxsquareloss_tpu.data.palette import IMG_MEAN

        cfg = self.cfg
        if not self.training or cfg.random_crop:
            return None
        raw_pair = self._load_raw_pair(img_path, lab_path)
        if raw_pair is None and (
            not (cfg.numpy_transform or cfg.device_normalize)
            or not hostops.available()
            or not img_path.endswith(".png")
            or not lab_path.endswith(".png")
        ):
            return None
        size = tuple(cfg.base_size)
        if raw_pair is None and (
            _png_size(img_path) != size or _png_size(lab_path) != size
        ):
            return None

        flip = bool(cfg.random_mirror and rng.random() < 0.5)
        blur_radius = None
        if cfg.gaussian_blur and rng.random() < cfg.blur_prob:
            blur_radius = float(rng.random())

        if raw_pair is not None:
            # raw-prepared route: no decode at all; general-path op order
            # (flip → blur → normalize) on the stored pixels via the exact
            # shared transform functions — bitwise identical streams
            # (tests/test_hostops.py raw-prepare tests)
            x_u8, ids = raw_pair
            y = mask_transform(ids, self.lut)
            if flip:
                y = np.ascontiguousarray(y[:, ::-1])
                x_u8 = x_u8[:, ::-1]
            if blur_radius is not None:
                if hostops.has_gaussian_blur():
                    x_u8 = hostops.gaussian_blur(x_u8, blur_radius)
                else:  # PIL fallback is byte-identical (test-pinned)
                    from PIL import ImageFilter

                    x_u8 = np.asarray(
                        Image.fromarray(np.ascontiguousarray(x_u8)).filter(
                            ImageFilter.GaussianBlur(radius=blur_radius)
                        )
                    )
            if cfg.device_normalize:
                return np.ascontiguousarray(x_u8), y
            return img_transform(x_u8, cfg.numpy_transform), y

        with open(lab_path, "rb") as f:
            y = hostops.decode_remap(f.read(), self.lut)
        if flip:
            y = np.ascontiguousarray(y[:, ::-1])

        with open(img_path, "rb") as f:
            raw = f.read()
        if blur_radius is not None:
            if hostops.has_gaussian_blur():
                x = hostops.decode_png(raw, True)
                if flip:
                    x = x[:, ::-1]
                x = hostops.gaussian_blur(x, blur_radius)  # uint8, PIL-exact
            else:  # stale pre-round-4 extension: PIL chain, same bytes
                img = Image.fromarray(hostops.decode_png(raw, True))
                if flip:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                from PIL import ImageFilter

                img = img.filter(ImageFilter.GaussianBlur(radius=blur_radius))
                x = np.asarray(img, dtype=np.uint8)
            if not cfg.device_normalize:
                x = img_transform(x, cfg.numpy_transform)
        else:
            if cfg.device_normalize:
                x = hostops.decode_png(raw, True)  # raw uint8 RGB
            else:
                x = hostops.decode_normalize_bgr(raw, IMG_MEAN)
            if flip:
                x = np.ascontiguousarray(x[:, ::-1])
        return x, y

    def get(self, index: int, rng: np.random.Generator):
        """→ (image (H,W,3) float32, label (H,W) int32, item_name)."""
        item = self.items[index]
        img_path, lab_path = self._pair_paths(item)
        if self.training:
            fused = self._fused_train_sample(img_path, lab_path, rng)
        else:
            fused = self._fused_val_sample(img_path, lab_path)
        if fused is not None:
            x, y = fused
        else:
            img, mask = self._load_pair(index)
            if self.training:
                img, mask = train_sync_transform(img, mask, self.cfg, rng)
            else:
                img, mask = val_sync_transform(
                    img, mask, self.cfg, full_res_labels=self.full_res_labels
                )
            if self.cfg.device_normalize:
                # raw uint8 RGB across the host->device boundary; the jitted
                # step normalizes on-device (bitwise-identical f32 math,
                # 4x less transfer — train/steps.py _prepare_inputs)
                x = np.asarray(img, dtype=np.uint8)
            else:
                x = img_transform(img, self.cfg.numpy_transform)
            y = mask_transform(mask, self.lut)
        if self.class_filter is not None:
            y = self.class_filter[np.clip(y + 1, 0, 19)]
        if self.cfg.device_normalize:
            y = y.astype(np.int8)  # trainIds -1..18 fit; widened on-device
        name = os.path.splitext(os.path.basename(img_path))[0]
        return x, y, name


class CityscapesDataset(SegDataset):
    """Cityscapes leftImg8bit/gtFine (labeled source-val / unlabeled UDA target)."""

    id_to_trainid = CITYSCAPES_ID_TO_TRAINID
