"""Host-side image/label transforms for the segmentation pipelines.

Rebuild of the reference's shared transform base in
``datasets/cityscapes_Dataset.py`` (``_train_sync_transform``,
``_val_sync_transform``, ``_img_transform``, ``_mask_transform`` —
SURVEY.md C1/§3.4): random h-flip, resize to base_size, random scale+crop to
crop_size, optional Gaussian blur; two normalizations (caffe-style
BGR − IMG_MEAN for the caffe-converted DeepLabV2 init, or torchvision
mean/std); label id→trainId remap through a 256-entry LUT with unmapped→-1.

All randomness flows through an explicit ``np.random.Generator`` (stateless
per-sample seeding in the loader) instead of torch/global ``random`` — same
distributions, reproducible across worker processes.

NOTE: the exact scale range / crop padding of the reference's random_crop
branch could not be verified against the empty reference mount (SURVEY.md
§0); the implementation below documents its choices and exposes them as
knobs (scale_range, blur_prob).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from PIL import Image, ImageFilter

from maxsquareloss_tpu.data.palette import IMAGENET_MEAN, IMAGENET_STD, IMG_MEAN

IGNORE_LABEL = -1


@dataclasses.dataclass(frozen=True)
class TransformConfig:
    base_size: tuple[int, int] = (1280, 720)   # (W, H) — PIL convention
    crop_size: tuple[int, int] = (1280, 640)   # (W, H)
    random_mirror: bool = True
    random_crop: bool = False
    scale_range: tuple[float, float] = (0.5, 1.5)
    gaussian_blur: bool = True
    blur_prob: float = 0.5
    numpy_transform: bool = True  # caffe normalization (set by get_model)
    # ship uint8 images / int8 labels to the device and normalize INSIDE the
    # jitted step (train/steps.py _prepare_inputs): 4x less host->device
    # traffic, bitwise-identical float math (uint8->f32 cast is exact and
    # the same IEEE f32 normalize runs on-device)
    device_normalize: bool = False


def remap_lut(id_to_trainid: dict[int, int], max_id: int = 256) -> np.ndarray:
    """Dense LUT: raw label id → trainId, unmapped ids → IGNORE_LABEL."""
    lut = np.full((max_id,), IGNORE_LABEL, dtype=np.int32)
    for k, v in id_to_trainid.items():
        if 0 <= k < max_id:
            lut[k] = v
    return lut


def mask_transform(mask: Image.Image | np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Label PNG → remapped int32 (H, W) trainId mask."""
    arr = np.asarray(mask)
    if arr.ndim == 3:  # e.g. SYNTHIA (H, W, C) label channel already selected upstream
        arr = arr[..., 0]
    arr = np.clip(arr.astype(np.int64), 0, len(lut) - 1)
    return lut[arr]


def img_transform(img: Image.Image | np.ndarray, numpy_transform: bool = True) -> np.ndarray:
    """RGB PIL/array → normalized float32 (H, W, 3) NHWC-ready image."""
    arr = np.asarray(img, dtype=np.float32)
    if numpy_transform:
        # caffe path: RGB→BGR, subtract channel means, no std division
        bgr = arr[..., ::-1]
        return np.ascontiguousarray(bgr - IMG_MEAN)
    return (arr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def _resize_pair(img: Image.Image, mask: Image.Image, size_wh: tuple[int, int]):
    # identity resizes are skipped (cached samples arrive pre-resized)
    if img.size != size_wh:
        img = img.resize(size_wh, Image.BICUBIC)
    if mask.size != size_wh:
        mask = mask.resize(size_wh, Image.NEAREST)
    return img, mask


def train_sync_transform(
    img: Image.Image,
    mask: Image.Image,
    cfg: TransformConfig,
    rng: np.random.Generator,
) -> tuple[Image.Image, Image.Image]:
    """Paired train-time augmentation (before normalization/remap)."""
    if cfg.random_mirror and rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        mask = mask.transpose(Image.FLIP_LEFT_RIGHT)
    # resize to base_size first, THEN optionally scale+crop — the reference
    # pipeline order (SURVEY.md C1/§3.4); also makes the decoded-sample
    # cache (stored at base_size) bit-identical to the uncached path
    img, mask = _resize_pair(img, mask, cfg.base_size)
    if cfg.random_crop:
        scale = rng.uniform(*cfg.scale_range)
        sw = max(int(round(cfg.base_size[0] * scale)), cfg.crop_size[0])
        sh = max(int(round(cfg.base_size[1] * scale)), cfg.crop_size[1])
        img, mask = _resize_pair(img, mask, (sw, sh))
        x0 = int(rng.integers(0, sw - cfg.crop_size[0] + 1))
        y0 = int(rng.integers(0, sh - cfg.crop_size[1] + 1))
        box = (x0, y0, x0 + cfg.crop_size[0], y0 + cfg.crop_size[1])
        img, mask = img.crop(box), mask.crop(box)
    if cfg.gaussian_blur and rng.random() < cfg.blur_prob:
        img = _gaussian_blur(img, float(rng.random()))
    return img, mask


def _gaussian_blur(img: Image.Image, radius: float) -> Image.Image:
    """PIL-semantics Gaussian blur through the native byte-exact kernel
    (~5.8x faster than PIL at protocol sizes — data/hostops.py); PIL when
    the extension is unavailable. Identical bytes either way (pinned by
    tests/test_hostops.py::test_gaussian_blur_matches_pil)."""
    from maxsquareloss_tpu.data import hostops

    if img.mode == "RGB" and hostops.has_gaussian_blur():
        return Image.fromarray(hostops.gaussian_blur(np.asarray(img), radius))
    return img.filter(ImageFilter.GaussianBlur(radius=radius))


def val_sync_transform(
    img: Image.Image,
    mask: Image.Image,
    cfg: TransformConfig,
    full_res_labels: bool = False,
) -> tuple[Image.Image, Image.Image]:
    """Deterministic val resize.

    ``full_res_labels`` keeps the label at native resolution (predictions are
    then upsampled to label size, reference §3.3); the default resizes both
    to base_size (the resize combination used for the README numbers is
    [UNVERIFIED] — both protocols are supported, see eval config).
    """
    img = img.resize(cfg.base_size, Image.BICUBIC)
    if not full_res_labels:
        mask = mask.resize(cfg.base_size, Image.NEAREST)
    return img, mask


def flip_tta(img_hwc: np.ndarray) -> np.ndarray:
    """Horizontal flip for flip-averaged inference (reference ``flip()``)."""
    return np.ascontiguousarray(img_hwc[:, ::-1])
