"""Data pipeline tests: LUT remap, normalization, transforms, loader, palette.

Golden-file style: synthesized PNGs on disk → decoded/remapped/normalized
tensors checked against independently computed expectations (SURVEY.md §4
"data pipeline" row).
"""

import os

import numpy as np
import pytest
from PIL import Image

from maxsquareloss_tpu.data import (
    CITYSCAPES_ID_TO_TRAINID,
    CityscapesDataset,
    GTA5Dataset,
    SegDataLoader,
    SyntheticSegDataset,
    TransformConfig,
    decode_labels,
    inv_preprocess,
)
from maxsquareloss_tpu.data.crosscity import CrossCityDataset
from maxsquareloss_tpu.data.palette import IMG_MEAN, LABEL_COLOURS
from maxsquareloss_tpu.data.transforms import (
    img_transform,
    mask_transform,
    remap_lut,
)


@pytest.fixture
def city_root(tmp_path, rng):
    """Tiny on-disk Cityscapes-layout dataset (2 images, 32x16)."""
    root = tmp_path / "cityscapes"
    items = []
    for i in range(2):
        img_rel = f"leftImg8bit/train/cityA/cityA_{i:06d}_leftImg8bit.png"
        lab_rel = img_rel.replace("leftImg8bit", "gtFine", 1).replace(
            "_leftImg8bit.png", "_gtFine_labelIds.png"
        )
        (root / os.path.dirname(img_rel)).mkdir(parents=True, exist_ok=True)
        (root / os.path.dirname(lab_rel)).mkdir(parents=True, exist_ok=True)
        img = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
        lab = rng.choice(
            list(CITYSCAPES_ID_TO_TRAINID.keys()) + [0, 1, 4], size=(16, 32)
        ).astype(np.uint8)
        Image.fromarray(img).save(root / img_rel)
        Image.fromarray(lab).save(root / lab_rel)
        items.append(img_rel)
    list_file = root / "train.txt"
    list_file.write_text("\n".join(items))
    return str(root), str(list_file)


def test_lut_remap_semantics():
    lut = remap_lut(CITYSCAPES_ID_TO_TRAINID)
    assert lut[7] == 0 and lut[33] == 18 and lut[26] == 13
    assert lut[0] == -1 and lut[255] == -1 and lut[6] == -1
    raw = np.array([[7, 8, 0], [33, 255, 26]], dtype=np.uint8)
    np.testing.assert_array_equal(
        mask_transform(raw, lut), [[0, 1, -1], [18, -1, 13]]
    )


def test_caffe_normalization(rng):
    img = rng.integers(0, 255, size=(4, 5, 3)).astype(np.uint8)
    out = img_transform(img, numpy_transform=True)
    # RGB→BGR then subtract IMG_MEAN, no std division
    want = img[..., ::-1].astype(np.float32) - IMG_MEAN
    np.testing.assert_allclose(out, want)


def test_torchvision_normalization(rng):
    img = rng.integers(0, 255, size=(4, 5, 3)).astype(np.uint8)
    out = img_transform(img, numpy_transform=False)
    from maxsquareloss_tpu.data.palette import IMAGENET_MEAN, IMAGENET_STD

    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_cityscapes_dataset_end_to_end(city_root):
    root, list_file = city_root
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16), gaussian_blur=False)
    ds = CityscapesDataset(root, list_file, split="val", transform_cfg=cfg)
    x, y, name = ds.get(0, np.random.default_rng(0))
    assert x.shape == (16, 32, 3) and x.dtype == np.float32
    assert y.shape == (16, 32) and y.dtype == np.int32
    assert y.min() >= -1 and y.max() < 19
    assert "cityA" in name


def test_train_transform_shapes_and_determinism(city_root):
    root, list_file = city_root
    cfg = TransformConfig(
        base_size=(32, 16), crop_size=(24, 12), random_crop=True, gaussian_blur=True
    )
    ds = CityscapesDataset(root, list_file, split="train", transform_cfg=cfg)
    a1, b1, _ = ds.get(0, np.random.default_rng(42))
    a2, b2, _ = ds.get(0, np.random.default_rng(42))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(b1, b2)
    assert a1.shape == (12, 24, 3) and b1.shape == (12, 24)


def test_class_13_relabel(city_root):
    root, list_file = city_root
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16))
    ds = CityscapesDataset(
        root, list_file, split="val", transform_cfg=cfg,
        class_13=True, relabel_13=True,
    )
    _, y, _ = ds.get(0, np.random.default_rng(0))
    assert y.max() < 13 and y.min() >= -1


def test_class_16_filter(city_root):
    root, list_file = city_root
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16))
    ds = CityscapesDataset(
        root, list_file, split="val", transform_cfg=cfg, class_16=True
    )
    _, y, _ = ds.get(0, np.random.default_rng(0))
    # classes 9 (terrain), 14 (truck), 16 (train) must be ignored
    assert not np.isin(y, [9, 14, 16]).any()


def test_loader_batching_and_epoch_reshuffle():
    ds = SyntheticSegDataset(length=10, hw=(8, 8))
    dl = SegDataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    assert dl.num_iterations == 2
    batches1 = [names for _, _, names in dl]
    assert len(batches1) == 2
    batches2 = [names for _, _, names in dl]  # epoch advanced → reshuffled
    assert batches1 != batches2
    xs, ys, names = next(iter(dl))
    assert xs.shape == (4, 8, 8, 3) and ys.shape == (4, 8, 8)


def test_abandoned_loader_still_advances_epoch():
    """UDA zips a long source loader with a short target loader — the
    abandoned source generator must still get a fresh shuffle + fresh
    per-sample aug RNG next epoch (ADVICE r1, high)."""
    ds = SyntheticSegDataset(length=12, hw=(8, 8))
    dl = SegDataLoader(ds, batch_size=2, shuffle=True, num_workers=1, seed=3)

    def first_batch_abandoning():
        it = iter(dl)
        batch = next(it)  # abandon the rest, as zip() with a shorter iter does
        return batch

    _, ys1, names1 = first_batch_abandoning()
    _, ys2, names2 = first_batch_abandoning()
    assert dl.epoch == 2
    assert names1 != names2  # reshuffled despite never finishing epoch 0

    # set_epoch rewinds deterministically (trainer resume path)
    dl.set_epoch(0)
    _, ys1b, names1b = first_batch_abandoning()
    assert names1b == names1
    np.testing.assert_array_equal(ys1b, ys1)


def test_device_prefetch_roundtrip():
    from maxsquareloss_tpu.data import device_prefetch

    ds = SyntheticSegDataset(length=6, hw=(8, 8))
    dl = SegDataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    n = 0
    for xs, ys, names in device_prefetch(iter(dl)):
        assert xs.shape == (2, 8, 8, 3)
        n += 1
    assert n == 3


def test_decode_labels_palette():
    mask = np.array([[0, 18], [-1, 13]], dtype=np.int32)
    rgb = decode_labels(mask)
    assert rgb.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0, 0], LABEL_COLOURS[0])
    np.testing.assert_array_equal(rgb[0, 0, 1], LABEL_COLOURS[18])
    np.testing.assert_array_equal(rgb[0, 1, 0], (0, 0, 0))  # ignore → black


def test_inv_preprocess_roundtrip(rng):
    img = rng.integers(0, 255, size=(4, 5, 3)).astype(np.uint8)
    x = img_transform(img, numpy_transform=True)
    back = inv_preprocess(x[None], numpy_transform=True)[0]
    np.testing.assert_allclose(back, img.astype(np.float32) / 255.0, atol=1e-5)


def test_crosscity_paths(tmp_path, rng):
    root = tmp_path / "NTHU"
    d = root / "Rio" / "Images" / "Test"
    l = root / "Rio" / "Labels" / "Test"
    d.mkdir(parents=True)
    l.mkdir(parents=True)
    img = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
    lab = rng.choice(list(CITYSCAPES_ID_TO_TRAINID.keys()), size=(16, 32)).astype(np.uint8)
    Image.fromarray(img).save(d / "pano_0001.png")
    Image.fromarray(lab).save(l / "pano_0001.png")
    lf = root / "val.txt"
    lf.write_text("pano_0001.png\n")
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16))
    ds = CrossCityDataset(
        str(root), str(lf), city_name="Rio", split="val",
        transform_cfg=cfg, relabel_13=True,
    )
    _, y, _ = ds.get(0, np.random.default_rng(0))
    assert y.max() < 13


def test_gta5_paths(tmp_path, rng):
    root = tmp_path / "GTA5"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    img = rng.integers(0, 255, size=(16, 32, 3)).astype(np.uint8)
    lab = rng.choice(list(CITYSCAPES_ID_TO_TRAINID.keys()), size=(16, 32)).astype(np.uint8)
    Image.fromarray(img).save(root / "images" / "00001.png")
    Image.fromarray(lab).save(root / "labels" / "00001.png")
    lf = root / "train.txt"
    lf.write_text("00001.png\n")
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16), gaussian_blur=False)
    ds = GTA5Dataset(str(root), str(lf), split="train", transform_cfg=cfg)
    x, y, _ = ds.get(0, np.random.default_rng(1))
    assert x.shape == (16, 32, 3) and y.max() < 19


def test_decoded_cache_matches_uncached(city_root, tmp_path):
    """Cached pipeline (base-size npz) == uncached pipeline, bit for bit."""
    root, list_file = city_root
    cfg = TransformConfig(
        base_size=(24, 12), crop_size=(16, 8), random_crop=True, gaussian_blur=True
    )
    plain = CityscapesDataset(root, list_file, split="train", transform_cfg=cfg)
    cached = CityscapesDataset(
        root, list_file, split="train", transform_cfg=cfg,
        cache_dir=str(tmp_path / "cache"),
    )
    for idx in range(2):
        for seed in (0, 7):
            a = plain.get(idx, np.random.default_rng(seed))
            b = cached.get(idx, np.random.default_rng(seed))  # builds cache
            c = cached.get(idx, np.random.default_rng(seed))  # reads cache
            np.testing.assert_array_equal(a[0], b[0])
            np.testing.assert_array_equal(a[1], b[1])
            np.testing.assert_array_equal(b[0], c[0])
            np.testing.assert_array_equal(b[1], c[1])
    import os as _os

    assert len(_os.listdir(tmp_path / "cache")) == 2
