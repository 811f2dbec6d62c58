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


def test_pad_last_labels_are_ignore():
    """Batch-padding duplicates must not bias the confusion matrix: padded
    samples carry all-ignore labels (ADVICE r1, low)."""
    from maxsquareloss_tpu.data.loader import _PAD_SAMPLE_NAME

    ds = SyntheticSegDataset(length=5, hw=(8, 8))
    dl = SegDataLoader(
        ds, batch_size=4, shuffle=False, num_workers=1,
        drop_last=False, pad_last=True,
    )
    batches = list(dl)
    assert len(batches) == 2
    xs, ys, names = batches[-1]
    assert xs.shape == (4, 8, 8, 3)
    assert names[1:] == [_PAD_SAMPLE_NAME] * 3
    assert (ys[1:] == -1).all()      # padded labels all-ignore
    assert (ys[0] != -1).any()       # the real sample is intact

    # end to end: the confusion matrix only counts the real sample
    import jax.numpy as jnp

    from maxsquareloss_tpu.metrics import confusion_matrix_update

    pred = np.zeros((4, 8, 8), np.int32)
    cm = np.asarray(confusion_matrix_update(jnp.asarray(ys), jnp.asarray(pred), 19))
    assert cm.sum() == (ys[0] != -1).sum()


def test_cache_key_tracks_paths(city_root, tmp_path):
    """Editing the split list while reusing cache_dir must not serve stale
    pairs (ADVICE r1, low: key formerly ignored the underlying paths)."""
    root, list_file = city_root
    cache = str(tmp_path / "cache")
    os.makedirs(cache, exist_ok=True)
    cfg = TransformConfig(base_size=(32, 16), crop_size=(32, 16), gaussian_blur=False)
    ds = CityscapesDataset(
        root, list_file, split="val", transform_cfg=cfg, cache_dir=cache
    )
    _, y_first, name_first = ds.get(0, np.random.default_rng(0))

    # rewrite the list so index 0 now points at the OTHER image
    lines = open(list_file).read().splitlines()
    with open(list_file, "w") as f:
        f.write("\n".join(reversed(lines)))
    ds2 = CityscapesDataset(
        root, list_file, split="val", transform_cfg=cfg, cache_dir=cache
    )
    _, y_swapped, name_swapped = ds2.get(0, np.random.default_rng(0))
    assert name_swapped != name_first
    assert not np.array_equal(y_swapped, y_first)
    # oracle: same dataset without any cache
    ds_nocache = CityscapesDataset(root, list_file, split="val", transform_cfg=cfg)
    _, y_want, _ = ds_nocache.get(0, np.random.default_rng(0))
    np.testing.assert_array_equal(y_swapped, y_want)


def test_device_prefetch_roundtrip():
    from maxsquareloss_tpu.data import device_prefetch

    ds = SyntheticSegDataset(length=6, hw=(8, 8))
    dl = SegDataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    n = 0
    for xs, ys, names in device_prefetch(iter(dl)):
        assert xs.shape == (2, 8, 8, 3)
        n += 1
    assert n == 3


@pytest.mark.parametrize("channels", [3, 4])
def test_synthia_16bit_label_channel_consistency(tmp_path, rng, channels):
    """All SYNTHIA 16-bit label decode paths must read the file's FIRST
    channel (R) — the reference's imageio PNG-FI [:, :, 0] (ADVICE r1,
    medium: cv2 BGR/BGRA order previously picked B or alpha)."""
    cv2 = pytest.importorskip("cv2")
    from maxsquareloss_tpu.data import hostops
    from maxsquareloss_tpu.data.synthia import SynthiaDataset

    ids = rng.integers(0, 23, size=(16, 32)).astype(np.uint16)  # class ids
    junk = rng.integers(0, 65535, size=(16, 32, channels - 1)).astype(np.uint16)
    # cv2.imwrite takes BGR(A) order; the class-id channel must land in the
    # file's R slot → index 2 of the array handed to imwrite
    bgr = np.zeros((16, 32, channels), np.uint16)
    bgr[:, :, 2] = ids
    bgr[:, :, 0] = junk[:, :, 0]
    bgr[:, :, 1] = junk[:, :, 0]
    if channels == 4:
        bgr[:, :, 3] = junk[:, :, 1]  # alpha junk
    path = str(tmp_path / "label.png")
    assert cv2.imwrite(path, bgr)

    ds = object.__new__(SynthiaDataset)
    want = ids.astype(np.int32)  # _load_mask returns raw class ids
    decoded = {}
    decoded["cv2"] = np.asarray(
        SegDatasetLoadMaskForced(ds, path, force_no_native=True)
    )
    if hostops.available():
        decoded["native"] = np.asarray(ds._load_mask(path))
    for name, got in decoded.items():
        np.testing.assert_array_equal(got, want, err_msg=name)


def SegDatasetLoadMaskForced(ds, path, force_no_native=False):
    """Call SynthiaDataset._load_mask with the native extension masked off."""
    if not force_no_native:
        return ds._load_mask(path)
    from unittest import mock

    from maxsquareloss_tpu.data import hostops

    with mock.patch.object(hostops, "available", return_value=False):
        return ds._load_mask(path)


class TestGrainLoader:
    """Optional grain-backed pipeline (--loader grain): same batch contract
    and determinism guarantees as SegDataLoader."""

    def _pair(self, **kw):
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        ds = SyntheticSegDataset(length=12, hw=(8, 8))
        return (
            SegDataLoader(ds, batch_size=4, num_workers=1, seed=5, **kw),
            GrainSegLoader(ds, batch_size=4, num_workers=0, seed=5, **kw),
        )

    def test_unshuffled_content_matches_thread_loader(self):
        thr, grn = self._pair(shuffle=False)
        for (xa, ya, na), (xb, yb, nb) in zip(thr, grn):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
            assert na == nb

    def test_deterministic_reshuffle(self):
        _, g1 = self._pair(shuffle=True)
        _, g2 = self._pair(shuffle=True)
        e0a = [n for _, _, ns in g1 for n in ns]
        e0b = [n for _, _, ns in g2 for n in ns]
        assert e0a == e0b                      # same seed → same order
        e1a = [n for _, _, ns in g1 for n in ns]
        assert e1a != e0a                      # next epoch reshuffles
        assert sorted(e1a) == sorted(e0a)      # same multiset
        g2.set_epoch(1)
        e1b = [n for _, _, ns in g2 for n in ns]
        assert e1b == e1a                      # set_epoch pins the draw

    def test_set_skip_reproduces_tail(self):
        _, g1 = self._pair(shuffle=True)
        full = list(g1)
        g1.set_epoch(0)
        g1.set_skip(1)
        tail = list(g1)
        assert len(tail) == len(full) - 1
        for (xa, ya, na), (xb, yb, nb) in zip(full[1:], tail):
            np.testing.assert_array_equal(xa, xb)
            assert na == nb

    def test_set_skip_does_not_decode_skipped_samples(self):
        """Resume must be an index offset (like the thread loader), not a
        decode-and-discard replay (VERDICT r2 weak #7)."""
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        ds = SyntheticSegDataset(length=12, hw=(8, 8))
        decoded: list[int] = []
        orig_get = ds.get
        ds.get = lambda i, rng=None: (decoded.append(i), orig_get(i, rng))[1]
        g = GrainSegLoader(ds, batch_size=4, num_workers=0, seed=5, shuffle=True)
        full_names = [n for _, _, ns in g for n in ns]
        decoded.clear()
        g.set_epoch(0)
        g.set_skip(2)
        tail_names = [n for _, _, ns in g for n in ns]
        assert tail_names == full_names[8:]
        skipped = {int(n.split("_")[1]) for n in full_names[:8]}
        assert not (set(decoded) & skipped), "skipped samples were decoded"

    def test_set_skip_whole_epoch_yields_nothing(self):
        _, g = self._pair(shuffle=True)
        g.set_skip(3)  # 12 samples / batch 4 = 3 batches
        assert list(g) == []

    @pytest.mark.parametrize("pad_last", [False, True])
    def test_set_skip_sharded_reproduces_tail(self, pad_last):
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        ds = SyntheticSegDataset(length=10, hw=(8, 8))
        kw = dict(batch_size=2, num_workers=0, seed=7, shuffle=True,
                  drop_last=not pad_last, pad_last=pad_last,
                  shard_index=1, shard_count=3)
        g = GrainSegLoader(ds, **kw)
        full = list(g)
        g.set_epoch(0)
        g.set_skip(1)
        tail = list(g)
        assert len(tail) == len(full) - 1
        for (xa, ya, na), (xb, yb, nb) in zip(full[1:], tail):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)
            assert na == nb

    def test_pad_last_ignore_labels(self):
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        ds = SyntheticSegDataset(length=5, hw=(8, 8))
        g = GrainSegLoader(
            ds, batch_size=4, shuffle=False, num_workers=0,
            drop_last=False, pad_last=True,
        )
        batches = list(g)
        assert len(batches) == 2
        xs, ys, names = batches[-1]
        assert xs.shape == (4, 8, 8, 3)
        assert names[1:] == ["<pad>"] * 3
        assert (ys[1:] == -1).all()


@pytest.mark.parametrize("loader_kind", ["threads", "grain"])
def test_val_shards_cover_every_sample_exactly_once(loader_kind):
    """Multi-host val: shards must score EVERY sample exactly once (the
    reference evaluates each val sample once), padding short shards with
    all-ignore samples so processes stay in lockstep."""
    from maxsquareloss_tpu.data.loader import _PAD_SAMPLE_NAME

    if loader_kind == "grain":
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        cls, workers = GrainSegLoader, 0
    else:
        cls, workers = SegDataLoader, 1

    ds = SyntheticSegDataset(length=10, hw=(8, 8))
    shards = [
        cls(ds, batch_size=2, shuffle=False, num_workers=workers,
            drop_last=False, pad_last=True, shard_index=i, shard_count=3)
        for i in range(3)
    ]
    # lockstep: every shard runs the same number of iterations
    iters = {s.num_iterations for s in shards}
    assert iters == {2}
    seen = []
    for s in shards:
        batches = list(s)
        assert len(batches) == 2
        for _, ys, names in batches:
            for y, name in zip(ys, names):
                if name == _PAD_SAMPLE_NAME:
                    assert (y == -1).all()  # never reaches the metrics
                else:
                    seen.append(name)
    assert sorted(seen) == [f"synthetic_{i:05d}" for i in range(10)]


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


class TestDeviceNormalize:
    """--device_normalize ships uint8/int8 and normalizes inside the jitted
    step; results must be BITWISE identical to the host-normalized path
    (uint8->f32 casts are exact; same IEEE f32 ops run on-device)."""

    def _pair(self, city_root, numpy_transform):
        root, list_file = city_root
        mk = lambda dn: CityscapesDataset(
            root=root, list_path=list_file, split="train",
            transform_cfg=TransformConfig(
                base_size=(32, 16), crop_size=(32, 16), gaussian_blur=False,
                numpy_transform=numpy_transform, device_normalize=dn,
            ),
        )
        return mk(False), mk(True)

    @pytest.mark.parametrize("numpy_transform", [True, False])
    def test_bitwise_parity(self, city_root, numpy_transform):
        import jax

        from maxsquareloss_tpu.config import TrainConfig
        from maxsquareloss_tpu.train.steps import _prepare_inputs

        ds_host, ds_dev = self._pair(city_root, numpy_transform)
        cfg = TrainConfig(numpy_transform=numpy_transform)
        for i in range(len(ds_host)):
            rng_a = np.random.default_rng((0, 0, i))
            rng_b = np.random.default_rng((0, 0, i))
            x_h, y_h, _ = ds_host.get(i, rng_a)
            x_u, y_u, _ = ds_dev.get(i, rng_b)
            assert x_u.dtype == np.uint8 and y_u.dtype == np.int8
            x_d, y_d = jax.jit(
                lambda x, y: _prepare_inputs(x, y, cfg)
            )(x_u, y_u)
            if numpy_transform:
                # caffe path (protocol default): uint8->f32 cast + one f32
                # subtract — bitwise identical under jit
                np.testing.assert_array_equal(np.asarray(x_d), x_h)
            else:
                # torchvision path: XLA fuses the /255 - mean / std divide
                # chain (1-2 ulp reassociation); eager matches bitwise
                np.testing.assert_allclose(
                    np.asarray(x_d), x_h, atol=1e-6, rtol=0
                )
            np.testing.assert_array_equal(np.asarray(y_d), y_h)

    def test_eval_step_accepts_uint8(self, city_root):
        import jax
        import jax.numpy as jnp

        from maxsquareloss_tpu.config import TrainConfig
        from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
        from maxsquareloss_tpu.train.steps import make_eval_step, model_config

        cfg = TrainConfig(blocks=(1, 1, 2, 1), data_parallel=False)
        params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
        ds_host, ds_dev = self._pair(city_root, True)
        rng = np.random.default_rng(0)
        xh, yh, _ = ds_host.get(0, np.random.default_rng((0, 0, 0)))
        xu, yu, _ = ds_dev.get(0, np.random.default_rng((0, 0, 0)))
        step = make_eval_step(cfg, frozen)
        cm_a, arg_a = step(params, jnp.asarray(xh)[None], jnp.asarray(yh)[None])
        cm_b, arg_b = step(params, jnp.asarray(xu)[None], jnp.asarray(yu)[None])
        np.testing.assert_array_equal(np.asarray(arg_b), np.asarray(arg_a))
        np.testing.assert_array_equal(np.asarray(cm_b), np.asarray(cm_a))
