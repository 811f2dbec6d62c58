"""Pre-resize a dataset to base_size on disk, once (SURVEY.md §3.4 / hard
part #5; VERDICT r3 #6).

The training pipeline's dominant steady-state host cost is the per-sample
PNG decode + PIL BICUBIC resize from native resolution to base_size
(measured 155 ms cold / 109 ms warm per 1914x1052 GTA5 source image on the
1-core dev VM — BASELINE.md "End-to-end throughput"). That resize is
deterministic and epoch-invariant, so paying it every epoch is waste.

This tool applies the IDENTICAL resize the runtime would apply — PIL
BICUBIC for images, PIL NEAREST for labels, via the dataset class's own
loaders so SYNTHIA's 16-bit label decode etc. are reused — exactly once,
writing lossless PNGs in the same relative layout plus the split list
file. Bit-identical by construction for the deterministic prefix: the
prepared pixels are exactly what the runtime's per-epoch decode+resize
would have produced (tested:
tests/test_hostops.py::test_prepare_dataset_bit_identical_and_fused
asserts full-stream bitwise equality original-vs-prepared with
random_mirror off). One documented wrinkle: with random_mirror ON, a
mirrored sample's flip now happens at base_size instead of native size —
PIL's resample grid is not exactly flip-equivariant, so those samples can
differ from the original-root stream in isolated resampled pixels
(identical distribution; the reference order is flip→resize, SURVEY.md
C1). Because the prepared PNGs are already at base_size (detected by an
IHDR header peek, no decode), the fused C++ fast paths take over:

  - train: data/cityscapes.py _fused_train_sample — one fused libpng
    decode+normalize pass (image) + decode+remap pass (label), random
    mirror as a numpy view flip; exact, parity-tested.
  - val:   _fused_val_sample (wired since round 2).

Usage (then point --data_root_path at the output root):

    python tools/prepare_dataset.py --dataset gta5 \
        --data_root_path ./datasets --output_root ./datasets_720p \
        --base_size 1280,720 --splits train
    python tools/prepare_dataset.py --dataset cityscapes \
        --data_root_path ./datasets --output_root ./datasets_720p \
        --base_size 1024,512 --splits train,val
"""

from __future__ import annotations

import argparse
import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from maxsquareloss_tpu.data.transforms import TransformConfig


def _save_mask(mask: Image.Image, path: str) -> None:
    """Lossless label save: uint8 → 8-bit gray PNG, 'I' (SYNTHIA 16-bit
    ids) → 16-bit gray PNG. Both re-decode to the same raw ids."""
    arr = np.asarray(mask)
    if arr.dtype == np.uint8:
        Image.fromarray(arr).save(path, format="PNG")
    else:
        ids = arr.astype(np.int64)
        if ids.min() < 0 or ids.max() > 0xFFFF:
            raise ValueError(f"label ids outside uint16 range in {path}")
        Image.fromarray(ids.astype(np.uint16)).save(path, format="PNG")


def _save_raw(arr: np.ndarray, path: str) -> None:
    """Atomic .npy write (uint8 image / uint8-uint16 label ids)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


def prepare_split(
    dataset: str,
    root: str,
    list_path: str,
    out_root: str,
    base_size: tuple[int, int],
    split: str,
    num_workers: int = 4,
    force: bool = False,
    city_name: str | None = None,
    fmt: str = "png",
) -> int:
    """Pre-resize every (image, label) pair of one split; returns pair count.

    ``fmt='raw'`` stores the decoded pixels as ``<relpath>.npy`` sidecars
    instead of PNGs: the loader then skips libpng inflate entirely (the
    dominant remaining per-sample cost on prepared data — BASELINE.md
    "Host data pipeline") at ~2.7 MB/image of disk instead of ~1-2 MB.
    Bit-identical streams either way (PNG is lossless; raw stores the
    same pixels directly).
    """
    from tools.common import DATASET_CLS

    kw = {}
    if dataset == "crosscity" and city_name:
        kw["city_name"] = city_name
    ds = DATASET_CLS[dataset](
        root,
        list_path,
        split=split,
        transform_cfg=TransformConfig(base_size=base_size, crop_size=base_size),
        **kw,
    )

    from maxsquareloss_tpu.data.cityscapes import _png_size, _raw_meta, _raw_path

    def fresh(out_path: str, in_path: str, is_label: bool = False) -> bool:
        """Reusable output: right size (header peek) AND newer than its input
        — a re-run after a base_size change or a regenerated source never
        silently serves stale pixels."""
        if fmt == "raw":
            shape, _ = _raw_meta(out_path)
            want = (base_size[1], base_size[0]) + (() if is_label else (3,))
            ok = shape == want
        else:
            ok = _png_size(out_path) == tuple(base_size)
        return ok and os.path.getmtime(out_path) >= os.path.getmtime(in_path)

    def one(item: str) -> None:
        img_path, lab_path = ds._pair_paths(item)
        out_img = os.path.join(out_root, os.path.relpath(img_path, root))
        out_lab = os.path.join(out_root, os.path.relpath(lab_path, root))
        if fmt == "raw":
            out_img, out_lab = _raw_path(out_img), _raw_path(out_lab)
        else:
            # a png re-prepare over a previously raw-prepared root must
            # remove the .npy sidecars: the loader prefers them
            # unconditionally, so leaving them would silently serve the
            # OLD pixels (round-4 review)
            for stale in (_raw_path(out_img), _raw_path(out_lab)):
                if os.path.exists(stale):
                    os.remove(stale)
        has_label = os.path.exists(lab_path)  # crosscity train is unlabeled
        if not force and fresh(out_img, img_path) and (
            not has_label or fresh(out_lab, lab_path, is_label=True)
        ):
            return
        os.makedirs(os.path.dirname(out_img), exist_ok=True)
        # the dataset's own loaders (native libpng when built; SYNTHIA
        # 16-bit handling) + the runtime's exact resize pair
        img = ds._load_image(img_path).resize(base_size, Image.BICUBIC)
        if fmt == "raw":
            _save_raw(np.asarray(img, dtype=np.uint8), out_img)
        else:
            img.save(out_img + ".tmp", format="PNG")
            os.replace(out_img + ".tmp", out_img)
        if has_label:
            os.makedirs(os.path.dirname(out_lab), exist_ok=True)
            mask = ds._load_mask(lab_path).resize(base_size, Image.NEAREST)
            if fmt == "raw":
                arr = np.asarray(mask)
                if arr.dtype != np.uint8:
                    ids = arr.astype(np.int64)
                    if ids.min() < 0 or ids.max() > 0xFFFF:
                        raise ValueError(
                            f"label ids outside uint16 range in {out_lab}"
                        )
                    arr = ids.astype(np.uint16)
                _save_raw(arr, out_lab)
            else:
                _save_mask(mask, out_lab + ".tmp")
                os.replace(out_lab + ".tmp", out_lab)

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        list(pool.map(one, ds.items))

    # split list rides along so --data_root_path can point at out_root; a
    # list outside the dataset root (explicit --list_path) must not make the
    # relpath escape out_root and clobber the user's file
    rel_list = os.path.relpath(os.path.abspath(list_path), os.path.abspath(root))
    if rel_list.startswith(os.pardir):
        rel_list = f"{split}.txt"
    out_list = os.path.join(out_root, rel_list)
    os.makedirs(os.path.dirname(out_list), exist_ok=True)
    with open(out_list, "w") as f:
        f.write("\n".join(ds.items) + "\n")
    return len(ds.items)


def main() -> None:
    from tools.common import default_paths

    p = argparse.ArgumentParser("prepare_dataset")
    p.add_argument("--dataset", required=True,
                   choices=("cityscapes", "gta5", "synthia", "crosscity"))
    p.add_argument("--data_root_path", default="./datasets")
    p.add_argument("--output_root", required=True,
                   help="output datasets root (mirrors the input layout)")
    p.add_argument("--base_size", default="1280,720", help="W,H")
    p.add_argument("--splits", default="train", help="comma-separated")
    p.add_argument("--list_path", default=None,
                   help="explicit split list (single split only)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--city_name", default=None, help="crosscity only")
    p.add_argument("--force", action="store_true",
                   help="re-write existing outputs")
    p.add_argument("--format", default="png", choices=("png", "raw"),
                   dest="fmt",
                   help="'png' = lossless PNGs (smaller on disk); 'raw' = "
                        ".npy pixel sidecars — the loader skips PNG decode "
                        "entirely (fastest host path; ~2.7 MB/image)")
    args = p.parse_args()

    splits = [s.strip() for s in args.splits.split(",") if s.strip()]
    if args.list_path and len(splits) != 1:
        raise SystemExit("--list_path applies to exactly one --splits entry")
    w, h = (int(v) for v in args.base_size.split(","))
    paths = default_paths(args.data_root_path)[args.dataset]
    out_ds_root = os.path.join(
        args.output_root, os.path.basename(os.path.normpath(paths["root"]))
    )
    for split in splits:
        list_path = args.list_path or paths[split]
        n = prepare_split(
            args.dataset, paths["root"], list_path, out_ds_root,
            (w, h), split, num_workers=args.num_workers, force=args.force,
            city_name=args.city_name, fmt=args.fmt,
        )
        print(f"prepared {args.dataset}/{split}: {n} pairs at {w}x{h} "
              f"({args.fmt}) → {out_ds_root}")


if __name__ == "__main__":
    main()
