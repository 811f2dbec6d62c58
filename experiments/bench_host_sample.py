"""Per-sample host pipeline cost: general vs fused-train path (VERDICT r3 #6).

Measures the single-threaded wall cost of SegDataset.get() per TRAIN sample
at the flagship protocol shapes, across three input layouts:

  native   — PNGs at native render size (GTA5 1914x1052): decode + BICUBIC
             resize to base_size + aug + normalize, every epoch (the cost
             tools/prepare_dataset.py eliminates)
  prepared — PNGs pre-resized to base_size on disk: the fused C++ train
             fast path (one libpng decode+normalize pass, mirror as a numpy
             view flip) — data/cityscapes.py _fused_train_sample
  prepared_general — same prepared PNGs with the native extension disabled
             (PIL decode + numpy normalize), isolating the fused-pass win
             from the resize-elimination win

Also reports the fused VAL path cost on the same prepared PNGs — the
VERDICT r3 #6 target is train-prepared ≈ val-fused.

CPU-only; run on an otherwise idle box (1-core VM numbers are noisy but
pairwise ordering is stable single-threaded). Uses medians over --n samples.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python experiments/bench_host_sample.py [--base_size 1280,720]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from unittest import mock

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median_ms(fn, n: int) -> float:
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def run(args) -> dict:
    from experiments.bench_e2e import ensure_dataset
    from tools.prepare_dataset import prepare_split

    from maxsquareloss_tpu.data import GTA5Dataset, TransformConfig
    from maxsquareloss_tpu.data import hostops

    w, h = (int(v) for v in args.base_size.split(","))
    root = ensure_dataset(args.data_root)  # protocol-shape synthetic PNGs
    src = os.path.join(root, "GTA5")
    prep = os.path.join(args.data_root + "_prepared", "GTA5")
    prepare_split("gta5", src, f"{src}/train.txt", prep, (w, h), "train",
                  num_workers=args.num_workers)

    cfg = TransformConfig(
        base_size=(w, h), crop_size=(w, h),
        random_mirror=True, gaussian_blur=args.gaussian_blur,
        device_normalize=args.device_normalize,
    )
    n = args.n
    rng = np.random.default_rng(0)
    out = {
        "base_size": f"{w}x{h}",
        "gaussian_blur": args.gaussian_blur,
        "device_normalize": args.device_normalize,
        "samples": n,
        "hostops": hostops.available(),
    }

    ds_nat = GTA5Dataset(src, f"{src}/train.txt", split="train", transform_cfg=cfg)
    idx = [int(rng.integers(0, len(ds_nat))) for _ in range(n)]
    # per-sample rng VARIES (seed = sample position) so the medians cover the
    # real mirror/blur draw mix, and the SAME seeds repeat across legs so the
    # comparison stays pairwise-fair (a constant seed would pin one branch).
    seeds = list(range(n))

    def leg(ds):
        it = iter(zip(idx, seeds))

        def sample():
            i, s = next(it)
            ds.get(i, np.random.default_rng(s))

        return _median_ms(sample, n)

    out["native_ms"] = leg(ds_nat)

    ds_prep = GTA5Dataset(prep, f"{prep}/train.txt", split="train", transform_cfg=cfg)
    ip, lp = ds_prep._pair_paths(ds_prep.items[0])
    assert ds_prep._fused_train_sample(ip, lp, np.random.default_rng(0)) is not None
    out["prepared_fused_ms"] = leg(ds_prep)

    with mock.patch.object(hostops, "available", return_value=False):
        out["prepared_general_ms"] = leg(ds_prep)

    # raw-format prepared root (--format raw): no PNG decode at all
    praw = os.path.join(args.data_root + "_prepared_raw", "GTA5")
    prepare_split("gta5", src, f"{src}/train.txt", praw, (w, h), "train",
                  num_workers=args.num_workers, fmt="raw")
    ds_raw = GTA5Dataset(praw, f"{praw}/train.txt", split="train", transform_cfg=cfg)
    ipr, lpr = ds_raw._pair_paths(ds_raw.items[0])
    assert ds_raw._fused_train_sample(ipr, lpr, np.random.default_rng(0)) is not None
    out["prepared_raw_ms"] = leg(ds_raw)

    # the r3 target: fused-train cost ~= fused-val cost on the same files
    ds_val = GTA5Dataset(prep, f"{prep}/train.txt", split="val", transform_cfg=cfg)
    out["prepared_val_fused_ms"] = leg(ds_val)
    out["speedup_native_to_fused"] = round(
        out["native_ms"] / out["prepared_fused_ms"], 2
    )
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="/tmp/bench_e2e_data")
    p.add_argument("--base_size", default="1280,720")
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--num_workers", type=int, default=4)
    from maxsquareloss_tpu.config import str2bool

    p.add_argument("--gaussian_blur", type=str2bool, default=True)
    p.add_argument("--device_normalize", type=str2bool, default=False)
    a = p.parse_args()
    print(json.dumps(run(a), indent=1))
