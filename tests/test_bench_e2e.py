"""e2e bench plumbing (experiments/bench_e2e.py, VERDICT r2 #1) at tiny scale.

The real run (python bench.py --mode e2e) measures the full disk → loader →
device UDA path on the TPU at protocol shapes; this test exercises the same
code path on CPU with a small backbone and small images.
"""

import json
import sys
import types

import numpy as np
import pytest


def _args(tmp_path, **kw):
    d = dict(
        data_root=str(tmp_path / "data"),
        num_workers=2,
        epochs=1,
        batch=4,
        dtype="float32",
        remat="",
        xla_options="",
        comparator=15.0,
        blocks=(1, 1, 2, 1),
        n_per_domain=8,
        src_disk_wh=(256, 144),
        tgt_disk_wh=(256, 128),
        base_size=(128, 72),
        crop_size=(128, 72),
        target_base_size=(128, 64),
        target_crop_size=(128, 64),
    )
    d.update(kw)
    return types.SimpleNamespace(**d)


def test_e2e_bench_smoke(tmp_path):
    sys.path.insert(0, ".")
    from experiments.bench_e2e import run_e2e

    result = run_e2e(_args(tmp_path))
    assert result["unit"] == "images/sec/chip"
    assert result["value"] > 0
    extra = result["extra"]
    # one epoch = floor(8/4) * 2 steps * (4 src + 4 tgt) images
    assert extra["epoch_images"] == 16
    for key in ("e2e_cold_imgs_per_sec", "e2e_warm_imgs_per_sec",
                "e2e_prepared_imgs_per_sec", "device_only_imgs_per_sec"):
        assert extra[key] > 0
    # per-epoch rates back the reported medians (VERDICT r3 #5)
    assert extra["timed_epochs_each"] == 1
    assert len(extra["e2e_cold_epoch_rates"]) == 1
    assert len(extra["e2e_warm_epoch_rates"]) == 1
    assert extra["e2e_cold_imgs_per_sec"] == extra["e2e_cold_epoch_rates"][0]
    assert np.isfinite(extra["final_loss"])
    assert "comparator_provenance" in extra
    json.dumps(result)  # must be JSON-serializable


def test_e2e_dataset_reused_not_regenerated(tmp_path):
    sys.path.insert(0, ".")
    import os

    from experiments.bench_e2e import ensure_dataset

    root = str(tmp_path / "data")
    ensure_dataset(root, n=2, src_wh=(64, 32), tgt_wh=(64, 32))
    probe = os.path.join(root, "GTA5", "images", "00000.png")
    mtime = os.path.getmtime(probe)
    ensure_dataset(root, n=2, src_wh=(64, 32), tgt_wh=(64, 32))
    assert os.path.getmtime(probe) == mtime  # stamp matched, no rewrite
    # different params -> regenerate
    ensure_dataset(root, n=3, src_wh=(64, 32), tgt_wh=(64, 32))
    assert os.path.exists(os.path.join(root, "GTA5", "images", "00002.png"))
