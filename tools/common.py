"""Shared loader/trainer assembly for the CLI tools.

Mirrors the reference's ``datasets_path`` dict + loader construction in
tools/solve_gta5.py (SURVEY.md C15/§5.6): per-dataset roots and split list
paths, overridable from the command line.
"""

from __future__ import annotations

import os

import jax

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.data import (
    CityscapesDataset,
    CrossCityDataset,
    GTA5Dataset,
    SegDataLoader,
    SynthiaDataset,
    TransformConfig,
)

DATASET_CLS = {
    "cityscapes": CityscapesDataset,
    "gta5": GTA5Dataset,
    "synthia": SynthiaDataset,
    "crosscity": CrossCityDataset,
}


def default_paths(data_root: str) -> dict:
    """Default per-dataset roots/list files under a shared datasets root."""
    return {
        "cityscapes": {
            "root": os.path.join(data_root, "Cityscapes"),
            "train": os.path.join(data_root, "Cityscapes", "train.txt"),
            "val": os.path.join(data_root, "Cityscapes", "val.txt"),
        },
        "gta5": {
            "root": os.path.join(data_root, "GTA5"),
            "train": os.path.join(data_root, "GTA5", "train.txt"),
            "val": os.path.join(data_root, "GTA5", "val.txt"),
        },
        "synthia": {
            "root": os.path.join(data_root, "SYNTHIA"),
            "train": os.path.join(data_root, "SYNTHIA", "train.txt"),
            "val": os.path.join(data_root, "SYNTHIA", "val.txt"),
        },
        "crosscity": {
            "root": os.path.join(data_root, "NTHU"),
            "train": os.path.join(data_root, "NTHU", "train.txt"),
            "val": os.path.join(data_root, "NTHU", "val.txt"),
        },
    }


def transform_cfg(cfg: TrainConfig, target: bool = False) -> TransformConfig:
    return TransformConfig(
        base_size=cfg.target_base_size if target else cfg.base_size,
        crop_size=cfg.target_crop_size if target else cfg.crop_size,
        random_mirror=cfg.random_mirror,
        random_crop=cfg.random_crop,
        gaussian_blur=cfg.gaussian_blur,
        numpy_transform=cfg.numpy_transform,
        device_normalize=cfg.device_normalize,
    )


def make_loader(
    cfg: TrainConfig,
    dataset_name: str,
    root: str,
    list_path: str,
    split: str,
    target: bool = False,
    **dataset_kw,
) -> SegDataLoader:
    cls = DATASET_CLS[dataset_name]
    if cfg.cache_dir:
        dataset_kw.setdefault(
            "cache_dir", os.path.join(cfg.cache_dir, f"{dataset_name}_{split}")
        )
    ds = cls(
        root,
        list_path,
        split=split,
        transform_cfg=transform_cfg(cfg, target=target),
        **dataset_kw,
    )
    # multi-host: batch sizes are GLOBAL; each process loads a disjoint
    # shard of size batch/process_count (SURVEY.md §5.8). Validation uses
    # cfg.eval_batch_size when set — forward-only graphs fit larger
    # batches and eval metrics are batch-invariant (BASELINE.md).
    batch = cfg.batch_size
    if split != "train" and cfg.eval_batch_size:
        batch = cfg.eval_batch_size
    procs = jax.process_count()
    if batch % procs != 0:  # not an assert: must survive python -O
        raise ValueError(
            f"global batch {batch} not divisible by {procs} processes"
        )
    if cfg.data_parallel:
        # fail BEFORE compile with an actionable message — otherwise the
        # first sharded device_put raises a sharding error mid-epoch
        from maxsquareloss_tpu.parallel.mesh import local_data_axis_size

        dp = local_data_axis_size(True, cfg.sp)
        if (batch // procs) % dp != 0:
            which = ("--eval_batch_size" if split != "train"
                     and cfg.eval_batch_size else "--batch_size")
            raise ValueError(
                f"per-process batch {batch // procs} not divisible by the "
                f"{dp}-way data-parallel axis ({jax.local_device_count()} "
                f"local devices / sp={max(1, cfg.sp)}); raise {which} to a "
                f"multiple of {dp * procs} or pass --data_parallel false"
            )
    if cfg.loader == "grain":
        from maxsquareloss_tpu.data.grain_pipeline import GrainSegLoader

        loader_cls = GrainSegLoader
    else:
        loader_cls = SegDataLoader
    return loader_cls(
        ds,
        batch_size=batch // procs,
        shuffle=split == "train",
        num_workers=cfg.num_workers,
        seed=cfg.seed,
        drop_last=split == "train",
        pad_last=split != "train",
        shard_index=jax.process_index(),
        shard_count=procs,
    )


def load_inference_params(cfg: TrainConfig):
    """``--pretrained_ckpt_file`` → (params, frozen) for inference tools.

    Accepts both native orbax checkpoint dirs and reference-layout torch
    ``.pth`` files (SURVEY.md §5.4); heads the .pth lacks (class-count
    changes) are filled from a fresh init. One shared helper for
    evaluate.py / predict.py / export_inference.py.
    """
    import jax.random

    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train import checkpoint as ckpt_lib
    from maxsquareloss_tpu.train.steps import model_config

    path = cfg.pretrained_ckpt_file
    if path.endswith((".pth", ".pt")):
        params, frozen = ckpt_lib.load_torch_pth(path, cfg.num_classes)
        init_p, _ = init_deeplabv2(jax.random.key(0), model_config(cfg))
        for k, v in init_p.items():
            params.setdefault(k, v)
        return params, frozen
    payload = ckpt_lib.load_checkpoint(path)
    state, frozen, _, _ = ckpt_lib.restore_train_state(payload)
    return state.params, frozen


def maybe_init_distributed(cfg: TrainConfig):
    """Runtime bring-up: multi-host init + persistent compilation cache.

    Must run before any other jax device use / first compilation."""
    from maxsquareloss_tpu.parallel.multihost import initialize_distributed
    from maxsquareloss_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache(cfg.compilation_cache_dir)
    initialize_distributed(
        cfg.coordinator_address, cfg.num_processes, cfg.process_id
    )
