"""Config / CLI flag parity tests."""

import argparse

from maxsquareloss_tpu.config import (
    TrainConfig,
    add_train_args,
    add_uda_train_args,
    config_from_args,
)


def _parse(argv):
    p = argparse.ArgumentParser()
    add_train_args(p)
    add_uda_train_args(p)
    return p.parse_args(argv)


def test_reference_command_translates(tmp_path):
    """A published-style reference command parses flag-for-flag."""
    args = _parse([
        "--dataset", "gta5",
        "--checkpoint_dir", str(tmp_path),
        "--base_size", "1280,720",
        "--crop_size", "1280,640",
        "--target_mode", "IW_maxsquare",
        "--lambda_target", "0.09",
        "--IW_ratio", "0.2",
        "--threshold", "0.95",
        "--multi", "true",
        "--iter_max", "200000",
        "--poly_power", "0.9",
        "--freeze_bn", "true",
        "--numpy_transform", "true",
    ])
    cfg = config_from_args(args)
    assert cfg.base_size == (1280, 720)
    assert cfg.crop_size == (1280, 640)
    assert cfg.target_mode == "IW_maxsquare"
    assert cfg.ratio == 0.2          # --IW_ratio maps to cfg.ratio
    assert cfg.lambda_target == 0.09
    assert cfg.threshold == 0.95
    assert cfg.multi and cfg.freeze_bn and cfg.numpy_transform
    assert cfg.iter_max == 200000 and cfg.poly_power == 0.9


def test_defaults_match_reference():
    cfg = TrainConfig()
    assert cfg.lr == 2.5e-4
    assert cfg.momentum == 0.9
    assert cfg.weight_decay == 5e-4
    assert cfg.poly_power == 0.9
    assert cfg.ratio == 0.2
    assert cfg.num_classes == 19
    assert cfg.blocks == (3, 4, 23, 3)


def test_sp_flag_validation(tmp_path):
    import pytest

    args = _parse(["--checkpoint_dir", str(tmp_path), "--sp", "4"])
    assert config_from_args(args).sp == 4
    # pure SP: --sp with --data_parallel false is the batch-1 serving combo
    cfg = config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path), "--sp", "2",
        "--data_parallel", "false",
    ]))
    assert cfg.sp == 2 and not cfg.data_parallel
    with pytest.raises(ValueError, match="--sp must be >= 1"):
        config_from_args(_parse(["--checkpoint_dir", str(tmp_path), "--sp", "0"]))
    # heights sharded under the 'space' axis must split evenly — fail at
    # parse time, not mid-run inside jax.device_put
    with pytest.raises(ValueError, match="must divide the image height"):
        config_from_args(_parse([
            "--checkpoint_dir", str(tmp_path), "--sp", "8",
            "--crop_size", "1280,644",
        ]))


def test_size_string_roundtrip(tmp_path):
    args = _parse(["--checkpoint_dir", str(tmp_path), "--target_base_size", "1024,512"])
    cfg = config_from_args(args)
    assert cfg.target_base_size == (1024, 512)


def test_guidance_mask_flag(tmp_path):
    args = _parse(["--checkpoint_dir", str(tmp_path), "--guidance_mask", "per_head_or"])
    assert config_from_args(args).guidance_mask == "per_head_or"
    assert TrainConfig().guidance_mask == "ensemble"


def test_iw_hist_flag(tmp_path):
    args = _parse(["--checkpoint_dir", str(tmp_path), "--iw_hist", "argmax"])
    assert config_from_args(args).iw_hist == "argmax"
    assert TrainConfig().iw_hist == "guidance"  # reference parity default


def test_train_id_checkpoint_dir_shim(tmp_path):
    """init_args convenience: run dir derived from a train-id/tag."""
    import os

    args = _parse(["--checkpoint_dir", str(tmp_path), "--train_id", "exp7"])
    cfg = config_from_args(args)
    assert cfg.checkpoint_dir == os.path.join(str(tmp_path), "exp7")
    assert os.path.isdir(cfg.checkpoint_dir)

    args = _parse([
        "--checkpoint_dir", str(tmp_path), "--train_id", "auto",
        "--dataset", "gta5", "--target_mode", "IW_maxsquare",
    ])
    cfg = config_from_args(args)
    assert cfg.checkpoint_dir == os.path.join(
        str(tmp_path), "gta5_deeplabv2_multi_IW_maxsquare"
    )


def test_eval_batch_size_applies_to_val_loaders_only(tmp_path):
    """--eval_batch_size sizes val/eval loaders; train loaders keep
    --batch_size (metrics are batch-invariant; BASELINE.md 'Eval batch
    size')."""
    import numpy as np
    from PIL import Image

    from tools.common import make_loader

    root = tmp_path / "data"
    rel = "leftImg8bit/val/x/x_000000_leftImg8bit.png"
    lrel = rel.replace("leftImg8bit", "gtFine", 1).replace(
        "_leftImg8bit.png", "_gtFine_labelIds.png"
    )
    (root / rel).parent.mkdir(parents=True)
    (root / lrel).parent.mkdir(parents=True)
    Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(root / rel)
    Image.fromarray(np.zeros((16, 32), np.uint8)).save(root / lrel)
    (root / "val.txt").write_text(rel)

    args = _parse(["--checkpoint_dir", str(tmp_path / "run"),
                   "--batch_size", "8", "--eval_batch_size", "16",
                   "--base_size", "32,16", "--crop_size", "32,16"])
    cfg = config_from_args(args)
    assert cfg.eval_batch_size == 16
    val = make_loader(cfg, "cityscapes", str(root), str(root / "val.txt"), "val")
    train = make_loader(cfg, "cityscapes", str(root), str(root / "val.txt"), "train")
    assert val.batch_size == 16 and train.batch_size == 8
    # default 0 = same as batch_size (no behavior change)
    assert TrainConfig().eval_batch_size == 0
    cfg0 = config_from_args(_parse(["--checkpoint_dir", str(tmp_path / "r2"),
                                    "--batch_size", "8"]))
    assert make_loader(
        cfg0, "cityscapes", str(root), str(root / "val.txt"), "val"
    ).batch_size == 8


def test_every_config_field_is_cli_reachable():
    """Every TrainConfig field must be settable from the CLI (directly as
    --<field>, or via a documented alias) — README advertises the config
    surface as flags, and a field that silently loses its flag regresses
    users (round-4 find: --concat_batches was documented but unregistered)."""
    import argparse
    import dataclasses

    from maxsquareloss_tpu.config import add_train_args, add_uda_train_args

    p = add_uda_train_args(add_train_args(argparse.ArgumentParser()))
    flags = {s[2:] for a in p._actions for s in a.option_strings
             if s.startswith("--")}
    aliases = {"ratio": "IW_ratio"}  # reference flag name kept for parity
    missing = [
        f.name for f in dataclasses.fields(TrainConfig)
        if f.name not in flags and aliases.get(f.name) not in flags
    ]
    assert not missing, f"TrainConfig fields with no CLI flag: {missing}"


def test_quantize_gated_against_sp(tmp_path):
    """--quantize int8 + --sp is rejected up front: XLA's GSPMD partitioner
    mistypes the zero constant it pads s8 conv-input halos with ("element
    types of the operands to Pad do not match", jax 0.9.0), and no pad
    placement from user code avoids its own halo-alignment pads. Composing
    int8 with DP / multi-host works (batch sharding needs no halos)."""
    import pytest

    with pytest.raises(ValueError, match="does not compose with --sp"):
        config_from_args(_parse([
            "--checkpoint_dir", str(tmp_path), "--quantize", "int8",
            "--sp", "4",
        ]))
    # sp alone and quantize alone both still configure fine
    assert config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path), "--sp", "4"])).sp == 4
    assert config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path), "--quantize", "int8",
    ])).quantize == "int8"


def test_loader_rejects_batch_not_divisible_by_mesh(tmp_path):
    """A batch that cannot shard over the data-parallel axis must fail at
    loader construction with an actionable message — not as a sharding
    error from the first device_put mid-epoch (round-4 verify finding:
    the config default batch 4 on the 8-device mesh)."""
    import numpy as np
    import pytest
    from PIL import Image

    from tools.common import make_loader

    root = tmp_path / "data"
    rel = "leftImg8bit/val/x/x_000000_leftImg8bit.png"
    lrel = rel.replace("leftImg8bit", "gtFine", 1).replace(
        "_leftImg8bit.png", "_gtFine_labelIds.png"
    )
    (root / rel).parent.mkdir(parents=True)
    (root / lrel).parent.mkdir(parents=True)
    Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(root / rel)
    Image.fromarray(np.zeros((16, 32), np.uint8)).save(root / lrel)
    (root / "val.txt").write_text(rel)

    cfg = config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path / "run"), "--batch_size", "4",
        "--base_size", "32,16", "--crop_size", "32,16",
    ]))
    with pytest.raises(ValueError, match="data-parallel axis"):
        make_loader(cfg, "cityscapes", str(root), str(root / "val.txt"), "val")
    # --data_parallel false lifts the constraint (single-device run)
    cfg1 = config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path / "r1"), "--batch_size", "4",
        "--data_parallel", "false",
        "--base_size", "32,16", "--crop_size", "32,16",
    ]))
    assert make_loader(
        cfg1, "cityscapes", str(root), str(root / "val.txt"), "val"
    ).batch_size == 4


def test_xla_options_flag(tmp_path, monkeypatch):
    args = _parse(["--checkpoint_dir", str(tmp_path),
                   "--xla_options", "xla_tpu_scoped_vmem_limit_kib=16384"])
    cfg = config_from_args(args)
    from maxsquareloss_tpu.train import steps
    from maxsquareloss_tpu.train.steps import step_compiler_options

    assert step_compiler_options(cfg) == {
        "xla_tpu_scoped_vmem_limit_kib": "16384"
    }
    # explicit options tolerate whitespace around entries and keys/values
    cfg2 = config_from_args(_parse([
        "--checkpoint_dir", str(tmp_path),
        "--xla_options", "a=1, b = 2 ,",
    ]))
    assert step_compiler_options(cfg2) == {"a": "1", "b": "2"}
    # 'auto' is backend-dependent: pin both branches via monkeypatch so the
    # test passes identically on CPU and TPU-attached hosts (ADVICE r2)
    monkeypatch.setattr(steps.jax, "default_backend", lambda: "cpu")
    assert step_compiler_options(TrainConfig()) is None
    monkeypatch.setattr(steps.jax, "default_backend", lambda: "tpu")
    assert step_compiler_options(TrainConfig()) == {
        "xla_tpu_scoped_vmem_limit_kib": "49152"
    }
