"""UDA training entrypoint: GTA5/SYNTHIA → Cityscapes.

Rebuild of the reference ``tools/solve_gta5.py`` (SURVEY.md C15/§3.2)::

    python tools/solve_gta5.py --source_dataset gta5 \
        --target_mode IW_maxsquare --lambda_target 0.09 --IW_ratio 0.2 \
        --pretrained_ckpt_file ./runs/gta5_source/checkpoint_latest \
        --checkpoint_dir ./runs/gta5_iw_maxsquare

Starts from a source-pretrained model (orbax dir or reference .pth) and
adapts on unlabeled Cityscapes train; validates on Cityscapes val (19-class,
or 16/13 when the source is SYNTHIA).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maxsquareloss_tpu.config import add_train_args, add_uda_train_args, config_from_args
from maxsquareloss_tpu.train.uda_trainer import UDATrainer
from tools.common import default_paths, make_loader, maybe_init_distributed


def build_uda_trainer(args, cfg):
    paths = default_paths(args.data_root_path)
    src_name = args.source_dataset
    src = paths[src_name]
    tgt = paths["cityscapes"]
    src_root = args.source_data_path or src["root"]
    src_list = args.source_list_path or src["train"]
    tgt_root = args.target_data_path or tgt["root"]
    tgt_list = args.target_list_path or tgt["train"]

    synthia = src_name == "synthia"
    source_loader = make_loader(
        cfg, src_name, src_root, src_list, "train", class_16=synthia
    )
    target_loader = make_loader(
        cfg, "cityscapes", tgt_root, tgt_list, "train", target=True,
        class_16=synthia,
    )
    val_loader = None
    if os.path.exists(tgt["val"]):
        val_loader = make_loader(
            cfg, "cityscapes", tgt_root, tgt["val"], "val", target=True,
            class_16=synthia,
        )
    return UDATrainer(
        cfg, source_loader, target_loader, val_loader,
        synthia_protocol=synthia,
    )


def main(argv=None):
    parser = argparse.ArgumentParser("solve_gta5")
    add_train_args(parser)
    add_uda_train_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    maybe_init_distributed(cfg)
    trainer = build_uda_trainer(args, cfg)
    trainer.main()


if __name__ == "__main__":
    main()
