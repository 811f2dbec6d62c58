"""Cross-city UDA entrypoint: Cityscapes → NTHU {Rio, Rome, Tokyo, Taipei}.

Rebuild of the reference ``tools/solve_crosscity.py`` (SURVEY.md C16):
13-class protocol, source = Cityscapes(train, labeled), target = the chosen
city (unlabeled train split), val = the city's small labeled split::

    python tools/solve_crosscity.py --city_name Rio \
        --target_mode IW_maxsquare --num_classes 13 \
        --pretrained_ckpt_file ./runs/cityscapes_source/checkpoint_latest
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maxsquareloss_tpu.config import add_train_args, add_uda_train_args, config_from_args
from maxsquareloss_tpu.data.crosscity import CITIES
from maxsquareloss_tpu.train.uda_trainer import UDATrainer
from tools.common import default_paths, make_loader, maybe_init_distributed


def main(argv=None):
    parser = argparse.ArgumentParser("solve_crosscity")
    add_train_args(parser)
    add_uda_train_args(parser)
    parser.add_argument("--city_name", default="Rio", choices=CITIES)
    parser.set_defaults(num_classes=13, class_13=True)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    maybe_init_distributed(cfg)

    paths = default_paths(args.data_root_path)
    cs, nthu = paths["cityscapes"], paths["crosscity"]
    source_loader = make_loader(
        cfg, "cityscapes", args.source_data_path or cs["root"],
        args.source_list_path or cs["train"], "train",
        class_13=True, relabel_13=True,
    )
    target_loader = make_loader(
        cfg, "crosscity", args.target_data_path or nthu["root"],
        args.target_list_path or nthu["train"], "train", target=True,
        city_name=args.city_name, relabel_13=True,
    )
    val_loader = None
    if os.path.exists(nthu["val"]):
        val_loader = make_loader(
            cfg, "crosscity", args.target_data_path or nthu["root"],
            nthu["val"], "val", target=True,
            city_name=args.city_name, relabel_13=True,
        )
    trainer = UDATrainer(cfg, source_loader, target_loader, val_loader)
    trainer.main()


if __name__ == "__main__":
    main()
