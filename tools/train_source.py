"""Source-only supervised training entrypoint.

Rebuild of the reference ``tools/train_source.py`` (SURVEY.md C14/§3.1):
argparse → Trainer(args).main(). Flag names match the reference so
published commands translate 1:1, e.g.::

    python tools/train_source.py --dataset gta5 \
        --data_root_path ./datasets --checkpoint_dir ./runs/gta5_source \
        --base_size 1280,720 --crop_size 1280,640 --iter_max 200000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maxsquareloss_tpu.config import add_train_args, config_from_args
from maxsquareloss_tpu.train.trainer import Trainer
from tools.common import default_paths, make_loader, maybe_init_distributed


def main(argv=None):
    parser = argparse.ArgumentParser("train_source")
    add_train_args(parser)
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    maybe_init_distributed(cfg)

    paths = default_paths(args.data_root_path)[cfg.dataset]
    train_list = args.list_path or paths["train"]
    train_loader = make_loader(
        cfg, cfg.dataset, paths["root"], train_list, "train",
        class_16=cfg.class_16, class_13=cfg.class_13,
    )
    val_loader = None
    if os.path.exists(paths["val"]):
        val_loader = make_loader(
            cfg, cfg.dataset, paths["root"], paths["val"], "val",
            class_16=cfg.class_16, class_13=cfg.class_13,
        )

    trainer = Trainer(
        cfg, train_loader, val_loader,
        synthia_protocol=cfg.dataset == "synthia" or cfg.class_16,
    )
    trainer.main()


if __name__ == "__main__":
    main()
