"""Evaluation entrypoint: single/multi-scale (+flip) val mIoU.

Covers the reference's in-training validate() as a standalone tool plus the
multi-scale inference protocol used for the published numbers
(SURVEY.md §3.3)::

    python tools/evaluate.py --dataset cityscapes \
        --pretrained_ckpt_file ./runs/gta5_iw_maxsquare/checkpoint_best \
        --scales 0.75,1.0,1.25 --flip true
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from maxsquareloss_tpu.config import add_train_args, config_from_args, str2bool
from maxsquareloss_tpu.parallel.mesh import make_mesh, replicate_tree
from maxsquareloss_tpu.train.evaluator import evaluate
from maxsquareloss_tpu.utils.logging import setup_logger
from tools.common import default_paths, make_loader, maybe_init_distributed


def main(argv=None):
    parser = argparse.ArgumentParser("evaluate")
    add_train_args(parser)
    parser.add_argument("--scales", default="1.0", help="comma list, e.g. 0.75,1.0,1.25")
    parser.add_argument("--flip", type=str2bool, default=False)
    parser.add_argument("--full_res_labels", type=str2bool, default=False,
                        help="keep labels at native resolution; predictions are"
                             " upsampled to label size (reference §3.3 variant)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    maybe_init_distributed(cfg)
    logger = setup_logger(cfg.checkpoint_dir, "evaluate")

    if not cfg.pretrained_ckpt_file:
        parser.error("--pretrained_ckpt_file is required")
    from tools.common import load_inference_params

    params, frozen = load_inference_params(cfg)

    paths = default_paths(args.data_root_path)[cfg.dataset]
    loader = make_loader(
        cfg, cfg.dataset, paths["root"], args.list_path or paths["val"], "val",
        class_16=cfg.class_16, class_13=cfg.class_13,
        full_res_labels=args.full_res_labels,
    )

    if cfg.quantize == "int8":
        # post-training int8: calibrate on the first --calib_batches val
        # batches (a fresh loader pass — evaluation below re-iterates from
        # the start, so no samples are skipped), then swap in the drop-in
        # int8 backbone tree (models/quantize.py)
        from maxsquareloss_tpu.models.quantize import quantize_from_loader

        params = quantize_from_loader(cfg, params, frozen, loader, logger)

    mesh = make_mesh(cfg.data_parallel, cfg.sp)
    if mesh is not None:
        params = replicate_tree(mesh, params)
        frozen = replicate_tree(mesh, frozen)
    scales = tuple(float(s) for s in args.scales.split(","))
    out = evaluate(
        params, frozen, cfg, loader,
        scales=scales, flip=args.flip,
        synthia_protocol=cfg.class_16, mesh=mesh, logger=logger,
    )
    del out["_eval"]
    print(out)


if __name__ == "__main__":
    main()
