"""Convert reference torch .pth checkpoints → orbax checkpoint dirs.

Makes the reference's released model zoo (caffe-converted pretrained init,
source-only and adapted models — SURVEY.md §5.4) loadable by this framework:
strips ``module.`` DataParallel prefixes, transposes conv kernels
OIHW→HWIO, folds BN into frozen scale/shift::

    python tools/convert_torch_ckpt.py \
        --input DeepLab_resnet_pretrained_init-f81d91e8.pth \
        --output ./runs/pretrained_init --num_classes 19
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.models.deeplabv2 import DeepLabV2Config, init_deeplabv2
from maxsquareloss_tpu.optim import init_sgd
from maxsquareloss_tpu.train import checkpoint as ckpt_lib
from maxsquareloss_tpu.train.steps import TrainState


def main(argv=None):
    p = argparse.ArgumentParser("convert_torch_ckpt")
    p.add_argument("--input", required=True, help="reference .pth file")
    p.add_argument("--output", required=True, help="orbax checkpoint dir to write")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--multi", action="store_true", default=True)
    args = p.parse_args(argv)

    params, frozen = ckpt_lib.load_torch_pth(args.input, args.num_classes)
    # fill any heads the .pth lacks (e.g. class-count change) with fresh init
    init_p, _ = init_deeplabv2(
        jax.random.key(0),
        DeepLabV2Config(num_classes=args.num_classes, multi_level=args.multi),
    )
    for k, v in init_p.items():
        params.setdefault(k, v)
    params = jax.tree.map(jnp.asarray, params)
    state = TrainState(
        params=params, opt=init_sgd(params), iteration=jnp.asarray(0, jnp.int32)
    )
    os.makedirs(args.output, exist_ok=True)
    # wait=True: a CLI one-shot must not exit while the async save is in
    # flight (orbax's executor is torn down at interpreter shutdown)
    ckpt_lib.save_checkpoint(
        args.output, state, frozen, epoch=0, best_miou=0.0, wait=True
    )
    print(f"wrote {os.path.join(args.output, ckpt_lib.LATEST)}")


if __name__ == "__main__":
    main()
