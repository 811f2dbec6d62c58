"""Qualitative inference: write trainId + colorized prediction PNGs.

Covers the reference's qualitative-results workflow (colorize utilities of
datasets/cityscapes_Dataset.py — SURVEY.md C5 — driven from the validate()
image previews, §3.3) as a standalone batch tool. Labels are NOT required:
the tool iterates a split list of images, runs single- or multi-scale
(+flip) inference, and writes per-image

  <out>/<name>_trainids.png   (uint8 trainIds; 255 = ignore)
  <out>/<name>_color.png      (Cityscapes palette)

    python tools/predict.py --dataset cityscapes --data_root_path ./datasets \
        --pretrained_ckpt_file ./runs/gta5_iw/checkpoint_best \
        --output_dir ./preds --scales 0.75,1.0,1.25 --flip true
"""

from __future__ import annotations

import functools

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.config import add_train_args, config_from_args, str2bool
from maxsquareloss_tpu.data.palette import decode_labels
from maxsquareloss_tpu.data.transforms import img_transform
from maxsquareloss_tpu.train.steps import model_config, step_compiler_options
from maxsquareloss_tpu.utils.logging import setup_logger
from tools.common import default_paths


def make_predict_fn(cfg, frozen, scales, flip, out_hw):
    """Unjitted multi-scale (+flip) probability-averaged argmax core
    (SURVEY.md §3.3): (params, x_normalized_f32) -> int32 trainIds. Shared
    by the jitted predict step below and tools/export_inference.py.

    Like the evaluator, the upsample→softmax→average→argmax tail streams
    over output-row blocks per cfg.eval_h_chunk (auto by default: 256-row
    chunks when out_hw[0] > 512) — EXACT (row-local interpolation), and
    required at full-res output: an unchunked (N, 1024, 2048, C) prob
    tensor is ~2.5 GB fp32 at batch 16. The TTA head construction and
    row-sliced probability math are the evaluator's own
    (evaluator.tta_prob_rows — one shared copy)."""
    from maxsquareloss_tpu.train.evaluator import resolve_h_chunk, tta_prob_rows

    mcfg = model_config(cfg, eval_mode=True)
    scales = tuple(float(s) for s in scales)
    hc = resolve_h_chunk(cfg.eval_h_chunk, out_hw[0])

    def fn(params, x):
        prob_rows = tta_prob_rows(params, x, frozen, mcfg, scales, flip, out_hw)

        def arg_rows(r0, r1):
            return jnp.argmax(prob_rows(r0, r1), axis=-1).astype(jnp.int32)

        if not hc or hc >= out_hw[0]:
            return arg_rows(0, out_hw[0])
        return jnp.concatenate(
            [arg_rows(r0, min(r0 + hc, out_hw[0]))
             for r0 in range(0, out_hw[0], hc)],
            axis=1,
        )

    return fn


def make_predict_step(cfg, frozen, scales, flip, out_hw):
    """Jitted make_predict_fn (one compile per output size)."""
    return functools.partial(
        jax.jit, compiler_options=step_compiler_options(cfg)
    )(make_predict_fn(cfg, frozen, scales, flip, out_hw))


def main(argv=None):
    parser = argparse.ArgumentParser("predict")
    add_train_args(parser)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--scales", default="1.0", help="comma list, e.g. 0.75,1.0,1.25")
    parser.add_argument("--flip", type=str2bool, default=False)
    parser.add_argument("--native_size_output", type=str2bool, default=True,
                        help="write predictions at each image's native size "
                             "(logits upsampled align-corners); false = base_size")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    from maxsquareloss_tpu.utils.runtime import setup_compilation_cache

    setup_compilation_cache(cfg.compilation_cache_dir)
    logger = setup_logger(args.output_dir, "predict")
    os.makedirs(args.output_dir, exist_ok=True)

    if not cfg.pretrained_ckpt_file:
        parser.error("--pretrained_ckpt_file is required")
    from tools.common import load_inference_params

    params, frozen = load_inference_params(cfg)

    paths = default_paths(args.data_root_path)[cfg.dataset]
    list_path = args.list_path or paths["val"]
    with open(list_path) as f:
        items = [ln.split()[0] for ln in f if ln.strip()]

    if cfg.quantize == "int8":
        # post-training int8: calibrate activation ranges on the first
        # --calib_batches images of the run itself (batch-1, the exact
        # transform path the predictions use), then swap in the drop-in
        # int8 backbone tree (models/quantize.py)
        from maxsquareloss_tpu.models.quantize import calibrate, quantize_params

        def calib_batches():
            for rel in items[: max(1, cfg.calib_batches)]:
                pil = Image.open(os.path.join(paths["root"], rel)).convert("RGB")
                if pil.size != tuple(cfg.base_size):
                    pil = pil.resize(cfg.base_size, Image.BICUBIC)
                yield img_transform(pil, cfg.numpy_transform)[None]

        amax = calibrate(params, frozen, cfg, calib_batches())
        params = quantize_params(params, amax)
        logger.info(f"int8 PTQ: calibrated {len(amax)} conv sites; "
                    "backbone convs now int8 (heads stay fp)")

    # Spatial partitioning (--sp N): predict runs batch-1, so DP has
    # nothing to shard — instead shard the image HEIGHT over a pure-SP
    # (1, sp) mesh's 'space' axis (GSPMD conv halo exchanges;
    # parallel/mesh.py), regardless of --data_parallel. Bit-identical
    # outputs, tested in tests/test_predict.py. base_size height must
    # divide by sp (validated below).
    mesh = None
    if cfg.sp > 1:
        from maxsquareloss_tpu.parallel.mesh import make_mesh, replicate_tree

        if cfg.base_size[1] % cfg.sp:
            parser.error(
                f"--sp {cfg.sp} must divide the image height "
                f"(base_size H = {cfg.base_size[1]})"
            )
        mesh = make_mesh(data_parallel=False, sp=cfg.sp)
        params = replicate_tree(mesh, params)
        frozen = replicate_tree(mesh, frozen)

    scales = tuple(float(s) for s in args.scales.split(","))
    steps: dict[tuple[int, int], object] = {}  # one jit per output size
    n = 0
    for rel in items:
        img_path = os.path.join(paths["root"], rel)
        pil = Image.open(img_path).convert("RGB")
        native_wh = pil.size
        if pil.size != tuple(cfg.base_size):
            pil = pil.resize(cfg.base_size, Image.BICUBIC)
        x = img_transform(pil, cfg.numpy_transform)[None]
        out_wh = native_wh if args.native_size_output else tuple(cfg.base_size)
        out_hw = (out_wh[1], out_wh[0])
        if out_hw not in steps:
            steps[out_hw] = make_predict_step(cfg, frozen, scales, args.flip, out_hw)
        if mesh is not None:
            from maxsquareloss_tpu.parallel.mesh import batch_sharding

            xa = jax.device_put(x, batch_sharding(mesh))
        else:
            xa = jnp.asarray(x)
        pred = np.asarray(steps[out_hw](params, xa))[0]

        name = os.path.splitext(os.path.basename(rel))[0]
        ids = np.where(pred < 0, 255, pred).astype(np.uint8)
        Image.fromarray(ids).save(os.path.join(args.output_dir, f"{name}_trainids.png"))
        color = decode_labels(pred[None])[0].astype(np.uint8)
        Image.fromarray(color).save(os.path.join(args.output_dir, f"{name}_color.png"))
        n += 1
        if n % 50 == 0:
            logger.info(f"{n}/{len(items)} predicted")
    logger.info(f"wrote {n} predictions to {args.output_dir}")


if __name__ == "__main__":
    main()
