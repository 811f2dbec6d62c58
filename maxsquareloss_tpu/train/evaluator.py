"""Standalone evaluation: single- and multi-scale (+flip) inference → mIoU.

Reproduces the reference's validation protocol (SURVEY.md §3.3) and its
multi-scale variant: per scale, resize the input (align-corners bilinear),
forward, upsample the main-head logits to label resolution, softmax; average
probabilities across scales (and the horizontal flip when enabled); argmax →
confusion matrix on device.
"""

from __future__ import annotations

import functools
from typing import Any, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.data.loader import device_prefetch
from maxsquareloss_tpu.metrics import Eval
from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2
from maxsquareloss_tpu.ops.resize import resize_bilinear_align_corners, upsample_logits
from maxsquareloss_tpu.parallel.mesh import batch_sharding
from maxsquareloss_tpu.train.steps import model_config, step_compiler_options


def make_multiscale_eval_step(
    cfg: TrainConfig,
    frozen: Any,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
    num_eval_classes: int | None = None,
):
    mcfg = model_config(cfg, eval_mode=True)
    n_eval = num_eval_classes or cfg.num_classes
    scales = tuple(float(s) for s in scales)

    @functools.partial(jax.jit, compiler_options=step_compiler_options(cfg))
    def step(params, x: jax.Array, y: jax.Array):
        h, w = x.shape[1], x.shape[2]
        out_hw = (y.shape[1], y.shape[2])

        def prob_for(img):
            _, main = apply_deeplabv2(params, frozen, img, mcfg)
            main = upsample_logits(main, out_hw)
            return jax.nn.softmax(main, axis=-1)

        prob = None
        for s in scales:
            sh, sw = max(1, round(h * s)), max(1, round(w * s))
            img = (
                x if (sh, sw) == (h, w)
                else resize_bilinear_align_corners(x, (sh, sw))
            )
            p = prob_for(img)
            if flip:
                p = p + prob_for(img[:, :, ::-1, :])[:, :, ::-1, :]
            prob = p if prob is None else prob + p
        argpred = jnp.argmax(prob, axis=-1).astype(jnp.int32)
        valid = (y >= 0) & (y < n_eval)
        gt_oh = jax.nn.one_hot(jnp.where(valid, y, 0), n_eval, dtype=jnp.float32)
        gt_oh = gt_oh * valid[..., None].astype(jnp.float32)
        pred_oh = jax.nn.one_hot(argpred, n_eval, dtype=jnp.float32)
        cm = jnp.einsum("nhwi,nhwj->ij", gt_oh, pred_oh)
        return cm, argpred

    return step


def evaluate(
    params: Any,
    frozen: Any,
    cfg: TrainConfig,
    loader: Iterable,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
    synthia_protocol: bool = False,
    mesh=None,
    logger=None,
) -> dict[str, float]:
    step = make_multiscale_eval_step(cfg, frozen, scales, flip)
    ev = Eval(cfg.num_classes)
    sharding = batch_sharding(mesh) if mesh is not None else None
    for xs, ys, _ in device_prefetch(iter(loader), sharding=sharding):
        cm, _ = step(params, xs, ys)
        ev.add_confusion_matrix(np.asarray(cm))
    out = {
        "PA": ev.Pixel_Accuracy(),
        "MPA": ev.Mean_Pixel_Accuracy(),
        "MIoU": ev.Mean_Intersection_over_Union(),
        "FWIoU": ev.Frequency_Weighted_Intersection_over_Union(),
    }
    if synthia_protocol:
        out["MIoU_16"] = ev.Mean_Intersection_over_Union_16()
        out["MIoU_13"] = ev.Mean_Intersection_over_Union_13()
    if logger is not None:
        logger.info(" ".join(f"{k}={v:.4f}" for k, v in out.items()))
        ev.Print_Every_class_Eval(logger)
    out["_eval"] = ev  # caller can print the per-class table
    return out
