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
from maxsquareloss_tpu.metrics import Eval, confusion_matrix_update
from maxsquareloss_tpu.models.deeplabv2 import apply_deeplabv2
from maxsquareloss_tpu.ops.resize import resize_bilinear_align_corners
from maxsquareloss_tpu.parallel.mesh import batch_sharding
from maxsquareloss_tpu.train.steps import model_config, step_compiler_options


def resolve_h_chunk(h_chunk: int, out_h: int) -> int:
    """Resolve the eval row-chunk setting against the static label height.

    ``h_chunk < 0`` = auto: 256-row chunks whenever the label height exceeds
    512 (full-res protocols — chunked is measured strictly faster AND
    memory-bounded there, BASELINE.md "Flagship full-resolution eval"),
    unchunked otherwise. ``0`` = explicit off; positive values pass through.
    """
    if h_chunk < 0:
        return 256 if out_h > 512 else 0
    return h_chunk


def tta_prob_rows(params, x, frozen, mcfg, scales, flip, out_hw):
    """Build the TTA head set and return ``prob_rows(r0, r1)``.

    One forward per scale (align-corners input resize); flip TTA rides the
    same forward as a doubled batch (frozen BN → no cross-batch coupling;
    measured faster — BASELINE.md flip-TTA note). ``prob_rows`` yields the
    scale/flip-averaged probabilities for output rows [r0, r1) — raw
    logits when there is a single head, since argmax is softmax-invariant.
    This is the exactness-critical TTA core shared by the evaluator,
    tools/predict.py, and the serving exporter (round-4 review: keep ONE
    copy)."""
    h, w = x.shape[1], x.shape[2]

    def logits_for(img):
        _, main = apply_deeplabv2(params, frozen, img, mcfg)
        return main  # OS8 resolution — small; upsample happens per chunk

    n = x.shape[0]
    heads = []  # (logits, flipped_w) pairs, probability-summed below
    for s in scales:
        sh, sw = max(1, round(h * s)), max(1, round(w * s))
        img = (
            x if (sh, sw) == (h, w)
            else resize_bilinear_align_corners(x, (sh, sw))
        )
        if flip:
            both = logits_for(
                jnp.concatenate([img, img[:, :, ::-1, :]], axis=0)
            )
            heads.append((both[:n], False))
            heads.append((both[n:], True))
        else:
            heads.append((logits_for(img), False))

    def prob_rows(r0: int, r1: int):
        prob = None
        for logits, flipped in heads:
            up = resize_bilinear_align_corners(logits, out_hw, h_rows=(r0, r1))
            p = up if len(heads) == 1 else jax.nn.softmax(up, axis=-1)
            if flipped:
                p = p[:, :, ::-1, :]
            prob = p if prob is None else prob + p
        return prob

    return prob_rows


def make_multiscale_eval_step(
    cfg: TrainConfig,
    frozen: Any,
    scales: Sequence[float] = (1.0,),
    flip: bool = False,
    num_eval_classes: int | None = None,
    h_chunk: int | None = None,
):
    """Multi-scale (+flip) eval step: forward per scale, probability-averaged
    at label resolution, argmax → confusion-matrix partial.

    ``h_chunk`` (rows at OUTPUT resolution; default cfg.eval_h_chunk, 0=off)
    streams the upsample→softmax→argmax→CM tail over row blocks so the
    flagship full-res protocol (2048x1024 labels, SURVEY.md §3.3) never
    materializes the (N, 2048, 1024, C) probability tensor (~637 MB fp32 at
    batch 8, x3 with the one-hot CM) in HBM. EXACT: align-corners
    interpolation is row-local, and the matmul formulation chunks by simply
    slicing the H-interpolation matrix's output rows (ops/resize.py); each
    chunk's softmax/argmax/CM reads only its own rows.

    ``h_chunk=-1`` (the default via cfg) auto-selects: 256-row chunks
    whenever the label height exceeds 512 (full-res protocols — measured
    strictly faster AND memory-bounded, BASELINE.md), unchunked otherwise.
    The label height is static at trace time, so auto costs nothing.
    """
    mcfg = model_config(cfg, eval_mode=True)
    n_eval = num_eval_classes or cfg.num_classes
    scales = tuple(float(s) for s in scales)
    if h_chunk is None:
        h_chunk = cfg.eval_h_chunk

    @functools.partial(jax.jit, compiler_options=step_compiler_options(cfg))
    def step(params, x: jax.Array, y: jax.Array):
        from maxsquareloss_tpu.train.steps import _prepare_inputs

        x, y = _prepare_inputs(x, y, cfg)
        out_hw = (y.shape[1], y.shape[2])
        prob_rows = tta_prob_rows(params, x, frozen, mcfg, scales, flip, out_hw)
        hc = resolve_h_chunk(h_chunk, out_hw[0])
        if not hc or hc >= out_hw[0]:
            argpred = jnp.argmax(prob_rows(0, out_hw[0]), axis=-1).astype(jnp.int32)
            return confusion_matrix_update(y, argpred, n_eval), argpred

        cm = jnp.zeros((n_eval, n_eval), jnp.float32)
        parts = []
        for r0 in range(0, out_hw[0], hc):
            r1 = min(r0 + hc, out_hw[0])
            arg = jnp.argmax(prob_rows(r0, r1), axis=-1).astype(jnp.int32)
            cm = cm + confusion_matrix_update(y[:, r0:r1], arg, n_eval)
            parts.append(arg)
        return cm, jnp.concatenate(parts, axis=1)

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
