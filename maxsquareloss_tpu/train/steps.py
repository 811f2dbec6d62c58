"""Jitted train / eval steps: the framework's hot path.

Rebuild of the per-iteration bodies of the reference trainers
(tools/train_source.py Trainer.train_one_epoch and tools/solve_gta5.py
UDATrainer — SURVEY.md §3.1/§3.2), redesigned for XLA:

- ONE fused jit per step: forward(s) + upsample + loss(es) + backward +
  torch-SGD update. The reference runs two forwards and two backwards per
  UDA step (source, then target) and relies on grad accumulation; gradients
  add linearly, so a single grad of the combined loss is semantically
  identical at fp32 (SURVEY.md §3.2 note) and lets XLA share scheduling.
- The per-iteration poly LR is computed inside the step from the traced
  iteration counter — no recompiles, no host round trip.
- The IW histogram runs on device (the reference syncs to CPU per image per
  step — SURVEY.md C10).
- Buffers are donated: params/opt-state update in place in HBM.

Data parallelism: these steps are sharding-agnostic. Under a
``jax.sharding.Mesh`` with the batch sharded on the 'data' axis and params
replicated (see parallel/mesh.py), XLA inserts the gradient all-reduce over
ICI automatically — the TPU-native replacement for the reference's
``nn.DataParallel`` (SURVEY.md C18/§5.8).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.config import TrainConfig
from maxsquareloss_tpu.models.deeplabv2 import (
    DeepLabV2Config,
    apply_deeplabv2,
    lr_mult_tree,
    make_canvas_masks,
    valid_logits_hw,
)
from maxsquareloss_tpu.ops.losses import (
    cross_entropy,
    entropy_loss,
    iw_entropy_loss,
    iw_max_square_loss,
    max_square_loss,
    self_produced_guidance,
)
from maxsquareloss_tpu.ops.resize import upsample_logits
from maxsquareloss_tpu.optim import SGDState, init_sgd, poly_lr, sgd_update


class TrainState(NamedTuple):
    params: Any
    opt: SGDState
    iteration: jax.Array  # int32 global iteration (drives poly LR)


def make_train_state(params: Any) -> TrainState:
    return TrainState(
        params=params, opt=init_sgd(params), iteration=jnp.asarray(0, jnp.int32)
    )


def model_config(cfg: TrainConfig, eval_mode: bool = False) -> DeepLabV2Config:
    """``eval_mode`` turns on forward-only optimizations (ASPP matmul)."""
    return DeepLabV2Config(
        num_classes=cfg.num_classes,
        multi_level=cfg.multi,
        blocks=tuple(cfg.blocks),
        compute_dtype=cfg.dtype,
        remat=cfg.remat,
        aspp_matmul=eval_mode,
    )


def step_compiler_options(cfg: TrainConfig) -> dict[str, str] | None:
    """Per-compile XLA options for the jitted steps (cfg.xla_options).

    'auto' applies the measured-best set on TPU backends and nothing on
    CPU/GPU; '' disables; 'k=v,k=v' passes explicit options. Scoped VMEM:
    32M gave +3.8% UDA-step throughput over the compiler default (round-2b
    sweep); the late-round-4 re-sweep found 48M equal to 32M on bf16
    train/infer and fp32+remat (all within the ~0.7% same-session noise)
    and +1.6-2% on int8 inference (smaller int8 working set -> deeper
    scoped allocation pays), so 48M is the default (BASELINE.md "XLA
    compiler options").
    """
    spec = cfg.xla_options
    if not spec:
        return None
    if spec == "auto":
        if jax.default_backend() not in ("tpu", "axon"):
            return None
        return {"xla_tpu_scoped_vmem_limit_kib": "49152"}
    opts: dict[str, str] = {}
    for kv in spec.split(","):
        kv = kv.strip()
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"--xla_options entry {kv!r} is not of the form key=value"
            )
        k, v = kv.split("=", 1)
        opts[k.strip()] = v.strip()
    return opts


def _prepare_inputs(x, y, cfg: TrainConfig):
    """On-device normalize for uint8-shipped batches (+ int8 label widening).

    With ``--device_normalize`` the host pipeline ships raw uint8 RGB images
    and int8 trainId labels (4x less host->device traffic); the exact same
    IEEE-f32 normalization the host would do (data/transforms.img_transform)
    runs here instead. uint8->f32 casts are exact, so the caffe path
    (numpy_transform=True, the protocol default) is BITWISE identical; the
    torchvision path is within 1-2 ulp (XLA fuses its divide chain).
    Tested: tests/test_data.py TestDeviceNormalize. float32 inputs pass
    through untouched (legacy host-normalized path).
    """
    if x is not None and x.dtype == jnp.uint8:
        from maxsquareloss_tpu.data.palette import (
            IMAGENET_MEAN,
            IMAGENET_STD,
            IMG_MEAN,
        )

        xf = x.astype(jnp.float32)
        if cfg.numpy_transform:
            x = xf[..., ::-1] - jnp.asarray(IMG_MEAN, jnp.float32)
        else:
            x = (xf / 255.0 - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
                IMAGENET_STD, jnp.float32
            )
    if y is not None and y.dtype != jnp.int32:
        y = y.astype(jnp.int32)
    return x, y


def _forward_upsampled(params, frozen, x, mcfg, out_hw):
    """Forward + align-corners upsample of both heads to label resolution."""
    aux, main = apply_deeplabv2(params, frozen, x, mcfg)
    main = upsample_logits(main, out_hw)
    if aux is not None:
        aux = upsample_logits(aux, out_hw)
    return aux, main


def _source_loss(params, frozen, x, y, cfg: TrainConfig, mcfg):
    aux, main = _forward_upsampled(params, frozen, x, mcfg, y.shape[-2:])
    loss = cross_entropy(main, y)
    metrics = {"loss_source": loss}
    if aux is not None:
        loss_aux = cross_entropy(aux, y)
        metrics["loss_source_aux"] = loss_aux
        loss = loss + cfg.lambda_seg * loss_aux
    return loss, metrics


def target_loss_fn(
    prob_main: jax.Array,
    prob_aux: jax.Array | None,
    cfg: TrainConfig,
) -> tuple[jax.Array, jax.Array | None, dict[str, jax.Array]]:
    """Mode-dispatched target loss (reference target_mode branch, §3.2).

    Returns (target_loss, guidance_label_or_None, metrics). With multi-level
    guidance the pseudo-label from the head ensemble feeds both the IW
    histogram and the aux head's hard CE.
    """
    c = prob_main.shape[-1]
    label = None
    if prob_aux is not None:
        label = self_produced_guidance(
            prob_main, prob_aux, cfg.threshold, mask_mode=cfg.guidance_mask
        )
    metrics: dict[str, jax.Array] = {}
    mode = cfg.target_mode
    # --iw_hist argmax: count the IW histogram on the unthresholded argmax
    # (single-head behavior) instead of the thresholded guidance label —
    # makes the degenerate w_c=1.0 branch unreachable (config.py, BASELINE.md
    # "Multi-arm collapse"). The guidance label itself still feeds the
    # aux-head CE below.
    hist_label = label if cfg.iw_hist == "guidance" else None
    if mode == "maxsquare":
        loss = max_square_loss(prob_main)
    elif mode == "IW_maxsquare":
        loss = iw_max_square_loss(
            prob_main, hist_label, num_classes=c, ratio=cfg.ratio
        )
    elif mode == "entropy":
        loss = entropy_loss(prob_main)
    elif mode == "IW_entropy":
        loss = iw_entropy_loss(
            prob_main, hist_label, num_classes=c, ratio=cfg.ratio
        )
    elif mode == "hard":
        if label is None:
            maxp = jnp.max(prob_main, axis=-1)
            arg = jnp.argmax(prob_main, axis=-1).astype(jnp.int32)
            label = jnp.where(maxp > cfg.threshold, arg, jnp.int32(-1))
            label = jax.lax.stop_gradient(label)
        # hard pseudo-label CE on log-probabilities of the main head
        # (one-hot contraction, not take_along_axis — gathers are slow on TPU)
        logp = jnp.log(jnp.clip(prob_main, 1e-30, 1.0))
        valid = label != -1
        oh = jax.nn.one_hot(label, c, dtype=logp.dtype)
        nll = -jnp.sum(logp * oh, axis=-1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    else:
        raise ValueError(f"unknown target_mode {mode!r}")
    metrics["loss_target_raw"] = loss
    if label is not None:
        metrics["guidance_valid_frac"] = jnp.mean((label != -1).astype(jnp.float32))
    if mode in ("IW_maxsquare", "IW_entropy"):
        # Degenerate-weight canary (logged every step, CSE'd with the loss's
        # own computation): the reference weight formula
        # 1/max(hist_c^a * T^(1-a), 1) assigns weight 1.0 — ~T times the
        # normal 1/T scale — to any class with hist_c == 0. With guidance
        # labels (multi) the histogram is thresholded, so argmax classes
        # whose pixels never clear the confidence threshold hit this branch
        # and the loss inflates by ~T. iw_pixel_w_max == 1.0 is that branch
        # firing; see BASELINE.md "Adaptation efficacy" for the measured
        # collapse it causes at small scale.
        from maxsquareloss_tpu.ops.histogram import class_histogram, iw_class_weights

        argpred = jnp.argmax(prob_main, axis=-1).astype(jnp.int32)
        count_label = (
            argpred if hist_label is None else hist_label.astype(jnp.int32)
        )
        w = iw_class_weights(class_histogram(count_label, c), cfg.ratio)
        pixel_w = jnp.einsum(
            "nhwc,nc->nhw", jax.nn.one_hot(argpred, c, dtype=w.dtype), w
        )
        metrics["iw_pixel_w_max"] = jnp.max(pixel_w)
        metrics["iw_pixel_w_mean"] = jnp.mean(pixel_w)
    return loss, label, metrics


def _apply_update(state: TrainState, grads, lr_mults, cfg: TrainConfig):
    lr = poly_lr(cfg.lr, state.iteration, cfg.iter_max, cfg.poly_power)
    new_params, new_opt = sgd_update(
        state.params, grads, state.opt, lr, lr_mults,
        momentum=cfg.momentum, weight_decay=cfg.weight_decay,
    )
    return (
        TrainState(new_params, new_opt, state.iteration + 1),
        lr,
    )


# ------------------------------------------------------------- factory ----


def make_supervised_train_step(cfg: TrainConfig, frozen):
    """Source-only supervised step (reference Trainer.train_one_epoch body)."""
    mcfg = model_config(cfg)

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options=step_compiler_options(cfg),
    )
    def step(state: TrainState, x: jax.Array, y: jax.Array):
        x, y = _prepare_inputs(x, y, cfg)
        lr_mults = lr_mult_tree(state.params)

        def loss_fn(params):
            return _source_loss(params, frozen, x, y, cfg, mcfg)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state, lr = _apply_update(state, grads, lr_mults, cfg)
        metrics.update({"loss": loss, "lr": lr})
        return state, metrics

    return step


def make_uda_train_step(cfg: TrainConfig, frozen):
    """Fused UDA step over a (source, target) batch pair.

    Reference semantics (SURVEY.md §3.2): source CE backward + lambda_target
    * target-loss backward (+ aux-head guidance CE when multi), ONE optimizer
    step per pair — here as a single grad of the summed loss.
    """
    mcfg = model_config(cfg)

    @functools.partial(
        jax.jit, donate_argnums=(0,),
        compiler_options=step_compiler_options(cfg),
    )
    def step(state: TrainState, xs: jax.Array, ys: jax.Array, xt: jax.Array):
        xs, ys = _prepare_inputs(xs, ys, cfg)
        xt, _ = _prepare_inputs(xt, None, cfg)
        lr_mults = lr_mult_tree(state.params)

        def loss_fn(params):
            if cfg.concat_batches:
                # frozen BN → no cross-batch coupling: one concatenated
                # forward over [source; target] is exactly equivalent to two
                # and runs bigger matmuls on the MXU. Unequal crops (the real
                # GTA5 protocol: 1280x640 source vs 1024x512 target) ride the
                # exact masked-canvas path: pad onto a shared canvas, re-zero
                # the pad region before every spatial op, slice the valid
                # logits back out (models/deeplabv2.py canvas helpers).
                n = xs.shape[0]
                src_hw = (xs.shape[1], xs.shape[2])
                tgt_hw = (xt.shape[1], xt.shape[2])
                canvas = (max(src_hw[0], tgt_hw[0]), max(src_hw[1], tgt_hw[1]))

                def to_canvas(img, hw):
                    ph, pw = canvas[0] - hw[0], canvas[1] - hw[1]
                    if ph or pw:
                        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)))
                    return img

                x_all = jnp.concatenate(
                    [to_canvas(xs, src_hw), to_canvas(xt, tgt_hw)], axis=0
                )
                masks = make_canvas_masks(
                    canvas, [(n, src_hw), (xt.shape[0], tgt_hw)]
                )
                aux_all, main_all = apply_deeplabv2(
                    params, frozen, x_all, mcfg, masks
                )
                svh, svw = valid_logits_hw(src_hw)
                tvh, tvw = valid_logits_hw(tgt_hw)
                out_hw = (ys.shape[1], ys.shape[2])
                main_s = upsample_logits(main_all[:n, :svh, :svw], out_hw)
                main_t = upsample_logits(main_all[n:, :tvh, :tvw], tgt_hw)
                aux_s = aux_t = None
                if aux_all is not None:
                    aux_s = upsample_logits(aux_all[:n, :svh, :svw], out_hw)
                    aux_t = upsample_logits(aux_all[n:, :tvh, :tvw], tgt_hw)
                src_loss = cross_entropy(main_s, ys)
                metrics = {"loss_source": src_loss}
                if aux_s is not None:
                    loss_aux = cross_entropy(aux_s, ys)
                    metrics["loss_source_aux"] = loss_aux
                    src_loss = src_loss + cfg.lambda_seg * loss_aux
            else:
                src_loss, metrics = _source_loss(params, frozen, xs, ys, cfg, mcfg)
                aux_t, main_t = _forward_upsampled(
                    params, frozen, xt, mcfg, (xt.shape[1], xt.shape[2])
                )
            prob_main = jax.nn.softmax(main_t, axis=-1)
            prob_aux = jax.nn.softmax(aux_t, axis=-1) if aux_t is not None else None
            tgt_loss, label, tmetrics = target_loss_fn(prob_main, prob_aux, cfg)
            metrics.update(tmetrics)
            total = src_loss + cfg.lambda_target * tgt_loss
            if aux_t is not None and label is not None:
                # self-produced guidance: aux head supervised with the hard
                # ensemble pseudo-label
                loss_aux_t = cross_entropy(aux_t, label)
                metrics["loss_target_aux"] = loss_aux_t
                total = total + cfg.lambda_target * cfg.lambda_seg * loss_aux_t
            metrics["loss_target"] = cfg.lambda_target * tgt_loss
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state, lr = _apply_update(state, grads, lr_mults, cfg)
        metrics.update({"loss": loss, "lr": lr})
        return state, metrics

    return step


def make_eval_step(cfg: TrainConfig, frozen, num_eval_classes: int | None = None):
    """Validation step: forward → upsample to label size → argmax → CM partial.

    Mirrors reference validate() (§3.3): main head only, align-corners
    upsample to the label resolution, device-side confusion-matrix update.
    ``cfg.eval_h_chunk`` streams the upsample→argmax→CM tail over output-row
    blocks (exact — row-local interpolation via the sliced H matmul) so
    full-res label protocols never materialize (N, H_full, W_full, C).

    Delegates to the multiscale evaluator with a single scale-1.0 head —
    exact: with one head the evaluator argmaxes raw logits (no softmax),
    the chunked/unchunked tails are the evaluator's, and the resize math is
    the identical sliced H matmul.
    """
    from maxsquareloss_tpu.train.evaluator import make_multiscale_eval_step

    return make_multiscale_eval_step(
        cfg, frozen, scales=(1.0,), flip=False, num_eval_classes=num_eval_classes
    )
