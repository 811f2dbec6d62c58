"""Loss family of the MaxSquareLoss reference, as pure jnp functions.

Reference: ``utils/loss.py`` (MaxSquareloss, IW_MaxSquareloss, EntropyLoss,
IW-entropy / soft-CE variants — SURVEY.md C9-C12) plus the supervised
``nn.CrossEntropyLoss(ignore_index=-1)`` used by the trainers.

All functions take NHWC logits/probabilities (TPU-native layout; the
reference is NCHW) and (N, H, W) integer labels with -1 = ignore. Everything
here is trace-friendly: static shapes, no host syncs — in particular the
image-wise histogram of IW_MaxSquareloss, which the reference computes on CPU
per image per step, runs on device (see ops/histogram.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from maxsquareloss_tpu.ops.histogram import class_histogram, iw_class_weights

IGNORE_INDEX = -1


def cross_entropy(
    logits: jax.Array, labels: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Pixel cross-entropy with ignore_index, mean over valid pixels.

    Matches ``nn.CrossEntropyLoss(ignore_index=-1)`` (reference:
    tools/train_source.py Trainer.__init__): softmax CE averaged over
    non-ignored pixels only.

    Args:
      logits: (N, H, W, C) float.
      labels: (N, H, W) int in [-1, C-1].
    """
    valid = labels != ignore_index
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: per-pixel gathers are
    # scalar-indexed and dominate the step on TPU (profiled at ~65 ms/step
    # at 8x512x1024x19); the compare+multiply+reduce fuses into the softmax.
    oh = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)  # one_hot(-1) is all-zero → masked
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count.astype(nll.dtype)


def soft_cross_entropy(logits: jax.Array, target_prob: jax.Array) -> jax.Array:
    """Soft-label CE: mean over pixels of -sum_c q_c log softmax(logits)_c.

    (Reference: utils/loss.py soft-CE variant, SURVEY.md C12 — exact class
    name unverified in the reference; semantics are the standard soft CE.)
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_pixel = -jnp.sum(target_prob * logp, axis=-1)
    return jnp.mean(per_pixel)


def max_square_loss(
    prob: jax.Array, ignore_index: int = IGNORE_INDEX
) -> jax.Array:
    """Maximum-squares loss: ``-mean(p^2) / 2`` over non-ignored entries.

    The paper's core contribution (reference: utils/loss.py MaxSquareloss,
    SURVEY.md C9). Gradient is proportional to p, avoiding entropy
    minimization's exploding gradient on high-confidence pixels. The
    reference masks entries equal to ignore_index; softmax probabilities are
    never -1, so the mask is all-true and we keep the plain mean (bit-equal).

    Args:
      prob: (N, H, W, C) softmax probabilities.
    """
    del ignore_index  # p in (0,1) never equals -1; kept for signature parity
    return -jnp.mean(jnp.square(prob)) / 2.0


def iw_max_square_loss(
    prob: jax.Array,
    label: jax.Array | None = None,
    num_classes: int | None = None,
    ratio: float = 0.2,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """Image-wise class-balanced max-squares loss.

    Per image: class histogram of ``label`` (or of argmax(prob) when label is
    None) with histc(bins=C+1, min=-1, max=C-1)[1:] semantics; per-class
    weight ``1 / max(hist^0.2 * total^0.8, 1)``; per-pixel weight gathered by
    argmax(prob) and detached; ``loss = -sum(p^2 * w) / (N * C)``.
    (Reference: utils/loss.py IW_MaxSquareloss, SURVEY.md C10.)

    Args:
      prob: (N, H, W, C) softmax probabilities.
      label: optional (N, H, W) int guidance labels in [-1, C-1] — supplied
        by the multi-level self-produced-guidance path so the histogram is
        counted on the thresholded ensemble pseudo-label.
    """
    n, _, _, c = prob.shape
    if num_classes is None:
        num_classes = c
    argpred = jnp.argmax(prob, axis=-1).astype(jnp.int32)  # (N, H, W)
    count_label = argpred if label is None else label.astype(jnp.int32)
    hist = class_histogram(count_label, num_classes)  # (N, C)
    w = iw_class_weights(hist, ratio)  # (N, C), stop_gradient'd
    # one-hot contraction (not take_along_axis — gathers are slow on TPU)
    oh = jax.nn.one_hot(argpred, num_classes, dtype=w.dtype)
    pixel_w = jnp.einsum("nhwc,nc->nhw", oh, w)
    pixel_w = jax.lax.stop_gradient(pixel_w)
    weighted = jnp.square(prob) * pixel_w[..., None]
    return -jnp.sum(weighted) / (n * num_classes)


def entropy_loss(
    prob: jax.Array,
    ignore_index: int = IGNORE_INDEX,
    normalize: bool = True,
    eps: float = 1e-30,
) -> jax.Array:
    """Entropy-minimization target loss (MinEnt baseline of the paper).

    Shannon entropy of the softmax, summed over classes, averaged over
    pixels. (Reference: utils/loss.py EntropyLoss, SURVEY.md C11; the exact
    normalization constant is [UNVERIFIED] in the reference — ``normalize``
    divides by log(C), the common normalized-entropy convention.)
    """
    del ignore_index
    c = prob.shape[-1]
    ent = -jnp.sum(prob * jnp.log(prob + eps), axis=-1)  # (N, H, W)
    loss = jnp.mean(ent)
    if normalize:
        loss = loss / math.log(c)
    return loss


def iw_entropy_loss(
    prob: jax.Array,
    label: jax.Array | None = None,
    num_classes: int | None = None,
    ratio: float = 0.2,
    ignore_index: int = IGNORE_INDEX,
    normalize: bool = True,
    eps: float = 1e-30,
) -> jax.Array:
    """Image-wise class-balanced entropy loss (``--target_mode IW_entropy``).

    Same image-wise weighting machinery as IW max-squares applied to the
    per-pixel entropy (reference: utils/loss.py, SURVEY.md C12 — exact
    normalization [UNVERIFIED]; mirrors entropy_loss's convention).
    """
    n, _, _, c = prob.shape
    if num_classes is None:
        num_classes = c
    argpred = jnp.argmax(prob, axis=-1).astype(jnp.int32)
    count_label = argpred if label is None else label.astype(jnp.int32)
    hist = class_histogram(count_label, num_classes)
    w = iw_class_weights(hist, ratio)
    oh = jax.nn.one_hot(argpred, num_classes, dtype=w.dtype)
    pixel_w = jnp.einsum("nhwc,nc->nhw", oh, w)
    pixel_w = jax.lax.stop_gradient(pixel_w)
    ent = -jnp.sum(prob * jnp.log(prob + eps), axis=-1)
    loss = jnp.mean(ent * pixel_w)
    if normalize:
        loss = loss / math.log(num_classes)
    return loss


def self_produced_guidance(
    prob_main: jax.Array,
    prob_aux: jax.Array,
    threshold: float = 0.95,
    ignore_index: int = IGNORE_INDEX,
    mask_mode: str = "ensemble",
) -> jax.Array:
    """Multi-level self-produced guidance pseudo-labels.

    Pseudo-label is the argmax of the ensemble probability
    ``(P_main + P_aux) / 2`` where a confidence mask passes, else ignore
    (-1); detached. (Reference: tools/solve_gta5.py UDATrainer target branch,
    SURVEY.md C15 / §3.2.)

    The reference's exact mask condition is [UNVERIFIED] (empty mount), so
    both plausible variants are exposed (``--guidance_mask``):

    - ``"ensemble"``: max ensemble probability > threshold (default; the
      stricter condition — fewer pseudo-labels).
    - ``"per_head_or"``: EITHER head's own max probability > threshold,
      i.e. ``(max P_main > t) | (max P_aux > t)`` — the upstream
      multi-level branch plausibly uses this (ADVICE r1, medium).

    Returns:
      (N, H, W) int32 pseudo-labels in [-1, C-1].
    """
    ens = (prob_main + prob_aux) / 2.0
    if mask_mode == "ensemble":
        confident = jnp.max(ens, axis=-1) > threshold
    elif mask_mode == "per_head_or":
        confident = (jnp.max(prob_main, axis=-1) > threshold) | (
            jnp.max(prob_aux, axis=-1) > threshold
        )
    else:
        raise ValueError(f"unknown guidance mask_mode {mask_mode!r}")
    arg = jnp.argmax(ens, axis=-1).astype(jnp.int32)
    label = jnp.where(confident, arg, jnp.int32(ignore_index))
    return jax.lax.stop_gradient(label)
