"""Per-image class histograms with torch.histc edge semantics, on device.

The reference's IW_MaxSquareloss computes, per image, ``torch.histc(label,
bins=C+1, min=-1, max=C-1)`` **on CPU** and drops the first (ignore) bin
(reference: utils/loss.py, SURVEY.md C10) — a device->host sync in the hot
loop every iteration. For integer labels in [-1, C-1] those histc bin edges
place value v exactly in bin v+1 (the max value C-1 lands in the last bin),
so the device-side equivalent is a bincount of (label + 1) with C+1 bins,
dropping bin 0. We compute it as a one-hot sum, which XLA lowers to a single
fused compare+reduce pass — no scatter, no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_histogram(labels: jax.Array, num_classes: int) -> jax.Array:
    """Per-image histogram of class ids.

    Args:
      labels: (N, H, W) int array with values in [-1, num_classes-1]
        (-1 = ignore).
    Returns:
      (N, num_classes) float32 counts of each class 0..C-1 per image
      (the ignore bin is dropped, matching ``histc(...)[1:]``).
    """
    n = labels.shape[0]
    flat = labels.reshape(n, -1)
    # one-hot compare-and-sum; bin v+1 <=> class v, bin 0 (ignore) dropped.
    classes = jnp.arange(num_classes, dtype=flat.dtype)
    onehot = flat[:, :, None] == classes[None, None, :]
    return jnp.sum(onehot, axis=1, dtype=jnp.float32)


def iw_class_weights(
    hist: jax.Array, ratio: float = 0.2
) -> jax.Array:
    """Image-wise class-balanced weights from per-image histograms.

    ``w_c = 1 / max(hist_c^ratio * (sum_c hist_c)^(1-ratio), 1)`` with
    ratio alpha=0.2 by default (reference: utils/loss.py IW_MaxSquareloss,
    SURVEY.md C10).

    Args:
      hist: (N, C) float per-image class counts.
    Returns:
      (N, C) float32 weights (stop_gradient'd — weights are detached in the
      reference).
    """
    hist = hist.astype(jnp.float32)
    total = jnp.sum(hist, axis=-1, keepdims=True)
    denom = jnp.power(hist, ratio) * jnp.power(total, 1.0 - ratio)
    w = 1.0 / jnp.maximum(denom, 1.0)
    return jax.lax.stop_gradient(w)
