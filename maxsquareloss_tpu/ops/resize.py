"""align_corners=True bilinear resize, TPU-native.

The reference upsamples logits with ``F.interpolate(..., mode='bilinear',
align_corners=True)`` in both the train loss path and eval
(reference: tools/train_source.py validate(); see SURVEY.md C19 — the
align_corners=True detail is parity-critical, and ``jax.image.resize`` is
half-pixel, NOT align-corners, so we implement the exact variant here).

Instead of gathers, we express the separable interpolation as two small dense
matmuls: ``out = W_h @ x @ W_w.T`` per (batch, channel). The interpolation
matrices are built at trace time from static shapes, so XLA maps the whole
resize onto the MXU and autodiff produces transposed matmuls for the VJP —
no scatter in the backward pass. For a logits upsample (C=19, 129x257 ->
512x1024) this is orders faster on TPU than a gather formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out_size, in_size) align-corners linear interpolation matrix."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    if out_size == 1:
        # align_corners with a single output sample reads the first input pixel
        # (src = 0 * (in-1)/(out-1) is 0/0; torch defines scale=0 -> src=0).
        w[0, 0] = 1.0
        return w
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2)
    frac = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    w[rows, lo] = 1.0 - frac
    w[rows, lo + 1] = frac
    return w


def interp_matrix(out_size: int, in_size: int, dtype=jnp.float32) -> jax.Array:
    """align-corners interpolation matrix as a device array (trace-time const)."""
    return jnp.asarray(_interp_matrix_np(out_size, in_size), dtype=dtype)


def resize_bilinear_align_corners(
    x: jax.Array,
    out_hw: tuple[int, int],
    h_rows: tuple[int, int] | None = None,
) -> jax.Array:
    """Bilinear align_corners=True resize of NHWC (or HWC / NCHW-free) images.

    Args:
      x: (..., H, W, C) array; interpolation runs over the -3/-2 axes.
      out_hw: static (H_out, W_out).
      h_rows: optional static (r0, r1) — produce only output rows [r0, r1)
        of the full (H_out, W_out) result. EXACT row-streaming: the H
        interpolation is a matmul with a (H_out, H_in) matrix, so a row
        block is just its [r0:r1] slice. Lets callers keep huge upsampled
        tensors (full-res eval: N x 2048 x 1024 x C) out of HBM.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=True)`` to fp32 rounding.
    """
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    h_in, w_in = x.shape[-3], x.shape[-2]
    if (h_in, w_in) == (h_out, w_out) and h_rows is None:
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    wh = interp_matrix(h_out, h_in, dtype)  # (Ho, Hi)
    if h_rows is not None:
        wh = wh[int(h_rows[0]) : int(h_rows[1])]
    ww = interp_matrix(w_out, w_in, dtype)  # (Wo, Wi)
    x = x.astype(dtype)
    # (..., Hi, Wi, C): contract H then W with the small dense matrices.
    y = jnp.einsum("oh,...hwc->...owc", wh, x)
    y = jnp.einsum("pw,...owc->...opc", ww, y)
    return y


def upsample_logits(logits: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Upsample NHWC logits to label resolution (align_corners=True).

    Mirrors the reference's ``F.interpolate(pred, size=label.shape[-2:],
    mode='bilinear', align_corners=True)`` (tools/train_source.py, both train
    and validate paths).
    """
    return resize_bilinear_align_corners(logits, out_hw)
