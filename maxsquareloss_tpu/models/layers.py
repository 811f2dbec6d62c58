"""TPU-native NN primitives for the DeepLabV2 backbone.

NHWC layout throughout (TPU-native; the reference is NCHW torch). Convs lower
to ``lax.conv_general_dilated`` → XLA:TPU MXU. Frozen BatchNorm (the
reference trains with BN affine params frozen and running stats in eval mode,
``affine_par``/``freeze_bn`` in graphs/models/deeplab101.py — SURVEY.md C6)
is folded at conversion time into a constant per-channel scale/shift, so at
trace time it is a single fused multiply-add XLA melts into the neighboring
conv.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# NHWC activations, HWIO kernels.
CONV_DIMS = ("NHWC", "HWIO", "NHWC")
BN_EPS = 1e-5  # torch BatchNorm2d default


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    bias: jax.Array | None = None,
) -> jax.Array:
    """2-D convolution, torch Conv2d semantics (symmetric int padding).

    Dilated convs lower directly via rhs_dilation — XLA:TPU runs them at
    93-103% of nominal conv peak on long chains (BASELINE.md); the exact
    space-to-batch rewrite was measured slower and retired to
    experiments/retired_pallas.
    """
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=CONV_DIMS,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# -- backbone conv-site dispatch (fp / int8) --------------------------------
#
# A "site" is the per-conv params subtree ({'w': HWIO}, or the int8 form
# {'w': int8 HWIO, 'oscale': (O,) f32, 'ascale_inv': () f32} built by
# models/quantize.py). Training always uses fp sites, so conv_site is a
# transparent alias for conv2d there; quantized eval/serving params flow
# through the SAME model code with the int8 MXU path selected per site.

_calib_recorder = None  # set by models/quantize.calibrate (eager-only hook)


def qconv2d(
    x: jax.Array, site: dict, stride: int = 1, padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """int8 conv: symmetric per-tensor activation quant → int8 MXU conv
    (int32 accumulation, exact) → per-output-channel dequant back to the
    compute dtype. Quant/dequant math runs in f32 (scale application error
    stays at 1-ulp instead of bf16's ~0.4%); zero maps to 0 exactly, so
    XLA's zero padding is exact through quantization. v5e executes int8
    convs at 1.6-2.2x bf16 MXU throughput (experiments/bench_int8.py)."""
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * site["ascale_inv"]), -127.0, 127.0
    ).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        site["w"],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=CONV_DIMS,
        preferred_element_type=jnp.int32,
    )
    return (
        y.astype(jnp.float32) * site["oscale"].astype(jnp.float32)
    ).astype(x.dtype)


def conv_site(
    x: jax.Array, site: dict, stride: int = 1, padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Backbone conv by site subtree: fp conv2d, or the int8 path when the
    site holds quantized weights. The calibration recorder (if installed)
    observes every site's input amax — models/quantize.py."""
    if _calib_recorder is not None:
        _calib_recorder(site, x)
    w = site["w"]
    if w.dtype == jnp.int8:
        return qconv2d(x, site, stride, padding, dilation)
    return conv2d(x, w, stride, padding, dilation)


def frozen_bn(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """Frozen BatchNorm as folded affine: ``x * scale + bias``.

    ``scale = gamma / sqrt(running_var + eps)``,
    ``bias = beta - running_mean * scale`` — folded once at weight-conversion
    / init time (see fold_bn / init helpers), constant thereafter.
    """
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def fold_bn(
    gamma: np.ndarray, beta: np.ndarray, mean: np.ndarray, var: np.ndarray,
    eps: float = BN_EPS,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold torch BN (gamma, beta, running_mean, running_var) → (scale, bias)."""
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def max_pool_ceil(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1) -> jax.Array:
    """Max pool with torch ``ceil_mode=True`` semantics.

    The caffe-style DeepLabV2 stem uses ``MaxPool2d(3, 2, padding=1,
    ceil_mode=True)`` (reference: graphs/models/deeplab101.py — SURVEY.md C6):
    output size = ceil((H + 2p - k) / s) + 1. We emulate ceil mode by
    right/bottom-padding with -inf so the extra partial window is included.
    torch additionally guarantees the last window starts inside the padded
    input, which holds for the (3,2,1) stem configuration used here.
    """
    h, w = x.shape[-3], x.shape[-2]

    def extra(size: int) -> int:
        out_ceil = math.ceil((size + 2 * padding - window) / stride) + 1
        # needed so that (out_ceil - 1) * stride + window fits in padded input
        return max(0, (out_ceil - 1) * stride + window - (size + 2 * padding))

    # NOTE: the init value MUST be a python scalar — an array-typed init
    # breaks jit linearization in jax 0.9 ("Linearization failed to produce
    # known values for all output primals").
    neg = -float("inf")
    x = jnp.pad(
        x,
        ((0, 0), (padding, padding + extra(h)), (padding, padding + extra(w)), (0, 0)),
        constant_values=neg,
    )
    return jax.lax.reduce_window(
        x,
        neg,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


# ------------------------------------------------------- fused ASPP sum ----
#
# The V2-style ASPP head sums four dilated 3x3 convs C_in→num_classes. On the
# MXU the natural lowering pads the 19-channel output to 128 lanes (6.7x
# wasted FLOPs — measured ~7% MFU). Rewrite the FORWARD as one big matmul
# C_in→(36*num_classes) (lane padding 684→768, ~12% waste) followed by 36
# zero-padded shifted accumulations of the per-tap num_classes slices — an
# exact linear rearrangement of the same sum. The BACKWARD keeps the conv
# formulation's adjoints (obtained via jax.linear_transpose, never executing
# the primal): dx contracts over 19 (K dim — cheap) and dW has large M/N, so
# both are already MXU-efficient. Measured on v5e at (8, 65, 129, 2048):
# fwd 12.9 → 8.1 ms with bwd unchanged.


def aspp_sum(
    x: jax.Array,
    weights: list[jax.Array],
    biases: list[jax.Array],
    dilations: tuple[int, ...],
) -> jax.Array:
    """Sum of parallel dilated 3x3 convs (+ biases), MXU-optimized, exact.

    Args:
      x: (N, H, W, C) input.
      weights: per-dilation (3, 3, C, num_classes) kernels.
      biases: per-dilation (num_classes,) biases.
    Returns:
      (N, H, W, num_classes) float32 logits.
    """
    return _aspp_sum_vjp(x, tuple(weights), tuple(biases), tuple(dilations))


def _aspp_conv_reference(x, weights, biases, dilations):
    """Plain conv formulation (used for adjoints + as a parity oracle)."""
    out = None
    for w, b, d in zip(weights, biases, dilations):
        y = conv2d(x, w, padding=d, dilation=d, bias=b)
        out = y if out is None else out + y
    return out.astype(jnp.float32)


def _aspp_matmul_forward(x, weights, biases, dilations):
    n, h, w_, _ = x.shape
    nc = weights[0].shape[-1]
    wflat = jnp.concatenate(
        [w[a, b] for w in weights for a in range(3) for b in range(3)],
        axis=-1,
    )  # (C, 36*nc), dilation-major tap order
    # z stays in the compute dtype (the shifted-slice traffic, not the
    # matmul, is the cost here); per-tap slices are summed as a PAIRWISE
    # TREE in f32 so accumulation error stays at the single-rounding level
    z = jnp.einsum("nhwc,ck->nhwk", x, wflat.astype(x.dtype))
    pad = max(dilations)
    zp = jnp.pad(z, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = []
    t = 0
    for d in dilations:
        for a in range(3):
            for b in range(3):
                dy, dx = (a - 1) * d, (b - 1) * d
                taps.append(
                    zp[
                        :,
                        pad + dy : pad + dy + h,
                        pad + dx : pad + dx + w_,
                        t * nc : (t + 1) * nc,
                    ].astype(jnp.float32)
                )
                t += 1
    while len(taps) > 1:
        nxt = [a + b for a, b in zip(taps[0::2], taps[1::2])]
        if len(taps) % 2:
            nxt.append(taps[-1])
        taps = nxt
    return taps[0] + sum(b.astype(jnp.float32) for b in biases)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _aspp_sum_vjp(x, weights, biases, dilations):
    return _aspp_matmul_forward(x, weights, biases, dilations)


def _aspp_fwd(x, weights, biases, dilations):
    return _aspp_matmul_forward(x, weights, biases, dilations), (
        x, weights, biases,
    )


def _aspp_bwd(dilations, res, dy):
    x, weights, biases = res
    # conv-formulation adjoints; linear_transpose builds the transpose
    # without executing the primal (the map is linear in each argument)
    dx = jax.linear_transpose(
        lambda x_: _aspp_conv_reference(x_, weights, biases, dilations), x
    )(dy)[0]
    dw = jax.linear_transpose(
        lambda w_: _aspp_conv_reference(x, w_, biases, dilations), weights
    )(dy)[0]
    db = tuple(
        jnp.sum(dy, axis=(0, 1, 2)).astype(b.dtype) for b in biases
    )
    return dx, dw, db


_aspp_sum_vjp.defvjp(_aspp_fwd, _aspp_bwd)


def kaiming_normal(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """He-normal fan_out init for HWIO conv kernels (torch resnet convention)."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, shape, dtype=jnp.float32) * std


def classifier_normal(key: jax.Array, shape: tuple[int, ...], std: float = 0.01) -> jax.Array:
    """N(0, 0.01) init used by the reference for ASPP classifier convs."""
    return jax.random.normal(key, shape, dtype=jnp.float32) * std
