"""Pallas TPU kernels: fused softmax + max-square loss family.

The reference materializes softmax probabilities at full label resolution
and feeds them through p^2 / per-image-weight / reduction as separate torch
ops (utils/loss.py — SURVEY.md C9/C10). Here the whole chain after the
logits — softmax, square, (IW: in-kernel argmax + per-image weight lookup),
masked reduction — runs as ONE Pallas kernel per direction, tile-resident in
VMEM: the (N, H, W, C) probability tensor never exists in HBM.

The backward passes are closed-form (no residuals besides the logits):

  max-square:  L = -1/(2M) sum_i p_i^2,   p = softmax(x)
               dL/dx_j = -(g/M) (p_j^2 - p_j * s),  s = sum_i p_i^2

  IW:          L = -1/(NC) sum_pix w_pix sum_i p_i^2, w_pix detached
               dL/dx_j = -(2 g w_pix / NC) (p_j^2 - p_j * s)

(w_pix = w[n, argmax_c p] is a constant under the reference's .detach().)

Layout: logits arrive NHWC with C on lanes. C (19) underfills the 128-lane
registers, but every op is elementwise/per-pixel reduction, so the kernel is
bandwidth-bound and reads the logits exactly once per direction — the win
is the removed HBM round-trips, not lane occupancy.

Grid: (N, H / TILE_H); each program handles a (TILE_H, W, C) slab.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_h(h: int) -> int:
    # cap tiles at 8 rows: a (8, 1024, 19) fp32 slab is ~0.6 MB and the
    # kernel holds several live intermediates (64-row slabs OOM'd VMEM)
    for t in (8, 4, 2, 1):
        if h % t == 0:
            return t
    return 1


# ------------------------------------------------------------ max-square ---


def _ms_fwd_kernel(x_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    # TPU grid programs run sequentially on the core -> accumulate into the
    # single (1, 1) SMEM cell (per-grid-cell outputs violate the (8, 128)
    # block divisibility rule for small grids)
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(p * p)


def _ms_bwd_kernel(x_ref, g_ref, dx_ref, *, inv_m: float):
    x = x_ref[...].astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    s = jnp.sum(p * p, axis=-1, keepdims=True)
    g = g_ref[0, 0]
    dx_ref[...] = (-g * inv_m * (p * p - p * s)).astype(dx_ref.dtype)


@jax.custom_vjp
def fused_max_square_loss(logits: jax.Array) -> jax.Array:
    """``-mean(softmax(logits)^2) / 2`` over all entries, fused on TPU.

    Matches ops.losses.max_square_loss(softmax(logits)) (reference
    MaxSquareloss — SURVEY.md C9) to fp32 rounding.
    """
    return _ms_fwd(logits)[0]


def _ms_partials(logits):
    n, h, w, c = logits.shape
    th = _tile_h(h)
    grid = (n, h // th)
    part = pl.pallas_call(
        _ms_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(logits)
    return part


def _ms_fwd(logits):
    n, h, w, c = logits.shape
    m = n * h * w * c
    total = jnp.sum(_ms_partials(logits))
    loss = -total / (2.0 * m)
    return loss, logits


def _ms_bwd(logits, g):
    n, h, w, c = logits.shape
    m = n * h * w * c
    th = _tile_h(h)
    grid = (n, h // th)
    g2d = jnp.reshape(g.astype(jnp.float32), (1, 1))
    dx = pl.pallas_call(
        functools.partial(_ms_bwd_kernel, inv_m=1.0 / m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(logits.shape, logits.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(logits, g2d)
    return (dx,)


fused_max_square_loss.defvjp(lambda x: (_ms_fwd(x)[0], x), _ms_bwd)


# -------------------------------------------------------------- IW fused ---


def _iw_fwd_kernel(x_ref, w_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)  # (1, th, W, C)
    p = jax.nn.softmax(x, axis=-1)
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[0, 0] = 0.0

    # whole (N, C) weight table is resident; pick this image's row
    wrow = w_ref[pl.program_id(0), :].astype(jnp.float32).reshape(1, 1, 1, -1)
    # in-kernel "gather": w_pix = sum_c onehot(argmax)_c * w_c via compare.
    # First-max tie-break via iota+min (cumsum is not lowerable on TPU).
    pmax = jnp.max(p, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=3)
    amax = jnp.min(jnp.where(p == pmax, col, p.shape[-1]), axis=-1, keepdims=True)
    first_max = (col == amax).astype(jnp.float32)
    w_pix = jnp.sum(first_max * wrow, axis=-1, keepdims=True)
    out_ref[0, 0] += jnp.sum(p * p * w_pix)


def _iw_bwd_kernel(x_ref, w_ref, g_ref, dx_ref, *, inv_nc: float):
    x = x_ref[...].astype(jnp.float32)
    p = jax.nn.softmax(x, axis=-1)
    wrow = w_ref[pl.program_id(0), :].astype(jnp.float32).reshape(1, 1, 1, -1)
    pmax = jnp.max(p, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=3)
    amax = jnp.min(jnp.where(p == pmax, col, p.shape[-1]), axis=-1, keepdims=True)
    first_max = (col == amax).astype(jnp.float32)
    w_pix = jnp.sum(first_max * wrow, axis=-1, keepdims=True)
    s = jnp.sum(p * p, axis=-1, keepdims=True)
    g = g_ref[0, 0]
    dx_ref[...] = (-2.0 * g * inv_nc * w_pix * (p * p - p * s)).astype(dx_ref.dtype)


@jax.custom_vjp
def fused_iw_max_square_loss(logits: jax.Array, weights: jax.Array) -> jax.Array:
    """IW max-squares from logits + per-image class weights, fused.

    ``loss = -sum(p^2 * w[n, argmax_c p]) / (N * C)`` with ``p = softmax`` —
    the detached per-image weights (N, C) come from ops.histogram (device
    bincount of the guidance label / argpred). Matches
    ops.losses.iw_max_square_loss to fp32 rounding.
    """
    return _iw_fwd(logits, weights)[0]


def _iw_call(kernel, logits, weights, extra_inputs=(), out_sdtype=None, smem_out=True):
    n, h, w, c = logits.shape
    th = _tile_h(h)
    grid = (n, h // th)
    in_specs = [
        pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        # full (N, C) table every program: a (1, C) row block would violate
        # the TPU (8, 128)-divisibility rule on the sublane dim
        pl.BlockSpec(weights.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    if extra_inputs:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
        )
    if smem_out:
        out_specs = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
        out_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    else:
        out_specs = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(logits.shape, logits.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # C=19 on lanes pads to 128 inside the core; allow the inflated
        # intermediates (default 16M scoped limit OOMs)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(logits, weights, *extra_inputs)


def _iw_fwd(logits, weights):
    n, h, w, c = logits.shape
    part = _iw_call(_iw_fwd_kernel, logits, weights)
    loss = -jnp.sum(part) / (n * c)
    return loss, (logits, weights)


def _iw_bwd(res, g):
    logits, weights = res
    n, h, w, c = logits.shape
    g2d = jnp.reshape(g.astype(jnp.float32), (1, 1))
    dx = _iw_call(
        functools.partial(_iw_bwd_kernel, inv_nc=1.0 / (n * c)),
        logits, weights, extra_inputs=(g2d,), smem_out=False,
    )
    return dx, jnp.zeros_like(weights)  # weights are detached (reference .detach())


fused_iw_max_square_loss.defvjp(_iw_fwd, _iw_bwd)
