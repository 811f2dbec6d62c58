"""Pallas TPU kernel: fused ResNet bottleneck block (identity residual).

Motivation history (corrected): this kernel was originally motivated by a
round-2 `block_until_ready` micro-benchmark that put the layer3/layer4 1x1
convs at 51-61% MFU — a FENCING ARTIFACT (on this box's axon relay,
`block_until_ready` is not an execution fence; BASELINE.md "Measurement
methodology"). The corrected chain-marginal protocol measures XLA's convs
at **93-103% nominal MFU** (layer3 1x1 pair 93%, dilated 3x3 99-103%,
layer4 1x1 pair 95%): there is no per-conv efficiency on the table. The
real fusion headroom is the **~0.2 ms/block elementwise/residual HBM
traffic between convs** (unfused block 1.00 ms fwd vs 0.77 ms
sum-of-convs), which bounds what any cross-conv fusion can recover — and
is why the measured end-to-end win below was small and the kernel retired.

One kernel computes the whole stride-1 bottleneck

    out = relu(bn3(conv3(relu(bn2(conv2_d(relu(bn1(conv1(x)))))))) + x)

(reference: graphs/models/deeplab101.py Bottleneck — SURVEY.md C6; the
unfused rebuild is models/deeplabv2._bottleneck) with the mid-channel
intermediates living entirely in VMEM: HBM traffic per block drops from
~5 reads/writes of the wide activation to one (halo-overlapped) read of x
and one write of out — turning the bandwidth-bound layer3 block
compute-bound.

Padded-width convention: TPU DMA slices must be tile-aligned in the
second-minor (W) dim, and the 3x3 needs a column halo, so fused blocks run
in a padded-W domain: ``pad_width(W) = roundup(8 + W + d, 8)`` with the
valid image at columns [8, 8+W) and ZEROS elsewhere. `fused_stage` pads
once, chains every eligible block of a ResNet stage inside the padded
domain (each kernel re-zeroes the pad columns, preserving the invariant),
and slices once at the end — pad cost is amortized over the whole stage.

Kernel design:
- grid (N, ceil(H / TH)): each cell produces a TH-row output slab.
- x stays in HBM (`memory_space=ANY`); each cell's input slab
  [h0-d, h0+TH+d) is DMA'd manually into a double-buffered VMEM scratch
  (BlockSpec blocks cannot overlap, and the 3x3 needs a d-row halo), with
  the next cell's DMA prefetched during compute. Row slices are unaligned-
  safe (H is not a tiled dim); W/C are always copied whole.
- conv1 (1x1) runs as one MXU matmul over the halo'd slab — the d halo
  rows are recomputed per cell (~+2d/TH conv1 FLOPs) to avoid an h1
  round-trip through HBM.
- h1 is masked to zero outside the image (rows beyond [0,H), the pad
  columns): conv2's zero padding, and it also neutralizes stale scratch
  garbage, so no zero-fill DMAs are needed.
- conv2 (3x3, dilation d) = 3 matmuls against row-tap weights concatenated
  over column taps (Cmid x 3Cmid), accumulated via d-shifted column slices
  in fp32 — the same exact linear rearrangement as layers.aspp_sum, but
  VMEM-resident.
- conv3 (1x1) + frozen-BN + identity residual + ReLU finish in-register;
  the out slab leaves through a normal (auto-pipelined) BlockSpec output.

Training: `fused_bottleneck_padded` is a custom-VJP op. The
forward-for-grad variant additionally emits h1 and h2 (the same residual
set XLA's autodiff would save for the unfused chain, so peak memory is
~unchanged), and the backward runs XLA-native adjoints: einsum adjoints
for the 1x1s, `jax.linear_transpose` of the dilated conv for conv2 (no
primal re-execution). All saved tensors are zero in the pad region, which
makes the padded adjoints exactly the zero-padding adjoints. Frozen-BN
scales/biases get zero cotangents (they live in the `frozen` pytree and
are never optimized — SURVEY.md C6 frozen BN).

dtype semantics mirror the unfused chain: matmuls accumulate fp32 on the
MXU, results are cast to the compute dtype before each frozen-BN multiply-
add, exactly where XLA's conv would produce its output dtype.

Hardware constraints (compiled TPU path): the wide channel count must be a
multiple of 128 (lane tiling); the model falls back to the unfused chain
otherwise. Interpret mode (tests) has no such constraint.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_LEFT = 8  # >= max dilation (4) and sublane-aligned

# Mosaic VMEM budget we are willing to request; _pick_tile_h aims for the
# soft budget and the limit leaves headroom. Env overrides for tuning:
#   MAXSQ_FUSED_VMEM_SOFT_MB — tile-height selection budget
#   MAXSQ_FUSED_TILE_H       — force a tile height outright
_VMEM_BUDGET = 120 * 1024 * 1024
_VMEM_SOFT = int(os.environ.get("MAXSQ_FUSED_VMEM_SOFT_MB", "56")) * 1024 * 1024
_TILE_H_OVERRIDE = int(os.environ.get("MAXSQ_FUSED_TILE_H", "0"))
# comma-separated perf-ablation switches (experiments only — they break
# numerics): nodma, alignedtaps, nomask, nooutpad, noxc, conv1only
_ABLATE = frozenset(
    s for s in os.environ.get("MAXSQ_FUSED_ABLATE", "").split(",") if s
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def padded_width(w: int, d: int) -> int:
    return _round_up(PAD_LEFT + w + d, 8)


def pad_for_fused(x: jax.Array, d: int) -> jax.Array:
    """(N, H, W, C) → (N, H, padded_width(W, d), C), zeros in the pad."""
    wp = padded_width(x.shape[2], d)
    return jnp.pad(
        x, ((0, 0), (0, 0), (PAD_LEFT, wp - PAD_LEFT - x.shape[2]), (0, 0))
    )


def unpad_from_fused(xp: jax.Array, w: int) -> jax.Array:
    return xp[:, :, PAD_LEFT : PAD_LEFT + w]


def _vmem_estimate(
    th: int, d: int, wp: int, cin: int, cmid: int, itemsize: int, emit: bool
) -> int:
    """Rough VMEM bytes for a tile-height choice (scratch + blocks + temps)."""
    r = th + 2 * d
    xbuf = 2 * r * wp * cin * itemsize          # double-buffered input slabs
    outb = 2 * th * wp * cin * itemsize         # pipelined output block
    emitb = (2 * 2 * th * wp * cmid * itemsize) if emit else 0
    weights = (cin * cmid + 9 * cmid * cmid + cmid * cin) * itemsize
    # live temporaries: x value copy, h1, zcat (f32), acc (f32), z3 (f32)
    temps = (
        r * wp * cin * itemsize
        + r * wp * cmid * itemsize
        + th * wp * 3 * cmid * 4
        + 2 * th * wp * cmid * 4
        + th * wp * cin * 4
    )
    return xbuf + outb + emitb + weights + temps


def _pick_tile_h(
    h: int, d: int, wp: int, cin: int, cmid: int, itemsize: int, emit: bool
) -> int:
    """Largest tile height whose estimate fits the soft VMEM budget."""
    if _TILE_H_OVERRIDE:
        return min(_TILE_H_OVERRIDE, h)
    for th in (32, 16, 8, 4, 2, 1):
        if th > h:
            continue
        if _vmem_estimate(th, d, wp, cin, cmid, itemsize, emit) <= _VMEM_SOFT:
            return th
    return 1


def _kernel_body(
    x_hbm,
    w1_ref,
    w2cat_ref,
    w3_ref,
    s1_ref,
    b1_ref,
    s2_ref,
    b2_ref,
    s3_ref,
    b3_ref,
    out_ref,
    *rest,
    H: int,
    Wv: int,
    d: int,
    TH: int,
    S: int,
    N: int,
    emit: bool,
):
    if emit:
        h1_out, h2_out, xbuf, sems = rest
    else:
        xbuf, sems = rest
    R = TH + 2 * d
    Wp = xbuf.shape[2]
    Cin = xbuf.shape[3]
    Cmid = w1_ref.shape[1]
    Wc = Wp - 2 * d  # conv2 output window: out columns [d, Wp - d)
    dtype = out_ref.dtype

    n = pl.program_id(0)
    s = pl.program_id(1)
    cell = n * S + s
    cells = N * S

    def run_dma(cellv, action):
        """Per-cell halo-slab DMA; row ranges are static per s-branch."""
        nv = cellv // S
        sv = cellv - nv * S
        slot = jax.lax.rem(cellv, 2)
        for s_val in range(S):
            h0v = s_val * TH
            lo = max(0, h0v - d)
            hi = min(H, h0v + TH + d)
            dst = lo - (h0v - d)
            sz = hi - lo

            @pl.when(sv == s_val)
            def _():
                dma = pltpu.make_async_copy(
                    x_hbm.at[nv, pl.ds(lo, sz)],
                    xbuf.at[slot, pl.ds(dst, sz)],
                    sems.at[slot],
                )
                getattr(dma, action)()

    if "nodma" not in _ABLATE:
        @pl.when(cell == 0)
        def _():
            run_dma(cell, "start")

        @pl.when(cell + 1 < cells)
        def _():
            run_dma(cell + 1, "start")

        run_dma(cell, "wait")

    slot = 0 if "fixedslot" in _ABLATE else jax.lax.rem(cell, 2)
    x_slab = xbuf.at[slot][...]  # (R, Wp, Cin) via ref transform

    # conv1 (1x1) over the full halo'd slab
    if "noconv1" in _ABLATE:
        h1 = jnp.full((R, Wp, Cmid), 0.1, dtype)
    else:
        z1 = jnp.dot(
            x_slab.reshape(R * Wp, Cin),
            w1_ref[...],
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        h1 = jax.nn.relu(z1 * s1_ref[0] + b1_ref[0]).reshape(R, Wp, Cmid)
    # zero outside the image: conv2's zero padding AND stale-scratch guard.
    # 3-D iotas: reshaping an i1 mask trips Mosaic ("insertion of minor dim
    # ... only supported for 32-bit types"), so build the mask at full rank.
    h0 = s * TH
    row_abs = jax.lax.broadcasted_iota(jnp.int32, (R, Wp, 1), 0) + (h0 - d)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, Wp, 1), 1)
    col_ok = (col >= PAD_LEFT) & (col < PAD_LEFT + Wv)
    valid = (row_abs >= 0) & (row_abs < H) & col_ok
    if "nomask" not in _ABLATE:
        h1 = jnp.where(valid, h1, jnp.zeros((), dtype))

    # conv2 (3x3, dilation d): 3 row-tap matmuls, shifted column accumulate
    acc = None
    for a in range(3):
        rows = h1[a * d : a * d + TH]  # (TH, Wp, Cmid)
        zcat = jnp.dot(
            rows.reshape(TH * Wp, Cmid),
            w2cat_ref[a],
            preferred_element_type=jnp.float32,
        ).reshape(TH, Wp, 3 * Cmid)
        if "conv1only" in _ABLATE:
            acc = zcat[:, 0:Wc, 0:Cmid]
            break
        for b in range(3):
            lo = 0 if "alignedtaps" in _ABLATE else b * d
            t = zcat[:, lo : lo + Wc, b * Cmid : (b + 1) * Cmid]
            acc = t if acc is None else acc + t
    h2 = jax.nn.relu(acc.astype(dtype) * s2_ref[0] + b2_ref[0])  # (TH, Wc, Cmid)

    # conv3 (1x1) + bn3 + identity residual + relu
    z3 = jnp.dot(
        h2.reshape(TH * Wc, Cmid),
        w3_ref[...],
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(TH, Wc, Cin)
    if "noxc" in _ABLATE:
        xc = jnp.zeros((), dtype)
    else:
        xc = x_slab[d : d + TH, d : d + Wc]
    out = jax.nn.relu(z3 * s3_ref[0] + b3_ref[0] + xc)
    # back to full padded width, pad columns forced to zero (the chaining
    # invariant) — also zeroes garbage from out-of-image rows' residual
    out = jnp.pad(out, ((0, 0), (d, d), (0, 0)))
    if "nooutpad" not in _ABLATE:
        out = jnp.where(col_ok[:TH], out, jnp.zeros((), dtype))
    out_ref[0] = out
    if emit:
        h1_out[0] = h1[d : d + TH]
        h2c = jnp.pad(h2, ((0, 0), (d, d), (0, 0)))
        h2_out[0] = jnp.where(col_ok[:TH], h2c, jnp.zeros((), dtype))


def _call_kernel(xp, w1m, w2cat, w3m, bn, d: int, w_valid: int, emit: bool):
    """Invoke the fused-block kernel on padded-domain input."""
    N, H, Wp, Cin = xp.shape
    Cmid = w1m.shape[1]
    dtype = xp.dtype
    TH = _pick_tile_h(H, d, Wp, Cin, Cmid, dtype.itemsize, emit)
    S = pl.cdiv(H, TH)
    R = TH + 2 * d

    kernel = functools.partial(
        _kernel_body, H=H, Wv=w_valid, d=d, TH=TH, S=S, N=N, emit=emit
    )
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full array
    out_shapes = [jax.ShapeDtypeStruct((N, H, Wp, Cin), dtype)]
    out_specs = [
        pl.BlockSpec((1, TH, Wp, Cin), lambda n, s: (n, s, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if emit:
        out_shapes += [jax.ShapeDtypeStruct((N, H, Wp, Cmid), dtype)] * 2
        out_specs += [
            pl.BlockSpec((1, TH, Wp, Cmid), lambda n, s: (n, s, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2

    outs = pl.pallas_call(
        kernel,
        grid=(N, S),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x: manual halo DMA
            const_spec,            # w1 (Cin, Cmid)
            const_spec,            # w2cat (3, Cmid, 3*Cmid)
            const_spec,            # w3 (Cmid, Cin)
            *([const_spec] * 6),   # bn scale/bias pairs (1, C)
        ],
        out_specs=out_specs if emit else out_specs[0],
        out_shape=out_shapes if emit else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((2, R, Wp, Cin), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                _VMEM_BUDGET,
                max(
                    _VMEM_SOFT,
                    2 * _vmem_estimate(
                        TH, d, Wp, Cin, Cmid, dtype.itemsize, emit
                    ),
                ),
            ),
        ),
    )(xp, w1m, w2cat, w3m, *bn)
    return outs


def _prep(xp, w1, w2, w3, s1, b1, s2, b2, s3, b3):
    """HWIO conv weights → matmul shapes; cast to the compute dtype."""
    dtype = xp.dtype
    w1m = w1[0, 0].astype(dtype)                       # (Cin, Cmid)
    # (3, 3, Cmid, Cmid) → (3, Cmid, 3*Cmid): row tap a keeps its 3 column
    # taps side by side so conv2 is 3 matmuls instead of 9
    w2cat = jnp.transpose(w2, (0, 2, 1, 3)).reshape(
        3, w2.shape[2], 3 * w2.shape[3]
    ).astype(dtype)
    w3m = w3[0, 0].astype(dtype)                       # (Cmid, Cin)
    bn = tuple(
        v.astype(dtype)[None, :] for v in (s1, b1, s2, b2, s3, b3)
    )
    return w1m, w2cat, w3m, bn


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_bottleneck_padded(
    x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dilation, w_valid
):
    """Fused stride-1 identity-residual bottleneck in the padded-W domain.

    Args:
      x: (N, H, padded_width(w_valid, dilation), Cin) activations with the
        image at columns [PAD_LEFT, PAD_LEFT + w_valid) and zeros elsewhere.
      w1/w2/w3: HWIO conv kernels (1,1,Cin,Cmid), (3,3,Cmid,Cmid),
        (1,1,Cmid,Cin) — fp32 params as stored in the model pytree.
      s1..b3: folded frozen-BN scale/bias vectors (fp32, frozen pytree).
      dilation, w_valid: static ints.
    Returns:
      Same shape/dtype as x, pad columns zero.
    """
    return _call_kernel(
        x, *_prep(x, w1, w2, w3, s1, b1, s2, b2, s3, b3),
        d=dilation, w_valid=w_valid, emit=False,
    )


def _fwd(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dilation, w_valid):
    out, h1, h2 = _call_kernel(
        x, *_prep(x, w1, w2, w3, s1, b1, s2, b2, s3, b3),
        d=dilation, w_valid=w_valid, emit=True,
    )
    return out, (x, h1, h2, out, w1, w2, w3, s1, s2, s3)


def _bwd(dilation, w_valid, res, dy):
    """XLA-native adjoints from the saved (x, h1, h2, out) — the identical
    residual set (and peak memory) of the unfused chain's autodiff. All
    residuals are zero in the pad region, so the padded adjoints equal the
    zero-padding adjoints. Cotangents stay in the compute dtype,
    accumulation is fp32."""
    from maxsquareloss_tpu.models.layers import conv2d

    x, h1, h2, out, w1, w2, w3, s1, s2, s3 = res
    dtype = x.dtype
    f32 = jnp.float32

    dz3 = jnp.where(out > 0, dy, 0).astype(dtype)       # relu' ⊙ dy
    dz3c = (dz3.astype(f32) * s3).astype(dtype)         # through bn3 scale
    dw3 = jnp.einsum(
        "nhwk,nhwc->kc", h2, dz3c, preferred_element_type=f32
    )[None, None]
    dh2 = jnp.einsum("nhwc,kc->nhwk", dz3c, w3[0, 0].astype(dtype))

    dacc = jnp.where(h2 > 0, dh2.astype(f32) * s2, 0).astype(dtype)
    # dilated-conv adjoints without re-executing the primal
    dh1 = jax.linear_transpose(
        lambda a: conv2d(a, w2, padding=dilation, dilation=dilation), h1
    )(dacc)[0]
    dw2 = jax.linear_transpose(
        lambda w: conv2d(h1, w, padding=dilation, dilation=dilation), w2
    )(dacc)[0]

    dz1 = jnp.where(h1 > 0, dh1.astype(f32) * s1, 0).astype(dtype)
    dw1 = jnp.einsum(
        "nhwi,nhwk->ik", x, dz1, preferred_element_type=f32
    )[None, None]
    dx = jnp.einsum("nhwk,ik->nhwi", dz1, w1[0, 0].astype(dtype)) + dz3

    zeros_bn = tuple(jnp.zeros_like(v) for v in (s1, s1, s2, s2, s3, s3))
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), dw2.astype(w2.dtype),
            dw3.astype(w3.dtype), *zeros_bn)


fused_bottleneck_padded.defvjp(_fwd, _bwd)


def fused_bottleneck(x, w1, w2, w3, s1, b1, s2, b2, s3, b3, dilation):
    """Single-block convenience wrapper: pad → fused kernel → slice.

    For chains of blocks prefer staying in the padded domain
    (models/deeplabv2._stage does) so the pad/slice cost is paid once.
    """
    w = x.shape[2]
    xp = pad_for_fused(x, dilation)
    yp = fused_bottleneck_padded(
        xp, w1, w2, w3, s1, b1, s2, b2, s3, b3, dilation, w
    )
    return unpad_from_fused(yp, w)
