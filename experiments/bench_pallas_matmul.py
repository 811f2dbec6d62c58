"""Calibrate in-Pallas MXU throughput at the fused-block matmul shapes.

A single kernel, grid (CELLS,), each cell computing the same matmul chain
from VMEM scratch (no DMA, no masks, no slicing): measures the ceiling
Mosaic's matmul codegen allows at these operand sizes. Compare against the
fused-block kernel's residual ~2.4 ms/block to decide whether the gap is
matmul codegen or kernel structure.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1728)   # R*Wp at TH=8
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--cells", type=int, default=72)
    ap.add_argument("--chain", type=int, default=3)  # dependent matmuls/cell
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out_dtype", default="bfloat16",
                    help="dot output dtype (bfloat16 skips f32 materialize)")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    odtype = jnp.dtype(args.out_dtype)
    M, K, N, C = args.m, args.k, args.n, args.cells

    def kernel(t_ref, x_ref, a_ref, b_ref, o_ref):
        # per-cell distinct input block so nothing is grid-invariant;
        # per-call distinct scalar so the relay result cache never hits
        y = x_ref[0] + t_ref[0, 0].astype(dtype)
        for i in range(args.chain):
            w = a_ref if i % 2 == 0 else b_ref
            y = jax.nn.relu(jnp.dot(
                y, w[...], preferred_element_type=jnp.float32
            ).astype(odtype)).astype(dtype)
        o_ref[0] = jnp.sum(y.astype(jnp.float32), axis=0, keepdims=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(C, M, K)).astype(np.float32) * 0.05).astype(dtype)
    a = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05).astype(dtype)
    b = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.05).astype(dtype)

    @jax.jit
    def run(t, x, a, b):
        return pl.pallas_call(
            kernel,
            grid=(C,),
            in_specs=[
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, M, K), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, N), lambda c: (c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C, 1, N), jnp.float32),
        )(t, x, a, b)

    def tick(i):
        return jnp.full((1, 1), 1e-4 * i, jnp.float32)

    # distinct LARGE buffer per timed call: the relay result cache may key
    # only on large-operand content
    xs = [x + jnp.asarray(1e-4 * (i + 1), dtype) for i in range(args.iters)]
    jax.block_until_ready(xs)
    for i in range(2):
        jax.block_until_ready(run(tick(1000 + i), x, a, b))
    t0 = time.perf_counter()
    outs = [run(tick(i), xs[i], a, b) for i in range(args.iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / args.iters
    flops = 2 * M * K * N * args.chain * C
    print(f"M={M} K={K} N={N} chain={args.chain} cells={C} {dtype.name}->"
          f"{odtype.name}: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TF/s "
          f"({100*flops/dt/197e12:.1f}% of bf16 peak)")


if __name__ == "__main__":
    main()
