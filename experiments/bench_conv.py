"""Micro-benchmark: per-conv-shape MFU on the real TPU chip.

Measures the convolutions that make up the DeepLabV2 hot loop
(layer3/layer4 bottleneck 1x1s and dilated 3x3s at the 65x129 OS=8 maps).

Methodology: the axon relay adds ~1.5-2 ms of fixed dispatch overhead per
executable call, so single-op timings are useless — each case CHAINS K
applications of the op inside ONE jit (output feeds the next input) and
divides by K. Inputs rotate across buffers to defeat the relay result
cache. For fwd+bwd we differentiate the whole chain wrt input + weights
(each op then runs fwd once + its two adjoints once, like in training).

Usage: python experiments/bench_conv.py [--dtype bfloat16] [--iters 10]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s
PEAK_F32 = 49e12


def timeit(fn, buffers, iters):
    for i in range(2):
        jax.block_until_ready(fn(buffers[i % len(buffers)]))
    t0 = time.perf_counter()
    outs = [fn(buffers[i % len(buffers)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def conv(x, w, padding, dilation):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_chain(ws, pads, dils, K):
    """fn(x) = x -> conv(w_0) -> conv(w_1) -> ... (K ops, cycling ws)."""
    n = len(ws)

    @jax.jit
    def fwd(x):
        y = x
        for i in range(K):
            y = conv(y, ws[i % n], pads[i % n], dils[i % n])
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def fwdbwd(x):
        def loss(x_, ws_):
            y = x_
            for i in range(K):
                y = conv(y, ws_[i % n], pads[i % n], dils[i % n])
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        return jax.grad(loss, argnums=(0, 1))(x, list(ws))

    return fwd, fwdbwd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--chain", type=int, default=24)
    # grad of a long chain is compile-heavy (>40 min, >13 GB RSS for 24);
    # keep the bwd chain short — per-op attribution only needs amortization
    # of the ~2 ms relay dispatch, not a deep chain
    p.add_argument("--bwd_chain", type=int, default=6)
    p.add_argument("--nbuf", type=int, default=4)
    p.add_argument("--skip_bwd", action="store_true")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32

    N, H, W = 8, 65, 129
    # each case: (name, [(Cin,Cout,k,d), ...]) — the op list is cycled K
    # times; Cout of the last must equal Cin of the first.
    cases = [
        ("l3 1x1 256->1024->256 pair", [(256, 1024, 1, 1), (1024, 256, 1, 1)]),
        ("l3 3x3 d2 256->256", [(256, 256, 3, 2)]),
        ("l4 1x1 512->2048->512 pair", [(512, 2048, 1, 1), (2048, 512, 1, 1)]),
        ("l4 3x3 d4 512->512", [(512, 512, 3, 4)]),
        ("3x3 d1 256->256 (control)", [(256, 256, 3, 1)]),
    ]
    rng = np.random.default_rng(0)
    print(f"dtype={dtype.name} N={N} H={H} W={W} chain={args.chain} "
          f"peak={peak/1e12:.0f}TF/s")
    for name, ops in cases:
        ws, pads, dils, flops1 = [], [], [], 0.0
        for ci, co, k, d in ops:
            fan = k * k * ci
            ws.append(jnp.asarray(
                (rng.normal(size=(k, k, ci, co)) * np.sqrt(1.0 / fan))
                .astype(np.float32)))
            pads.append(d if k == 3 else 0)
            dils.append(d)
            flops1 += 2 * N * H * W * k * k * ci * co
        K = args.chain - (args.chain % len(ops))
        Kb = max(len(ops), args.bwd_chain - (args.bwd_chain % len(ops)))
        flops = flops1 * K / len(ops)
        flops_b = flops1 * Kb / len(ops)
        fwd, _ = make_chain(ws, pads, dils, K)
        _, fwdbwd = make_chain(ws, pads, dils, Kb)
        ci0 = ops[0][0]
        bufs = [
            jnp.asarray(rng.normal(size=(N, H, W, ci0)).astype(np.float32))
            .astype(dtype)
            for _ in range(args.nbuf)
        ]
        t_fwd = timeit(fwd, bufs, args.iters)
        per_fwd = t_fwd / K * len(ops)
        line = (
            f"{name:30s} fwd {per_fwd*1e3:7.3f} ms/op {flops/t_fwd/1e12:6.1f}"
            f" TF/s ({100*flops/t_fwd/peak:4.1f}%)"
        )
        if not args.skip_bwd:
            t_bwd = timeit(fwdbwd, bufs, args.iters)
            per_bwd = t_bwd / Kb * len(ops)
            line += (
                f"   fwd+bwd {per_bwd*1e3:7.3f} ms/op"
                f" ({100*3*flops_b/t_bwd/peak:4.1f}%)"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
