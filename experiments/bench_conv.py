"""Micro-benchmark: per-conv-shape MFU on the real TPU chip.

Measures the convolutions that make up the DeepLabV2 hot loop
(layer3/layer4 bottleneck 1x1s and dilated 3x3s at the 65x129 OS=8 maps).

Methodology (IMPORTANT — round-2 discovery): through this box's axon
relay, ``jax.block_until_ready`` is NOT a reliable execution fence —
timings based on it report physically impossible rates (e.g. 30+ PFLOP/s).
The only sound protocol is CHAIN-MARGINAL timing with a host-readback
fence: each measured call chains K dependent ops and ends in an in-jit
scalar whose ``float()`` readback forces real execution; differencing two
chain lengths cancels the relay's ~30 ms fixed per-readback cost:

    per_op = (t(K2) - t(K1)) / (K2 - K1)

For fwd+bwd we differentiate the whole chain wrt input + weights.

Usage: python experiments/bench_conv.py [--dtype bfloat16] [--iters 5]
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

PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s
PEAK_F32 = 49e12


def fenced(fn, bufs, iters):
    """min over reps of a host-readback-fenced call."""
    float(fn(bufs[-1]))  # compile + warm
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(bufs[i % (len(bufs) - 1)]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def conv(x, w, padding, dilation):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def make_chain(ws, pads, dils, K, bwd):
    n = len(ws)

    @jax.jit
    def fwd(x):
        y = x
        for i in range(K):
            y = conv(y, ws[i % n], pads[i % n], dils[i % n])
        return jnp.sum(y.astype(jnp.float32))

    if not bwd:
        return fwd

    @jax.jit
    def fwdbwd(x):
        def loss(x_, ws_):
            y = x_
            for i in range(K):
                y = conv(y, ws_[i % n], pads[i % n], dils[i % n])
            return jnp.sum(y.astype(jnp.float32)) * 1e-6

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, list(ws))
        return jnp.sum(gx.astype(jnp.float32)) + sum(
            jnp.sum(g.astype(jnp.float32)) for g in gw
        )

    return fwdbwd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--k1", type=int, default=4)
    p.add_argument("--k2", type=int, default=16)
    # grad of a long chain is compile-heavy; keep bwd chains short
    p.add_argument("--bk1", type=int, default=2)
    p.add_argument("--bk2", type=int, default=6)
    p.add_argument("--nbuf", type=int, default=4)
    p.add_argument("--skip_bwd", action="store_true")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)
    peak = PEAK_BF16 if dtype == jnp.bfloat16 else PEAK_F32

    N, H, W = 8, 65, 129
    cases = [
        ("l3 1x1 256->1024->256 pair", [(256, 1024, 1, 1), (1024, 256, 1, 1)]),
        ("l3 3x3 d2 256->256", [(256, 256, 3, 2)]),
        ("l4 1x1 512->2048->512 pair", [(512, 2048, 1, 1), (2048, 512, 1, 1)]),
        ("l4 3x3 d4 512->512", [(512, 512, 3, 4)]),
        ("3x3 d1 256->256 (control)", [(256, 256, 3, 1)]),
    ]
    rng = np.random.default_rng(0)
    print(f"dtype={dtype.name} N={N} H={H} W={W} marginal K={args.k1}->{args.k2} "
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
        ci0 = ops[0][0]
        bufs = [
            jnp.asarray(rng.normal(size=(N, H, W, ci0)).astype(np.float32))
            .astype(dtype)
            for _ in range(args.nbuf + 1)
        ]

        def marginal(k1, k2, bwd):
            k1 -= k1 % len(ops) or 0
            k1 = max(len(ops), k1 - (k1 % len(ops)))
            k2 = max(2 * len(ops), k2 - (k2 % len(ops)))
            t1 = fenced(make_chain(ws, pads, dils, k1, bwd), bufs, args.iters)
            t2 = fenced(make_chain(ws, pads, dils, k2, bwd), bufs, args.iters)
            return (t2 - t1) / (k2 - k1) * len(ops)

        per_fwd = marginal(args.k1, args.k2, False)
        line = (
            f"{name:30s} fwd {per_fwd*1e3:7.3f} ms/op "
            f"{flops1/per_fwd/1e12:6.1f} TF/s ({100*flops1/per_fwd/peak:4.1f}%)"
        )
        if not args.skip_bwd:
            per_bwd = marginal(args.bk1, args.bk2, True)
            line += (
                f"   fwd+bwd {per_bwd*1e3:7.3f} ms/op"
                f" ({100*3*flops1/per_bwd/peak:4.1f}%)"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
