"""Fused Pallas bottleneck block vs unfused XLA chain on the real TPU.

Chains K blocks inside one jit (amortizes the ~2 ms relay dispatch; input
rotates across buffers to defeat the relay result cache), at the DeepLabV2
layer shapes. fwd and fwd+bwd timed separately.

Usage: python experiments/bench_fused_block.py [--layer 3] [--dtype bfloat16]
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

from maxsquareloss_tpu.models.deeplabv2 import _bottleneck
from experiments.retired_pallas.fused_block import fused_bottleneck

LAYERS = {
    # layer: (H, W, Cin, Cmid, d)
    1: (129, 257, 256, 64, 1),
    2: (65, 129, 512, 128, 1),
    3: (65, 129, 1024, 256, 2),
    4: (65, 129, 2048, 512, 4),
}


def timeit(fn, bufs, iters=10):
    for i in range(2):
        jax.block_until_ready(fn(bufs[i % len(bufs)]))
    t0 = time.perf_counter()
    outs = [fn(bufs[i % len(bufs)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--bwd_chain", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip_bwd", action="store_true")
    ap.add_argument("--skip_unfused", action="store_true")
    args = ap.parse_args()
    h, w, cin, cmid, d = LAYERS[args.layer]
    dtype = jnp.dtype(args.dtype)
    n = args.batch

    rng = np.random.default_rng(0)
    p = {
        "conv1": {"w": jnp.asarray(rng.normal(size=(1, 1, cin, cmid)).astype(np.float32) * 0.05)},
        "conv2": {"w": jnp.asarray(rng.normal(size=(3, 3, cmid, cmid)).astype(np.float32) * 0.05)},
        "conv3": {"w": jnp.asarray(rng.normal(size=(1, 1, cmid, cin)).astype(np.float32) * 0.05)},
    }
    f = {
        name: {"scale": jnp.asarray(rng.uniform(0.9, 1.1, size=(c,)).astype(np.float32)),
               "bias": jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.05)}
        for name, c in (("bn1", cmid), ("bn2", cmid), ("bn3", cin))
    }

    def block_unfused(x):
        return _bottleneck(p, f, x, stride=1, dilation=d)

    def block_fused(x):
        return fused_bottleneck(
            x, p["conv1"]["w"], p["conv2"]["w"], p["conv3"]["w"],
            f["bn1"]["scale"], f["bn1"]["bias"],
            f["bn2"]["scale"], f["bn2"]["bias"],
            f["bn3"]["scale"], f["bn3"]["bias"], d)

    bufs = [jnp.asarray(rng.normal(size=(n, h, w, cin)).astype(np.float32)).astype(dtype)
            for _ in range(4)]

    flops1 = 2 * n * h * w * (cin * cmid * 2 + 9 * cmid * cmid)
    variants = (("unfused", block_unfused), ("fused", block_fused))
    if args.skip_unfused:
        variants = variants[1:]
    for name, block in variants:
        K = args.chain

        @jax.jit
        def fwd(x, block=block, K=K):
            y = x
            for _ in range(K):
                y = block(y)
            return jnp.sum(y.astype(jnp.float32))

        Kb = args.bwd_chain

        @jax.jit
        def fwdbwd(x, block=block, Kb=Kb):
            def loss(x_):
                y = x_
                for _ in range(Kb):
                    y = block(y)
                return jnp.sum(y.astype(jnp.float32)) * 1e-6
            return jax.grad(loss)(x)

        t_f = timeit(fwd, bufs, args.iters)
        line = (f"layer{args.layer} {name:8s} fwd {t_f/K*1e3:7.3f} ms/block "
                f"({flops1*K/t_f/1e12:6.1f} TF/s)")
        if not args.skip_bwd:
            t_fb = timeit(fwdbwd, bufs, args.iters)
            line += (f"   fwd+bwd {t_fb/Kb*1e3:7.3f} ms/block "
                     f"({3*flops1*Kb/t_fb/1e12:6.1f} TF/s)")
        print(line, flush=True)

    # numerical check fused vs unfused on-device
    y0 = jax.jit(block_unfused)(bufs[0])
    y1 = jax.jit(block_fused)(bufs[0])
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y0.astype(jnp.float32))))
    print(f"max |fused - unfused| = {err:.3e} (max |y| = {scale:.3e})")


if __name__ == "__main__":
    main()
