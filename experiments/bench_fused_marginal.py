"""Fused vs unfused bottleneck: chain-MARGINAL timing with readback fences.

Through this box's axon relay, ``jax.block_until_ready`` is NOT a reliable
execution fence (probes show impossible TF/s), and every fenced call pays a
large fixed overhead. The only trustworthy protocol:

    time(chain of K2 blocks) - time(chain of K1 blocks)
    ---------------------------------------------------  = per-block cost
                      K2 - K1

with each call fenced by a host readback (float of an in-jit scalar), which
cancels the fixed per-call cost and any queueing effects.
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
    1: (129, 257, 256, 64, 1),
    2: (65, 129, 512, 128, 1),
    3: (65, 129, 1024, 256, 2),
    4: (65, 129, 2048, 512, 4),
}


def fenced_time(fn, args_list, iters):
    # warmup (compile + one spare)
    float(fn(*args_list[-1]))
    float(fn(*args_list[-2]))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(*args_list[i % (len(args_list) - 2)]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=10)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--variant", default="both",
                    choices=("both", "fused", "unfused"))
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

    xs = [
        jnp.asarray(rng.normal(size=(n, h, w, cin)).astype(np.float32) * 0.3)
        .astype(dtype)
        for _ in range(args.iters + 2)
    ]
    flops1 = 2 * n * h * w * (cin * cmid * 2 + 9 * cmid * cmid)

    variants = {"unfused": block_unfused, "fused": block_fused}
    if args.variant != "both":
        variants = {args.variant: variants[args.variant]}
    for name, block in variants.items():
        def chain_fn(K, block=block):
            @jax.jit
            def fwd(x):
                y = x
                for _ in range(K):
                    y = block(y)
                return jnp.sum(y.astype(jnp.float32))

            if not args.bwd:
                return fwd

            @jax.jit
            def fwdbwd(x):
                def loss(x_):
                    y = x_
                    for _ in range(K):
                        y = block(y)
                    return jnp.sum(y.astype(jnp.float32)) * 1e-6
                g = jax.grad(loss)(x)
                return jnp.sum(g.astype(jnp.float32))

            return fwdbwd
        t1 = fenced_time(chain_fn(args.k1), [(x,) for x in xs], args.iters)
        t2 = fenced_time(chain_fn(args.k2), [(x,) for x in xs], args.iters)
        per = (t2 - t1) / (args.k2 - args.k1)
        mult = 3 if args.bwd else 1
        tag = "fwd+bwd" if args.bwd else "fwd"
        print(f"layer{args.layer} {name:8s} {tag} marginal "
              f"{per*1e3:7.3f} ms/block ({mult*flops1/per/1e12:6.1f} TF/s)  "
              f"[t(K={args.k1})={t1*1e3:.1f}ms t(K={args.k2})={t2*1e3:.1f}ms]",
              flush=True)


if __name__ == "__main__":
    main()
