"""Probe: int8 MXU throughput vs bf16 on this chip (chain-marginal timing).

v5e lists ~2x int8 peak over bf16 (394 TOPS vs 197 TFLOPs). If XLA:TPU
lowers int8 dots/convs onto the MXU at that rate, a quantized serving path
(weights+activations int8, per-channel scales) could raise the inference
headline well past the bf16 ceiling. This probe answers the feasibility
question BEFORE any quantization design: measure the marginal cost of
chained int8 vs bf16 dots and of a representative conv shape.

Methodology: chain-marginal with a host readback fence (BASELINE.md
"Measurement methodology") — `block_until_ready` is not a fence through
this box's relay. Each chain step feeds the previous output forward, so
the final readback forces the whole chain; differencing two chain lengths
cancels the fixed readback cost. The int8 chain carries one int32->int8
requant cast per step (shift+truncate) — negligible VPU work next to a
4096^3 dot, and representative of real quantized inference anyway.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def marginal(fn, k1: int, k2: int, reps: int) -> float:
    """min over reps of (t(k2)-t(k1))/(k2-k1); fn(k) must fence."""
    fn(k1), fn(k2)  # compile both chain lengths
    def timed(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(k)
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (timed(k2) - timed(k1)) / (k2 - k1)


def bench_dot(n: int, k1: int, k2: int, reps: int):
    rng = np.random.default_rng(0)
    w8 = jax.device_put(rng.integers(-127, 128, size=(n, n)).astype(np.int8))
    wb = jax.device_put((rng.normal(0, 1, size=(n, n)) / n).astype(jnp.bfloat16))
    a8 = jax.device_put(rng.integers(-127, 128, size=(n, n)).astype(np.int8))
    ab = jax.device_put(rng.normal(0, 1, size=(n, n)).astype(jnp.bfloat16))

    @partial(jax.jit, static_argnums=1)
    def chain_i8(a, k):
        def body(a, _):
            y = jax.lax.dot_general(
                a, w8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # requant: shift back into int8 range (wrap truncation is fine
            # for a throughput probe, and keeps the chain data-dependent)
            return jax.lax.convert_element_type(
                jnp.right_shift(y, 12).astype(jnp.int32) & 0x7F, jnp.int8
            ), None
        a, _ = jax.lax.scan(body, a, None, length=k)
        return jnp.sum(a.astype(jnp.int32))

    @partial(jax.jit, static_argnums=1)
    def chain_bf(a, k):
        def body(a, _):
            y = jax.lax.dot_general(
                a, wb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            return y, None
        a, _ = jax.lax.scan(body, a, None, length=k)
        return jnp.sum(a.astype(jnp.float32))

    flops = 2.0 * n**3
    per8 = marginal(lambda k: int(chain_i8(a8, k)), k1, k2, reps)
    perb = marginal(lambda k: float(chain_bf(ab, k)), k1, k2, reps)
    print(f"dot {n}x{n}x{n}: int8 {per8*1e3:.3f} ms ({flops/per8/1e12:.1f} "
          f"TOP/s)  bf16 {perb*1e3:.3f} ms ({flops/perb/1e12:.1f} TFLOP/s)  "
          f"speedup {perb/per8:.2f}x", flush=True)


def bench_conv(shape, cout: int, ksize: int, dil: int, k1, k2, reps):
    n, h, w, cin = shape
    rng = np.random.default_rng(0)
    w8 = jax.device_put(
        rng.integers(-127, 128, size=(ksize, ksize, cin, cout)).astype(np.int8))
    wb = jax.device_put(
        (rng.normal(0, 1, size=(ksize, ksize, cin, cout)) / cin).astype(jnp.bfloat16))
    x8 = jax.device_put(rng.integers(-127, 128, size=shape).astype(np.int8))
    xb = jax.device_put(rng.normal(0, 1, size=shape).astype(jnp.bfloat16))
    pad = dil * (ksize // 2)
    dims = ("NHWC", "HWIO", "NHWC")
    assert cin == cout, "chain needs matching channels"

    @partial(jax.jit, static_argnums=1)
    def chain_i8(x, k):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, w8, (1, 1), ((pad, pad), (pad, pad)),
                rhs_dilation=(dil, dil), dimension_numbers=dims,
                preferred_element_type=jnp.int32,
            )
            return jax.lax.convert_element_type(
                jnp.right_shift(y, 12) & 0x7F, jnp.int8
            ), None
        x, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(x.astype(jnp.int32))

    @partial(jax.jit, static_argnums=1)
    def chain_bf(x, k):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, wb, (1, 1), ((pad, pad), (pad, pad)),
                rhs_dilation=(dil, dil), dimension_numbers=dims,
                preferred_element_type=jnp.bfloat16,
            )
            return y, None
        x, _ = jax.lax.scan(body, x, None, length=k)
        return jnp.sum(x.astype(jnp.float32))

    flops = 2.0 * n * h * w * cin * cout * ksize * ksize
    tag = f"conv {n}x{h}x{w}x{cin}->{cout} {ksize}x{ksize} d={dil}"
    try:
        per8 = marginal(lambda k: int(chain_i8(x8, k)), k1, k2, reps)
    except Exception as e:  # int8 convs may not lower on all backends
        print(f"{tag}: int8 FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        per8 = None
    perb = marginal(lambda k: float(chain_bf(xb, k)), k1, k2, reps)
    if per8 is not None:
        print(f"{tag}: int8 {per8*1e3:.3f} ms ({flops/per8/1e12:.1f} TOP/s)  "
              f"bf16 {perb*1e3:.3f} ms ({flops/perb/1e12:.1f} TFLOP/s)  "
              f"speedup {perb/per8:.2f}x", flush=True)
    else:
        print(f"{tag}: bf16 {perb*1e3:.3f} ms "
              f"({flops/perb/1e12:.1f} TFLOP/s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=48)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    bench_dot(4096, args.k1, args.k2, args.reps)
    # layer3-representative OS8 shapes (65x129 maps)
    bench_conv((8, 65, 129, 256), 256, 3, 2, args.k1, args.k2, args.reps)
    bench_conv((8, 65, 129, 512), 512, 3, 4, args.k1, args.k2, args.reps)
    bench_conv((8, 65, 129, 1024), 1024, 1, 1, args.k1, args.k2, args.reps)


if __name__ == "__main__":
    main()
