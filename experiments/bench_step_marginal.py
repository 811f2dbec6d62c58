"""True UDA-step cost via chain-marginal timing with a readback fence.

Cross-checks bench.py's block_until_ready-based timing: run K chained
steps (state feeds forward, so every step must really execute before the
final readback value exists), fence with ONE host readback of the last
step's loss + a parameter probe, and difference two chain lengths to
cancel the relay's fixed per-readback cost.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512,1024")
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="uda", choices=("uda", "infer"))
    ap.add_argument("--fused_blocks", action="store_true")
    args = ap.parse_args()

    from maxsquareloss_tpu.config import TrainConfig
    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train.steps import (
        make_eval_step,
        make_train_state,
        make_uda_train_step,
        model_config,
    )

    h, w = (int(v) for v in args.hw.split(","))
    cfg = TrainConfig(
        multi=True, num_classes=19, target_mode="IW_maxsquare",
        compute_dtype=args.dtype, batch_size=args.batch,
        data_parallel=False, fused_blocks=args.fused_blocks,
    )
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32))
    ys = jax.device_put(rng.integers(-1, 19, size=(args.batch, h, w)).astype(np.int32))
    xt = jax.device_put(rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32))

    if args.mode == "uda":
        step = make_uda_train_step(cfg, frozen)

        def chain(k, state0):
            s = state0
            m = None
            for _ in range(k):
                s, m = step(s, xs, ys, xt)
            # fence: value depends on the whole chain
            return float(np.asarray(m["loss"])) + float(
                np.asarray(s.iteration)
            )

        def fresh():
            return make_train_state(
                jax.tree.map(jnp.copy, params)
            )

        def timed(k):
            ts = []
            for _ in range(args.reps):
                s0 = fresh()
                jax.block_until_ready(s0)
                t0 = time.perf_counter()
                chain(k, s0)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        # warmup/compile
        chain(args.k1, fresh())
        chain(args.k2, fresh())
        t1, t2 = timed(args.k1), timed(args.k2)
        per = (t2 - t1) / (args.k2 - args.k1)
        ips = 2 * args.batch / per
        print(f"uda step marginal: {per*1e3:.1f} ms  {ips:.1f} img/s/chip "
              f"[t(K={args.k1})={t1*1e3:.0f}ms t(K={args.k2})={t2*1e3:.0f}ms] "
              f"fused_blocks={args.fused_blocks}")
    else:
        estep = make_eval_step(cfg, frozen)

        def chain(k):
            tot = jnp.zeros((), jnp.float32)
            x = xs
            for i in range(k):
                x = jnp.add(x, 1e-6)  # distinct input per step
                cm, arg = estep(params, x, ys)
                tot = tot + cm[0, 0]
            return float(np.asarray(tot))

        chain(args.k1); chain(args.k2)

        def timed(k):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                chain(k)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, t2 = timed(args.k1), timed(args.k2)
        per = (t2 - t1) / (args.k2 - args.k1)
        print(f"infer step marginal: {per*1e3:.1f} ms  {args.batch/per:.1f} "
              f"img/s/chip [t(K={args.k1})={t1*1e3:.0f}ms "
              f"t(K={args.k2})={t2*1e3:.0f}ms] fused_blocks={args.fused_blocks}")


if __name__ == "__main__":
    main()
