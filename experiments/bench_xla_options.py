"""XLA compiler-option sweep on the real UDA train step.

Round-2 believed TPU-side XLA flags were unavailable through this box's
relay (client flag parser rejects XLA_FLAGS; LIBTPU_INIT_ARGS silently
dropped). Round-2b discovery: per-compile ``compiler_options`` passed via
``jit(f).lower(...).compile(compiler_options=...)`` ARE forwarded to the
server-side compiler and parsed (a bogus flag fails the compile). This
sweep measures the flagship UDA step under candidate option sets with the
chain-marginal readback-fenced protocol (see bench_step_marginal.py).
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

COMBOS = {
    "baseline": {},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs+vmem32m": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "32768",
    },
    "async_fusion": {
        "xla_tpu_enable_async_collective_fusion": "true",
    },
    "vmem24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "vmem40m": {"xla_tpu_scoped_vmem_limit_kib": "40960"},
    "vmem48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem32m_again": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem32m+norwb": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_rwb_fusion": "false",
    },
    # round-2b broad sweep: candidates stacked on the winning vmem32m
    "v32+copyfuse": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_copy_fusion": "true",
    },
    "v32+allsched": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_all_experimental_scheduler_features": "true",
    },
    "v32+bundlecost": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true",
    },
    "v32+lhsrerun": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_latency_hiding_scheduler_rerun": "3",
    },
    "v32+exhfusion": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_experimental_exhaustive_output_fusion": "true",
    },
    "v32+licm2": {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_licm_size_inflation_ratio": "2",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", default="512,1024")
    ap.add_argument("--k1", type=int, default=2)
    ap.add_argument("--k2", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--combos", default=None,
                    help="comma list of combo names (default: all)")
    args = ap.parse_args()

    from maxsquareloss_tpu.config import TrainConfig
    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train.steps import (
        make_train_state,
        make_uda_train_step,
        model_config,
    )

    h, w = (int(v) for v in args.hw.split(","))
    cfg = TrainConfig(
        multi=True, num_classes=19, target_mode="IW_maxsquare",
        compute_dtype=args.dtype, batch_size=args.batch, data_parallel=False,
        # IMPORTANT: disable the config-level option injection — with the
        # default 'auto', jit-level compiler_options are merged into EVERY
        # .compile() call and would contaminate the baseline combo
        xla_options="",
    )
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32))
    ys = jax.device_put(rng.integers(-1, 19, size=(args.batch, h, w)).astype(np.int32))
    xt = jax.device_put(rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32))

    step = make_uda_train_step(cfg, frozen)
    lowered = step.lower(
        make_train_state(jax.tree.map(jnp.copy, params)), xs, ys, xt
    )

    names = list(COMBOS) if args.combos is None else args.combos.split(",")
    for name in names:
        opts = COMBOS[name]
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 - report and continue sweep
            print(f"{name:14s} COMPILE FAILED: {str(e)[:160]}", flush=True)
            continue

        def chain(k):
            s = make_train_state(jax.tree.map(jnp.copy, params))
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            m = None
            for _ in range(k):
                s, m = compiled(s, xs, ys, xt)
            float(np.asarray(m["loss"]))
            return time.perf_counter() - t0

        chain(1)  # warm
        t1 = min(chain(args.k1) for _ in range(args.reps))
        t2 = min(chain(args.k2) for _ in range(args.reps))
        per = (t2 - t1) / (args.k2 - args.k1)
        print(f"{name:14s} {per*1e3:7.1f} ms/step  "
              f"{2*args.batch/per:6.1f} img/s "
              f"[t{args.k1}={t1*1e3:.0f} t{args.k2}={t2*1e3:.0f}]", flush=True)


if __name__ == "__main__":
    main()
