"""bf16 trust at flagship scale (VERDICT r2 #5 / weak #2).

The bf16-trust test (tests/test_steps.py) bounds bf16-vs-fp32 deviation on
a toy model at 2x32x64 on CPU. This experiment measures the same bound for
the FULL DeepLabV2-R101 multi-level UDA step at the flagship 1024x512
resolution on the real TPU: run K identical steps from the same init in
fp32 (batch 8 + stage remat) and bf16, compare per-step losses and final
parameter drift.

Methodology (axon relay): state chains through the steps and each recorded
loss is host-read-back AFTER the full chain completes (losses are collected
on device and fetched once at the end) — no mid-chain fences needed for a
correctness (not timing) measurement.

Run ALONE (single TPU grant):  python experiments/bf16_trust_at_scale.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(steps: int, batch: int, hw: tuple[int, int]) -> dict:
    import jax

    from maxsquareloss_tpu.config import TrainConfig
    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train.steps import (
        make_train_state,
        make_uda_train_step,
        model_config,
    )

    h, w = hw
    rng = np.random.default_rng(0)
    # fixed batch set reused across dtypes; rotate over a few batches so the
    # trajectory sees varied data like real training
    n_batches = 4
    data = [
        (
            rng.normal(0, 1, size=(batch, h, w, 3)).astype(np.float32),
            rng.integers(-1, 19, size=(batch, h, w)).astype(np.int32),
            rng.normal(0, 1, size=(batch, h, w, 3)).astype(np.float32),
        )
        for _ in range(n_batches)
    ]

    def trajectory(dtype: str, remat: str):
        cfg = TrainConfig(
            multi=True,
            num_classes=19,
            target_mode="IW_maxsquare",
            compute_dtype=dtype,
            remat=remat,
            batch_size=batch,
            data_parallel=False,
        )
        params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
        state = make_train_state(params)
        step = make_uda_train_step(cfg, frozen)
        losses = []
        for i in range(steps):
            xs, ys, xt = data[i % n_batches]
            state, metrics = step(state, xs, ys, xt)
            losses.append(metrics["loss"])  # device scalar, fetched at end
        jax.block_until_ready(state.params)
        losses = [float(np.asarray(l)) for l in losses]
        flat = np.concatenate(
            [np.asarray(p, np.float64).ravel() for p in jax.tree.leaves(state.params)]
        )
        return losses, flat

    loss32, p32 = trajectory("float32", "stages")
    loss16, p16 = trajectory("bfloat16", "stages")
    rel_loss = [abs(a - b) / max(abs(a), 1e-9) for a, b in zip(loss16, loss32)]
    drift = float(np.linalg.norm(p16 - p32) / max(np.linalg.norm(p32), 1e-12))
    return {
        "steps": steps,
        "batch": batch,
        "hw": f"{w}x{h}",
        "per_step_rel_loss_dev": [round(v, 5) for v in rel_loss],
        "max_rel_loss_dev": round(max(rel_loss), 5),
        "mean_rel_loss_dev": round(float(np.mean(rel_loss)), 5),
        "rel_param_drift": round(drift, 6),
        "loss_fp32": [round(v, 5) for v in loss32],
        "loss_bf16": [round(v, 5) for v in loss16],
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", default="512,1024")
    a = p.parse_args()
    h, w = (int(v) for v in a.hw.split(","))
    print(json.dumps(run(a.steps, a.batch, (h, w)), indent=1))
