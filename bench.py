"""Benchmark: UDA train step throughput on real TPU hardware.

Measures the flagship configuration — DeepLabV2-ResNet101 multi-level UDA
step (source CE + IW max-square target + self-produced guidance) at
1024x512 — and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against the A100 torch comparator documented in
BASELINE.md (the reference publishes no throughput numbers; see BASELINE.md
"Rebuild north star" for the comparator's provenance).

Flags:
  --dtype bfloat16|float32   compute dtype (default bfloat16: MXU-native on
                             v5e; fp32 params/updates either way)
  --batch N                  global batch per step pair (default 8)
  --steps N                  timed steps (default 10)
  --mode uda|source          which train step to bench
  --hw H,W                   input resolution (default 512,1024)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# A100 torch comparator (images/sec, DeepLabV2-R101 train @ 1024x512).
# The reference publishes no throughput; this is our measured-elsewhere /
# literature-estimated comparator recorded in BASELINE.md. Update there +
# here when a measured number lands.
A100_COMPARATOR_IMGS_PER_SEC = 15.0


def main():
    p = argparse.ArgumentParser("bench")
    p.add_argument("--dtype", default="bfloat16", choices=("bfloat16", "float32"))
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--mode", default="uda", choices=("uda", "source", "infer"))
    p.add_argument("--hw", default="512,1024")
    # no-remat is fastest at the default global batch 8 on v5e (16G HBM);
    # batch 16 does not fit even with stage remat.
    p.add_argument("--remat", default="", choices=("", "stages"))
    p.add_argument("--s2b", action="store_true",
                   help="space-to-batch dilated convs")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas kernels for the target loss")
    p.add_argument("--concat", action="store_true",
                   help="UDA: concatenated source+target forward")
    p.add_argument("--xla_options", default="auto",
                   help="XLA compiler options ('auto' | '' | 'k=v,k=v')")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from maxsquareloss_tpu.config import TrainConfig
    from maxsquareloss_tpu.models.deeplabv2 import init_deeplabv2
    from maxsquareloss_tpu.train.steps import (
        make_supervised_train_step,
        make_train_state,
        make_uda_train_step,
        model_config,
    )

    h, w = (int(v) for v in args.hw.split(","))
    n_chips = jax.device_count()
    cfg = TrainConfig(
        multi=True,
        num_classes=19,
        target_mode="IW_maxsquare",
        compute_dtype=args.dtype,
        remat=args.remat,
        space_to_batch=args.s2b,
        use_pallas=args.pallas,
        concat_batches=args.concat,
        xla_options=args.xla_options,
        batch_size=args.batch,
        data_parallel=n_chips > 1,
    )
    params, frozen = init_deeplabv2(jax.random.key(0), model_config(cfg))
    if n_chips > 1:
        from maxsquareloss_tpu.parallel.mesh import (
            batch_sharding,
            data_parallel_mesh,
            replicate_tree,
        )

        mesh = data_parallel_mesh()
        params = replicate_tree(mesh, params)
        frozen = replicate_tree(mesh, frozen)
        b_sh = batch_sharding(mesh)
    else:
        b_sh = None

    state = make_train_state(params)
    rng = np.random.default_rng(0)
    xs = rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32)
    ys = rng.integers(-1, 19, size=(args.batch, h, w)).astype(np.int32)
    xt = rng.normal(0, 1, size=(args.batch, h, w, 3)).astype(np.float32)
    put = (lambda a: jax.device_put(a, b_sh)) if b_sh is not None else jax.device_put
    xs, ys, xt = put(xs), put(ys), put(xt)

    if args.mode == "uda":
        step = make_uda_train_step(cfg, frozen)
        run = lambda s: step(s, xs, ys, xt)
        imgs_per_step = 2 * args.batch  # source + target images per step
    elif args.mode == "infer":
        # single-scale val inference: forward + upsample + argmax + CM
        from maxsquareloss_tpu.train.steps import make_eval_step

        estep = make_eval_step(cfg, frozen)
        p_infer = state.params
        counter = [0]

        def run(s):
            # perturb the input per call: identical (executable, args) pairs
            # can be result-cached by the remote executor, faking the timing
            counter[0] += 1
            cm, arg = estep(p_infer, jnp.add(xs, counter[0] * 1e-6), ys)
            return s, {"loss": cm[0, 0]}

        imgs_per_step = args.batch
    else:
        step = make_supervised_train_step(cfg, frozen)
        run = lambda s: step(s, xs, ys)
        imgs_per_step = args.batch

    for _ in range(args.warmup):
        state, metrics = run(state)
    jax.block_until_ready((state.params, metrics))

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = run(state)
    jax.block_until_ready((state.params, metrics))
    dt = time.perf_counter() - t0

    imgs_per_sec = imgs_per_step * args.steps / dt
    per_chip = imgs_per_sec / max(n_chips, 1)
    loss = float(np.asarray(metrics["loss"]))
    result = {
        "metric": (
            f"{args.mode}{'_train' if args.mode != 'infer' else ''}"
            f"_images_per_sec_per_chip_{w}x{h}_{args.dtype}"
        ),
        "value": round(per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / A100_COMPARATOR_IMGS_PER_SEC, 3),
        "extra": {
            "chips": n_chips,
            "global_batch": args.batch,
            "step_ms": round(1000 * dt / args.steps, 1),
            "final_loss": round(loss, 4),
            "platform": jax.devices()[0].platform,
            "device_kind": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
